"""At-scale capstone: a 24-contig, >=1000-event worklist through the
production paths, with a mid-run kill + resume exercise.

Three legs (VERDICT r4 #5; reference analog: the per-contig WDL
scatter over ~24 shards, /root/reference/wdl/VaPoRVcf.wdl:44-85 +
TasksBenchmark.wdl:249-317):

1. **throughput** — the full worklist through one CLI process with the
   TPU batching backend and the production --pipeline depth (the
   per-contig scatter exists for multi-machine runs; on one
   relay-attached chip the shards would serialize on the device while
   paying a fresh device claim each, so the honest single-chip
   sustained-rate number is the pipelined run over all 24 contigs).
2. **scatter** — the same worklist through orchestrate.run_scatter
   (24 per-contig shard processes, jobs=1, deterministic sort-V
   merge), CPU backend; merged bytes must equal leg 1's output.
3. **resume** — leg 2 repeated but SIGKILLed mid-run, then restarted
   with --resume; completed shards and the killed shard's completed
   events must not be re-scored, and the merged output must be
   byte-identical.  Runs on CPU: resume bookkeeping is host logic
   (cli._resume_keys), and killing a TPU process mid-claim can wedge
   the relay grant for ~40 min (observed twice, CLAUDE.md).

Writes E2E_SCALE_r5.json at the repo root.

  SCALE_CONTIGS=24 SCALE_EVENTS=42 python scripts/capstone_scale.py
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONTIGS = int(os.environ.get("SCALE_CONTIGS", "24"))
CONTIG_LEN = int(os.environ.get("SCALE_LEN", "400000"))
EVENTS_PER = int(os.environ.get("SCALE_EVENTS", "42"))
PIPELINE = os.environ.get("SCALE_PIPELINE", "24")
BACKEND = os.environ.get("SCALE_BACKEND", "jax")


def _strip(path):
    """Output rows only (scatter shards re-sort; headers identical)."""
    return sorted(line for line in open(path)
                  if line.strip() and not line.startswith("#"))


def main():
    from vapor_tpu.sim.scale import build_scale_case
    tmp = tempfile.mkdtemp(prefix="vapor_capstone_")
    t0 = time.perf_counter()
    print(f"building {N_CONTIGS} contigs x {CONTIG_LEN} bp, "
          f"~{EVENTS_PER} events each ...", flush=True)
    case = build_scale_case(tmp, n_contigs=N_CONTIGS,
                            contig_len=CONTIG_LEN,
                            events_per=EVENTS_PER, reads_per=16)
    build_s = time.perf_counter() - t0
    n_events = case["n_events"]
    print(f"built: {n_events} events, {case['n_reads']} reads "
          f"({build_s:.0f}s)", flush=True)
    report = {"contigs": N_CONTIGS, "contig_len": CONTIG_LEN,
              "events": n_events, "reads": case["n_reads"],
              "build_s": round(build_s, 1)}

    # -- leg 1: single-process pipelined throughput (TPU backend) -----
    # measured like bench.bench_e2e: an untimed warm pass over a small
    # head of the worklist compiles every bucket (persisted by the XLA
    # disk cache), then the timed run covers the FULL worklist in the
    # same process — the sustained rate, not claim/compile overhead
    import contextlib
    from vapor_tpu.cli import main as cli_main
    head_bed = os.path.join(tmp, "head.bed")
    with open(head_bed, "w") as fo:
        fo.writelines(line for line, _ in
                      zip(open(case["bed"]), range(24)))
    out1 = os.path.join(tmp, "pipeline.vapor")

    def run_cli(bed, out, tag):
        args = ["bed", "--sv-input", bed, "--reference", case["fasta"],
                "--pacbio-input", case["bam"],
                "--output-path", os.path.join(tmp, f"figs_{tag}"),
                "--output-file", out, "--backend", BACKEND,
                "--no-figures", "--pipeline", PIPELINE]
        t0 = time.perf_counter()
        with open(os.devnull, "w") as devnull, \
                contextlib.redirect_stdout(devnull):
            rc = cli_main(args)
        assert rc == 0
        return time.perf_counter() - t0

    print("leg 1: warm pass (24-event head) ...", flush=True)
    run_cli(head_bed, os.path.join(tmp, "head.vapor"), "warm")
    try:
        from vapor_tpu.engine.scoring import get_backend
        be = get_backend(BACKEND)
        if hasattr(be, "warm_ladder"):
            be.warm_ladder(max_rows=480)
    except Exception:
        pass
    print("leg 1: timed pipelined run ...", flush=True)
    wall1 = run_cli(case["bed"], out1, "timed")
    n_reads_scored = 0
    for line in open(out1):
        if not line.startswith("#"):
            rec = line.rstrip("\n").split("\t")[-1]
            if rec not in ("NA", ""):
                n_reads_scored += len(rec.split(","))
    report["pipeline"] = {
        "backend": BACKEND, "wall_s": round(wall1, 1),
        "events_per_s": round(n_events / wall1, 2),
        "reads_scored": n_reads_scored,
        "reads_per_s": round(n_reads_scored / wall1, 2)}
    print(json.dumps(report["pipeline"]), flush=True)

    # -- leg 2: per-contig scatter (CPU), byte-stable merge -----------
    from vapor_tpu.orchestrate import run_scatter
    out2 = os.path.join(tmp, "scatter.vapor")
    print("leg 2: 24-shard scatter (CPU) ...", flush=True)
    t0 = time.perf_counter()
    run_scatter("bed", case["bed"], case["fasta"], case["bam"],
                os.path.join(tmp, "figs2"), out2, jobs=1,
                backend="numpy", extra_args=["--no-figures"])
    wall2 = time.perf_counter() - t0
    # per-shard walls from output mtime deltas (jobs=1: sequential)
    sharddir2 = os.path.join(tmp, "figs2", "shards")
    mtimes = sorted(os.path.getmtime(os.path.join(sharddir2, f))
                    for f in os.listdir(sharddir2)
                    if f.endswith(".out.vapor"))
    shard_walls = [round(b - a, 1)
                   for a, b in zip(mtimes, mtimes[1:])]
    report["scatter"] = {
        "backend": "numpy", "jobs": 1, "shards": N_CONTIGS,
        "wall_s": round(wall2, 1),
        "events_per_s": round(n_events / wall2, 2),
        "shard_walls_s_approx": shard_walls,
        "merged_equals_pipeline": _strip(out1) == _strip(out2)}
    print(json.dumps(report["scatter"]), flush=True)

    # -- leg 3: kill mid-run, restart with --resume -------------------
    print("leg 3: scatter, SIGKILL mid-run, resume ...", flush=True)
    figs3 = os.path.join(tmp, "figs3")
    out3 = os.path.join(tmp, "resume.vapor")
    code = (
        "import sys; sys.path.insert(0, %r);"
        "from vapor_tpu.orchestrate import run_scatter;"
        "run_scatter('bed', %r, %r, %r, %r, %r, jobs=1,"
        " backend='numpy', extra_args=['--no-figures', '--resume'])"
        % (REPO, case["bed"], case["fasta"], case["bam"], figs3, out3))
    t0 = time.perf_counter()
    p = subprocess.Popen([sys.executable, "-c", code])
    # kill once roughly a third of the shards have written output
    sharddir = os.path.join(figs3, "shards")
    while p.poll() is None:
        done = len([f for f in os.listdir(sharddir)
                    if f.endswith(".out.vapor")]) \
            if os.path.isdir(sharddir) else 0
        if done >= N_CONTIGS // 3:
            os.kill(p.pid, signal.SIGKILL)
            p.wait()
            break
        time.sleep(0.2)
    killed = p.returncode != 0
    rows_at_kill = 0
    if os.path.isdir(sharddir):
        for f in os.listdir(sharddir):
            if f.endswith(".out.vapor"):
                rows_at_kill += sum(
                    1 for line in open(os.path.join(sharddir, f))
                    if not line.startswith("#") and line.strip())
    t_kill = time.perf_counter() - t0
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", code], check=True)
    t_resume = time.perf_counter() - t0
    report["resume"] = {
        "killed_mid_run": killed,
        "rows_complete_at_kill": rows_at_kill,
        "wall_until_kill_s": round(t_kill, 1),
        "wall_resumed_s": round(t_resume, 1),
        "merged_equals_pipeline": _strip(out1) == _strip(out3),
        "resume_skipped_done_work":
            t_resume < 0.9 * report["scatter"]["wall_s"]}
    print(json.dumps(report["resume"]), flush=True)

    report["note"] = (
        "single relay-attached chip: the pipelined single-process run "
        "is the sustained TPU rate (scatter shards would serialize on "
        "the device and pay a fresh claim each); scatter + resume legs "
        "run the identical worklist on the CPU backend — resume "
        "bookkeeping is host logic, and killing a TPU process "
        "mid-claim wedges the relay grant (observed r1/r4).  "
        "merged_equals_pipeline compares sorted output rows; all "
        "three legs must agree byte-for-byte.")
    with open(os.path.join(REPO, "E2E_SCALE_r5.json"), "w") as fo:
        json.dump(report, fo, indent=1)
    print("wrote E2E_SCALE_r5.json", flush=True)


if __name__ == "__main__":
    main()
