"""Scale throughput run: an HG002-shaped simulated worklist through the
full CLI (validators + IO + genotyping + writers), single process with
the batching backend, or per-contig scatter processes.

  SCALE_CONTIGS=6 SCALE_LEN=200000 SCALE_EVENTS=40 SCALE_MODE=pipeline \
      python scripts/scale_run.py

SCALE_MODE=scatter uses the per-contig process scatter (jobs=1 on TPU:
shards must not contend for the relay-attached chip).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_CONTIGS = int(os.environ.get("SCALE_CONTIGS", "4"))
CONTIG_LEN = int(os.environ.get("SCALE_LEN", "150000"))
EVENTS_PER = int(os.environ.get("SCALE_EVENTS", "24"))
MODE = os.environ.get("SCALE_MODE", "pipeline")
BACKEND = os.environ.get("SCALE_BACKEND", "jax")
PIPELINE = int(os.environ.get("SCALE_PIPELINE", "8"))


def main():
    from vapor_tpu.sim.scale import build_scale_case
    tmp = tempfile.mkdtemp(prefix="vapor_scale_")
    print(f"building case: {N_CONTIGS} contigs x {CONTIG_LEN} bp, "
          f"~{EVENTS_PER} events/contig ...", flush=True)
    case = build_scale_case(tmp, n_contigs=N_CONTIGS,
                            contig_len=CONTIG_LEN,
                            events_per=EVENTS_PER)
    out = os.path.join(tmp, "out.vapor")
    t0 = time.perf_counter()
    if MODE == "scatter":
        from vapor_tpu.orchestrate import run_scatter
        run_scatter("bed", case["bed"], case["fasta"], case["bam"],
                    os.path.join(tmp, "figs"), out,
                    jobs=int(os.environ.get("SCALE_JOBS", "1")),
                    backend=BACKEND,
                    extra_args=["--no-figures",
                                "--pipeline", str(PIPELINE)])
    else:
        from vapor_tpu.cli import main as cli_main
        sys.argv = ["vapor", "bed", "--sv-input", case["bed"],
                    "--reference", case["fasta"],
                    "--pacbio-input", case["bam"],
                    "--output-path", os.path.join(tmp, "figs/"),
                    "--output-file", out, "--backend", BACKEND,
                    "--no-figures", "--pipeline", str(PIPELINE)]
        cli_main()
    wall = time.perf_counter() - t0

    # accuracy + throughput report
    n_rows = 0
    reads_evaluated = 0
    tp = fp = fn = tn = 0
    with open(out) as fin:
        for line in fin:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            n_rows += 1
            svid, qs, rec = cols[4], cols[5], cols[9]
            if rec not in ("NA", ""):
                reads_evaluated += len(rec.split(","))
            is_true = case["truth"].get(svid)
            called = qs not in ("NA", "") and float(qs) > 0.2
            if is_true and called:
                tp += 1
            elif is_true:
                fn += 1
            elif called:
                fp += 1
            else:
                tn += 1
    print(f"events={n_rows} wall={wall:.1f}s "
          f"events/s={n_rows / wall:.2f} "
          f"reads_evaluated={reads_evaluated} "
          f"reads/s={reads_evaluated / wall:.1f}")
    print(f"accuracy: TP={tp} FN={fn} FP={fp} TN={tn} "
          f"sens={tp / max(1, tp + fn):.3f} "
          f"spec={tn / max(1, tn + fp):.3f}")


if __name__ == "__main__":
    main()
