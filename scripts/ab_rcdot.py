"""A/B: reverse-strand hits in dot space (VAPOR_TPU_RCDOT=1, new)
vs the flip-based mapping (=0, old).

The flag is read at trace time, so one process cannot hold both
variants; instead legs alternate N,O,N,O,... in immediately adjacent
subprocesses (relay drift is ~minutes-scale; adjacent runs are close
to latency-matched, and each leg's engine_pass_seconds are in the
artifact for drift inspection).  Each leg runs bench.bench_ours on
the standard 12-event worklist (warm compiles + warm ladder untimed,
best-of-3 timed passes).

Writes AB_RCDOT_r5.json at the repo root.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG = r"""
import sys, json, time
sys.path.insert(0, %(repo)r)
import bench
events = bench.make_worklist()
ours, be, times = bench.bench_ours(events, backend="jax")
print("LEGRESULT " + json.dumps(
    {"reads_per_s": round(ours, 2),
     "pass_seconds": [round(t, 4) for t in times]}))
"""


def run_leg(rcdot: str):
    env = dict(os.environ, VAPOR_TPU_RCDOT=rcdot)
    p = subprocess.run([sys.executable, "-c", LEG % {"repo": REPO}],
                       env=env, capture_output=True, text=True)
    for line in p.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(
        f"leg rcdot={rcdot} failed:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}")


def main():
    reps = int(os.environ.get("AB_REPS", "2"))
    legs = []
    for i in range(reps):
        for rcdot, name in (("1", "rc_dot"), ("0", "flip")):
            r = run_leg(rcdot)
            r["variant"] = name
            legs.append(r)
            print(json.dumps(r), flush=True)
    by = {}
    for r in legs:
        by.setdefault(r["variant"], []).append(r["reads_per_s"])
    summary = {v: {"runs": xs, "best": max(xs)} for v, xs in by.items()}
    out = {"order": [r["variant"] for r in legs], "legs": legs,
           "summary": summary}
    with open(os.path.join(REPO, "AB_RCDOT_r5.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
