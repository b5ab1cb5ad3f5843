"""A/B: skew/unskew pyramid merge radix (VAPOR_TPU_RADIX in 2/4/8).

PROFILE_r5.json shows the fused pass op-granularity-bound, with the
post-hits pyramids 75% marginal at H=3072; a higher merge radix runs
log_g(H) sequential pad+add rounds instead of log_2(H).  The flag is
read at TRACE time, so one process cannot hold two variants; legs
cycle 2,4,8,2,4,8,... in immediately adjacent subprocesses (same
protocol as scripts/ab_rcdot.py) and each leg runs bench.bench_ours
on the standard 12-event worklist (warm compiles untimed, best-of-3
timed passes).

Writes AB_RADIX_r5.json at the repo root.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG = r"""
import sys, json
sys.path.insert(0, %(repo)r)
import bench
events = bench.make_worklist()
ours, be, times = bench.bench_ours(events, backend="jax")
print("LEGRESULT " + json.dumps(
    {"reads_per_s": round(ours, 2),
     "pass_seconds": [round(t, 4) for t in times]}))
"""


def run_leg(radix: str):
    env = dict(os.environ, VAPOR_TPU_RADIX=radix)
    p = subprocess.run([sys.executable, "-c", LEG % {"repo": REPO}],
                       env=env, capture_output=True, text=True)
    for line in p.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(
        f"leg radix={radix} failed:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}")


def main():
    reps = int(os.environ.get("AB_REPS", "2"))
    variants = os.environ.get("AB_RADICES", "2,4,8").split(",")
    legs = []
    for i in range(reps):
        for radix in variants:
            r = run_leg(radix)
            r["variant"] = f"radix{radix}"
            legs.append(r)
            print(json.dumps(r), flush=True)
    by = {}
    for r in legs:
        by.setdefault(r["variant"], []).append(r["reads_per_s"])
    summary = {v: {"runs": xs, "best": max(xs)} for v, xs in by.items()}
    out = {"order": [r["variant"] for r in legs], "legs": legs,
           "summary": summary}
    with open(os.path.join(REPO, "AB_RADIX_r5.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
