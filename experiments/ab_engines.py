"""Latency-matched engine A/B: all-XLA vs all-pallas vs table-routed.

The round-3 sequential A/B reached the wrong conclusion because the
axon relay's per-fetch latency drifts ~1.6x across a session
(PERF_NOTES.md).  This harness interleaves full worklist passes
X,P,T,X,P,T,... in ONE session so every config samples the same relay
conditions, and writes per-pass wall times to an artifact
(AB_r4.json) so the drift is visible inside the data.

Configs (selected via VAPOR_TPU_PALLAS, read per call):
  xla    = "0"     every bucket on the XLA fused engine
  pallas = "1"     every supported bucket forced onto the pallas engine
  table  = "auto"  shipped per-bucket routing table

Run alone on the chip — never alongside another TPU process, and with
no timeout wrapper (CLAUDE.md relay rules).

Usage: python scripts/ab_engines.py [n_pairs] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CONFIGS = (("xla", "0"), ("pallas", "1"), ("table", "auto"))


def one_pass(be, events, window=10):
    t0 = time.perf_counter()
    pend = [be.score_batch_async("abs_dis_m1b", e[0], e[1], e[2],
                                 window) for e in events]
    for fin in pend:
        fin()
    return time.perf_counter() - t0


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else "AB_r4.json"
    import bench
    from vapor_tpu.engine.scoring import get_backend
    events = bench.make_worklist()
    n_reads = sum(len(e[2]) for e in events)
    be = get_backend("jax")
    print(f"worklist: {len(events)} events, {n_reads} reads", flush=True)

    # warm every config: compile per-event and coalesced shapes for
    # both engines before any timed pass
    for name, env in CONFIGS:
        os.environ["VAPOR_TPU_PALLAS"] = env
        t0 = time.perf_counter()
        for e in events:
            be.score_batch("abs_dis_m1b", e[0], e[1], e[2], 10)
        for _ in range(2):
            one_pass(be, events)
        be.warm_ladder(max_rows=n_reads)
        print(f"warm[{name}]: {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {name: [] for name, _ in CONFIGS}
    order = []
    for i in range(n_pairs):
        for name, env in CONFIGS:
            os.environ["VAPOR_TPU_PALLAS"] = env
            dt = one_pass(be, events)
            times[name].append(dt)
            order.append([name, round(dt, 4)])
            print(f"pass {i}: {name} {dt * 1e3:.1f} ms "
                  f"({n_reads / dt:.0f} reads/s)", flush=True)
    os.environ["VAPOR_TPU_PALLAS"] = "auto"

    def med(v):
        s = sorted(v)
        return s[len(s) // 2]

    summary = {name: {"median_s": round(med(v), 4),
                      "best_s": round(min(v), 4),
                      "reads_per_s_median": round(n_reads / med(v), 1),
                      "passes_s": [round(t, 4) for t in v]}
               for name, v in times.items()}
    winner = min(summary, key=lambda n: summary[n]["median_s"])
    artifact = {
        "what": "interleaved latency-matched engine A/B on the "
                "standard bench worklist (12 events x 20 reads, "
                "abs_dis_m1b, k=10), one session, passes cycled "
                "X,P,T per round so every config samples the same "
                "relay latency (VERDICT r3 #2)",
        "n_pairs": n_pairs,
        "n_reads_per_pass": n_reads,
        "interleaved_order": order,
        "summary": summary,
        "winner_by_median": winner,
        "device": None,
    }
    try:
        import jax
        artifact["device"] = str(jax.devices()[0].device_kind)
    except Exception:
        pass
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}; winner by median: {winner}", flush=True)


if __name__ == "__main__":
    main()
