"""On-chip stage profile of the fused XLA engine (VERDICT r4 #4).

Runs truncated versions of the production pipeline at bench-shaped
buckets and answers, with numbers rather than inference, what the
~0.6 ms/row device pass is bound by:

* stage jits — ``hits`` (packed-nibble compare, both strands),
  ``hits_hist`` (+ the two skew-reduce pyramids), ``full`` (the
  production ``_fused_batch_jit``: gates, cleaning, moments) — each
  built with the SAME lax.map/vmap(8) chunking as production;
* per-stage XLA ``cost_analysis()`` (flops, bytes accessed) from the
  compiled executable, so achieved HBM bandwidth and FLOP rate are
  computed from the compiler's own accounting, not hand math;
* wall time per rep with an honest relay fetch (np.asarray of the
  reduced output — block_until_ready returns early through axon);
* a ``jax.profiler.trace`` capture of one full pass (trace dir kept
  under /tmp, size recorded; the committed artifact is this JSON).

Verdict rule per stage against TPU v5e peaks (HBM ~819 GB/s, bf16
MXU ~197 TFLOP/s): >=50% of HBM peak -> memory-bound (a Mosaic
rewrite can only win by moving fewer bytes than XLA's fusion already
does); >=30% of FLOP peak -> compute-bound; neither -> dispatch /
launch-bound (kernel language is irrelevant; the relay is the limit).

Writes PROFILE_r5.json at the repo root.  Run alone on the chip (one
TPU process at a time; no `timeout` — CLAUDE.md).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

HBM_PEAK = 819e9          # v5e HBM bytes/s
FLOP_PEAK = 197e12        # v5e bf16 FLOP/s (MXU); VPU int ops are lower

REPS = int(os.environ.get("PROFILE_REPS", "5"))
B = int(os.environ.get("PROFILE_ROWS", "48"))
BUCKETS = [int(x) for x in
           os.environ.get("PROFILE_BUCKETS", "1536,3072").split(",")]


def make_rows(H, R, B, seed=7):
    from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    hap_len, rlen = H - 30, R - 40
    haps = np.full((B, H), HAP_PAD, np.uint8)
    reads = np.full((B, R), READ_PAD, np.uint8)
    hap = bases[rng.integers(0, 4, hap_len)]
    comp = np.zeros(256, np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b
    rcs = np.full((B, R), READ_PAD, np.uint8)
    for i in range(B):
        seq = hap[:rlen].copy()
        flips = rng.integers(0, rlen, rlen // 12)
        seq[flips] = bases[rng.integers(0, 4, flips.size)]
        haps[i, :hap_len] = hap
        reads[i, :rlen] = seq
        rcs[i, :rlen] = comp[seq[::-1]]
    rlens = np.full(B, rlen, np.int32)
    ms = np.zeros(B, np.int32)
    return haps, reads, rcs, rlens, ms


def build_stages(H, R):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from vapor_tpu.engine.fused import (_HITS_IMPLS, HITS_IMPL,
                                        _flip_to_dot_space,
                                        _fused_batch_jit, hist_width,
                                        skew_reduce)
    hits = _HITS_IMPLS[HITS_IMPL]
    W = hist_width(H, R)
    k = 10

    def chunked(fn, haps, reads, rcs, rlens, ms):
        width = 8
        n_chunks = haps.shape[0] // width

        def chunk(args):
            return jax.vmap(fn)(*args)
        return lax.map(chunk, (haps.reshape(n_chunks, width, -1),
                               reads.reshape(n_chunks, width, -1),
                               rcs.reshape(n_chunks, width, -1),
                               rlens.reshape(n_chunks, width),
                               ms.reshape(n_chunks, width)))

    def hits_one(hap, read, rc, rlen, m):
        Kf = hits(hap, read, jnp.int32(0), m)
        Kr = _flip_to_dot_space(hits(hap, rc, jnp.int32(0), m), rlen, k)
        return Kf.sum(dtype=jnp.int32) + Kr.sum(dtype=jnp.int32)

    def hist_one(hap, read, rc, rlen, m):
        Kf = hits(hap, read, jnp.int32(0), m)
        Kr = _flip_to_dot_space(hits(hap, rc, jnp.int32(0), m), rlen, k)
        Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
        h_d = skew_reduce(Ksum, W, -1, H)
        h_a = skew_reduce(Ksum, W, +1, 0)
        return h_d.sum() + h_a.sum()

    @jax.jit
    def stage_hits(haps, reads, rcs, rlens, ms):
        return chunked(hits_one, haps, reads, rcs, rlens, ms).sum()

    @jax.jit
    def stage_hist(haps, reads, rcs, rlens, ms):
        return chunked(hist_one, haps, reads, rcs, rlens, ms).sum()

    def stage_full(haps, reads, rcs, rlens, ms):
        return _fused_batch_jit(haps, reads, rcs, rlens, ms,
                                jnp.int32(0), H=H, R=R, scorer="m1b",
                                want_hists=False)[2].sum()
    return {"hits": stage_hits, "hits_hist": stage_hist,
            "full": jax.jit(stage_full)}


def cost_of(fn, args):
    try:
        c = fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {"flops": float(c.get("flops", 0.0)),
                "bytes": float(c.get("bytes accessed", 0.0))}
    except Exception as e:
        return {"error": repr(e)}


def main():
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    report = {"device": str(dev), "rows_per_call": B, "reps": REPS,
              "hbm_peak_B_per_s": HBM_PEAK,
              "flop_peak_per_s": FLOP_PEAK, "buckets": {}}
    for H in BUCKETS:
        R = H
        rows = make_rows(H, R, B)
        args = tuple(jnp.asarray(a) for a in rows)
        stages = build_stages(H, R)
        ent = {}
        for name, fn in stages.items():
            np.asarray(fn(*args))                     # compile + warm
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                np.asarray(fn(*args))                 # honest fetch
                times.append(time.perf_counter() - t0)
            t = min(times)
            cost = cost_of(fn, args)
            row = {"s_per_call": round(t, 5),
                   "ms_per_row": round(1e3 * t / B, 4),
                   "times_s": [round(x, 5) for x in times]}
            if "bytes" in cost:
                bw = cost["bytes"] / t
                fl = cost["flops"] / t
                row.update({
                    "xla_bytes_accessed": cost["bytes"],
                    "xla_flops": cost["flops"],
                    "achieved_GB_per_s": round(bw / 1e9, 1),
                    "hbm_peak_frac": round(bw / HBM_PEAK, 3),
                    "flop_peak_frac": round(fl / FLOP_PEAK, 4)})
                row["verdict"] = (
                    "memory-bound" if bw / HBM_PEAK >= 0.5 else
                    "compute-bound" if fl / FLOP_PEAK >= 0.3 else
                    "dispatch/launch-bound")
            else:
                row["cost_analysis_error"] = cost.get("error")
            ent[name] = row
            print(f"H={H} {name}: {row.get('ms_per_row')} ms/row "
                  f"{row.get('verdict', '?')}", flush=True)
        # marginal cost of the post-hits pipeline
        if "full" in ent and "hits" in ent:
            ent["post_hits_marginal_frac"] = round(
                ent["full"]["s_per_call"] / ent["hits"]["s_per_call"]
                - 1.0, 3)
        report["buckets"][str(H)] = ent

    # one traced full pass (largest bucket) for the record
    trace_dir = "/tmp/vapor_profile_trace"
    try:
        H = BUCKETS[-1]
        rows = make_rows(H, H, B)
        args = tuple(jnp.asarray(a) for a in rows)
        fn = build_stages(H, H)["full"]
        np.asarray(fn(*args))
        with jax.profiler.trace(trace_dir):
            np.asarray(fn(*args))
        size = sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(trace_dir) for f in fs)
        report["trace"] = {"dir": trace_dir, "bytes": size}
    except Exception as e:
        report["trace"] = {"error": repr(e)}

    with open(os.path.join(REPO, "PROFILE_r5.json"), "w") as fo:
        json.dump(report, fo, indent=1)
    print(json.dumps({k: {n: v.get("verdict") or v
                          for n, v in ent.items()}
                      if isinstance(ent, dict) else ent
                      for k, ent in report["buckets"].items()}))


if __name__ == "__main__":
    main()
