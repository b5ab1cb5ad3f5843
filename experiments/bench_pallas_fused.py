"""On-chip benchmark: full-fusion Pallas engine vs the XLA fused path.

Times pallas_m1b_batch against _fused_batch_jit (scorer=m1b) at the
production buckets, per CLAUDE.md timing rules: every timed iteration
varies its inputs (no loop-invariant hoisting), results are fetched
with np.asarray (the only honest sync over the axon relay), and both
histogram+moment outputs are consumed.

Run alone — never alongside another TPU process.  No timeout wrappers.

Usage: python scripts/bench_pallas_fused.py [B] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def make_batch(H, R, B, seed=0):
    from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    hap_len = H - 17
    rlen = min(R - 23, hap_len)
    haps = np.full((B, H), HAP_PAD, np.uint8)
    reads = np.full((B, R), READ_PAD, np.uint8)
    rcs = np.full((B, R), READ_PAD, np.uint8)
    for b in range(B):
        hap = bases[rng.integers(0, 4, hap_len)]
        haps[b, :hap_len] = hap
        src = hap[:rlen].copy()
        flips = rng.integers(0, rlen, rlen // 10)
        src[flips] = bases[rng.integers(0, 4, flips.size)]
        reads[b, :rlen] = src
        rcs[b, :rlen] = np.array([comp[int(x)] for x in src[::-1]],
                                 np.uint8)
    rlens = np.full(B, rlen, np.int32)
    ms = np.zeros(B, np.int32)
    return haps, reads, rcs, rlens, ms


def time_fn(fn, batches, reps):
    # warm
    np.asarray(fn(*batches[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*batches[i % len(batches)])
        np.asarray(out)          # honest fetch
    return (time.perf_counter() - t0) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from vapor_tpu.engine.fused import _fused_batch_jit
    from pallas_fused import PALLAS_BATCHES
    import jax
    print("devices:", jax.devices(), flush=True)

    for H, R, k, scorer in [(1536, 2048, 10, "m1b"),
                            (3072, 3072, 10, "m1b"),
                            (2048, 2048, 40, "m1b"),
                            (3072, 3072, 10, "w10"),
                            (3072, 3072, 10, "del"),
                            (3072, 3072, 10, "rdd")]:
        batches = [tuple(jnp.asarray(a) for a in make_batch(H, R, B, s))
                   for s in range(3)]

        def xla(haps, reads, rcs, rlens, ms):
            return _fused_batch_jit(haps, reads, rcs, rlens, ms,
                                    jnp.int32(k // 10 - 1),
                                    H=H, R=R, scorer=scorer)[2]

        def pallas(haps, reads, rcs, rlens, ms):
            return PALLAS_BATCHES[scorer](haps, reads, rcs, rlens, ms,
                                          H=H, R=R, k=k)

        try:
            t_p = time_fn(pallas, batches, reps)
            # parity spot check on-chip
            a = np.asarray(pallas(*batches[0]))
            b = np.asarray(xla(*batches[0]))
        except Exception as e:
            print(f"H={H} R={R} k={k} {scorer}: pallas FAILED: {e!r}",
                  flush=True)
            continue
        t_x = time_fn(xla, batches, reps)

        def dec(p):
            p = p.astype(np.int64)
            cols = [(p[:, 0] << 16) + p[:, 1] + (p[:, 2] << 16) +
                    p[:, 3], p[:, 4], p[:, 5]]
            m = p[:, 6:]
            cols += [(m[:, 0] << 16) + m[:, 1],
                     (m[:, 2] << 16) + m[:, 3],
                     (m[:, 4] << 16) + m[:, 5],
                     (m[:, 6] << 16) + m[:, 7],
                     (m[:, 8] << 16) + (m[:, 9] << 16) + m[:, 10],
                     (m[:, 11] << 16) + (m[:, 12] << 16) + m[:, 13]]
            if m.shape[1] >= 28:
                cols += [(m[:, 14] << 16) + m[:, 15],
                         (m[:, 16] << 16) + m[:, 17],
                         (m[:, 18] << 16) + m[:, 19]]
            return np.stack(cols)
        ok = np.array_equal(dec(a), dec(b))
        print(f"H={H} R={R} k={k} {scorer} B={B}: "
              f"pallas {t_p*1e3/B:.3f} ms/row"
              f"  xla {t_x*1e3/B:.3f} ms/row  speedup "
              f"{t_x/t_p:.2f}x  parity={'OK' if ok else 'MISMATCH'}",
              flush=True)


if __name__ == "__main__":
    main()
