"""Stage-level TPU timing of the fused engine (run as one process).

Times, for representative buckets, jitted probes of each stage:
hits, skew_reduce, kept tables, unskew_broadcast, moments, full fused.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import functools

from vapor_tpu.engine import fused
from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def probe(H, R, B):
    W = fused.hist_width(H, R)
    rng = np.random.default_rng(0)
    hap = jnp.asarray(rng.integers(0, 4, H, dtype=np.uint8))
    reads = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rcs = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rlens = jnp.full((B,), R - 1, jnp.int32)
    ms = jnp.zeros((B,), jnp.int32)
    k_idx = jnp.int32(0)

    # full fused m1b
    t_full = timeit(functools.partial(fused.fused_batch, H=H, R=R, scorer="m1b"),
                    jnp.broadcast_to(hap, (reads.shape[0], H)), reads, rcs, rlens, ms, k_idx)

    width = min(fused._vmap_width(H, R), B)

    @jax.jit
    def hits_only(hap, reads, rcs, rlens, ms):
        def one(read, rc, rlen, m):
            Kf = fused._hits_normal(hap, read, k_idx, m)
            Kr = fused._flip_to_dot_space(
                fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(10))
            return Kf.sum(dtype=jnp.int32), Kr.sum(dtype=jnp.int32)
        def chunk(args):
            return jax.vmap(one)(*args)
        n_chunks = B // width
        return jax.lax.map(chunk, (reads.reshape(n_chunks, width, -1),
                                   rcs.reshape(n_chunks, width, -1),
                                   rlens.reshape(n_chunks, width),
                                   ms.reshape(n_chunks, width)))

    t_hits = timeit(hits_only, hap, reads, rcs, rlens, ms)

    @jax.jit
    def hits_skew(hap, reads, rcs, rlens, ms):
        def one(read, rc, rlen, m):
            Kf = fused._hits_normal(hap, read, k_idx, m)
            Kr = fused._flip_to_dot_space(
                fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(10))
            Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
            h_d = fused.skew_reduce(Ksum, W, -1, H)
            h_a = fused.skew_reduce(Ksum, W, +1, 0)
            return h_d.sum(), h_a.sum()
        def chunk(args):
            return jax.vmap(one)(*args)
        n_chunks = B // width
        return jax.lax.map(chunk, (reads.reshape(n_chunks, width, -1),
                                   rcs.reshape(n_chunks, width, -1),
                                   rlens.reshape(n_chunks, width),
                                   ms.reshape(n_chunks, width)))

    t_hs = timeit(hits_skew, hap, reads, rcs, rlens, ms)

    @jax.jit
    def hits_skew_unskew(hap, reads, rcs, rlens, ms):
        def one(read, rc, rlen, m):
            Kf = fused._hits_normal(hap, read, k_idx, m)
            Kr = fused._flip_to_dot_space(
                fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(10))
            Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
            h_d = fused.skew_reduce(Ksum, W, -1, H)
            h_a = fused.skew_reduce(Ksum, W, +1, 0)
            kd = fused.kept_table_device(h_d, 10, 10, False)
            ka = fused.kept_table_device(h_a, 10, 10, False)
            keep = fused.unskew_broadcast(kd, H, -1, H, R) | \
                fused.unskew_broadcast(ka, H, +1, 0, R)
            return (Kf & keep).sum(dtype=jnp.int32)
        def chunk(args):
            return jax.vmap(one)(*args)
        n_chunks = B // width
        return jax.lax.map(chunk, (reads.reshape(n_chunks, width, -1),
                                   rcs.reshape(n_chunks, width, -1),
                                   rlens.reshape(n_chunks, width),
                                   ms.reshape(n_chunks, width)))

    t_hsu = timeit(hits_skew_unskew, hap, reads, rcs, rlens, ms)

    print(f"H={H:5d} R={R:5d} B={B} W={W:5d} width={width}: "
          f"full={t_full*1e3:8.1f}ms hits={t_hits*1e3:8.1f}ms "
          f"+skew={t_hs*1e3:8.1f}ms +unskew={t_hsu*1e3:8.1f}ms "
          f"reads/s(full,1hap)={B/t_full:7.1f}")


print("devices:", jax.devices())
for H, R, B in [(1024, 1024, 16), (2048, 2048, 16), (4096, 4096, 16)]:
    probe(H, R, B)
