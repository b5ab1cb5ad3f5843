"""Honest stage timing of the fused engine (chained dispatch, tiny fetch)."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused


def bench_fn(fn, args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[-1])
    return (time.perf_counter() - t0) / n


def probe(H, R, B, width):
    W = fused.hist_width(H, R)
    rng = np.random.default_rng(0)
    hap = jnp.asarray(rng.integers(0, 4, H, dtype=np.uint8))
    reads = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rcs = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rlens = jnp.full((B,), R - 1, jnp.int32)
    ms = jnp.zeros((B,), jnp.int32)
    k_idx = jnp.int32(0)

    def chunked(per_read):
        def run(hap, reads, rcs, rlens, ms):
            def chunk(args):
                return jax.vmap(functools.partial(per_read, hap))(*args)
            n_chunks = B // width
            out = lax.map(chunk, (reads.reshape(n_chunks, width, -1),
                                  rcs.reshape(n_chunks, width, -1),
                                  rlens.reshape(n_chunks, width),
                                  ms.reshape(n_chunks, width)))
            return out
        return jax.jit(run)

    def stage_hits(hap, read, rc, rlen, m):
        Kf = fused._hits_normal(hap, read, k_idx, m)
        Kr = fused._flip_to_dot_space(
            fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(10))
        return Kf.sum(dtype=jnp.int32) + Kr.sum(dtype=jnp.int32)

    def stage_skew(hap, read, rc, rlen, m):
        Kf = fused._hits_normal(hap, read, k_idx, m)
        Kr = fused._flip_to_dot_space(
            fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(10))
        Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
        h_d = fused.skew_reduce(Ksum, W, -1, H)
        h_a = fused.skew_reduce(Ksum, W, +1, 0)
        return h_d.sum() + h_a.sum()

    def stage_unskew(hap, read, rc, rlen, m):
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

    args = (hap, reads, rcs, rlens, ms)
    t_h = bench_fn(chunked(stage_hits), args)
    t_s = bench_fn(chunked(stage_skew), args)
    t_u = bench_fn(chunked(stage_unskew), args)
    t_f = bench_fn(functools.partial(fused.fused_batch, H=H, R=R,
                                     scorer="m1b"),
                   (jnp.broadcast_to(hap, (reads.shape[0], H)), reads, rcs, rlens, ms, k_idx))
    print(f"H={H:5d} R={R:5d} B={B} w={width}: hits={t_h*1e3:6.1f} "
          f"+skew={t_s*1e3:6.1f} +clu/unskew={t_u*1e3:6.1f} "
          f"full_m1b={t_f*1e3:6.1f} ms  ({B/t_f:6.0f} reads/s/hap)")


print("devices:", jax.devices())
probe(1024, 1024, 16, 8)
probe(2048, 2048, 16, 4)
probe(4096, 4096, 16, 2)
probe(6144, 6144, 16, 1)
