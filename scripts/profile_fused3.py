"""Delta-profile fused m1b by building variants with stages disabled."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused
from vapor_tpu.engine.kernel import _split_sum

H = R = 4096
B = 16
W = fused.hist_width(H, R)
k_idx = jnp.int32(0)


def variant(stage):
    def one(hap, read, rc, rlen, m):
        k = 10 * (k_idx + 1)
        Kf = fused._hits_normal(hap, read, k_idx, m)
        Kr = fused._flip_to_dot_space(
            fused._hits_normal(hap, rc, k_idx, m), rlen, k)
        if stage == "hits":
            return Kf.sum(dtype=jnp.int32) + Kr.sum(dtype=jnp.int32)
        Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
        h_d = fused.skew_reduce(Ksum, W, -1, H)
        h_a = fused.skew_reduce(Ksum, W, +1, 0)
        if stage == "hist":
            return h_d.sum() + h_a.sum()
        kd = fused.kept_table_device(h_d, 10, 10, False)
        ka = fused.kept_table_device(h_a, 10, 10, False)
        if stage == "clu":
            return h_d.sum() + kd.sum().astype(jnp.int32) + ka.sum().astype(jnp.int32)
        keep = fused.unskew_broadcast(kd, H, -1, H, R) | \
            fused.unskew_broadcast(ka, H, +1, 0, R)
        if stage == "unskew":
            return keep.sum(dtype=jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, R), 1)
        ip = rows - m
        d = cols - ip
        mom = fused._moment_block(Kf, Kr, keep, ip, d, d, jnp.int32(0),
                                  want_w10=False, want_sel=False)
        return mom.sum()

    @jax.jit
    def run(hap, reads, rcs, rlens, ms):
        width = 2
        n_chunks = B // width
        def chunk(args):
            return jax.vmap(functools.partial(one, hap))(*args)
        return lax.map(chunk, (reads.reshape(n_chunks, width, -1),
                               rcs.reshape(n_chunks, width, -1),
                               rlens.reshape(n_chunks, width),
                               ms.reshape(n_chunks, width)))
    return run


rng = np.random.default_rng(0)
hap = jnp.asarray(rng.integers(0, 4, H, dtype=np.uint8))
reads = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
rcs = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
rlens = jnp.full((B,), R - 1, jnp.int32)
ms = jnp.zeros((B,), jnp.int32)

print("devices:", jax.devices())
prev = 0.0
for stage in ("hits", "hist", "clu", "unskew", "mom"):
    fn = variant(stage)
    out = fn(hap, reads, rcs, rlens, ms)
    np.asarray(out)
    N = 5
    t0 = time.perf_counter()
    outs = [fn(hap, reads, rcs, rlens, ms) for _ in range(N)]
    [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{stage:7s}: {dt:7.1f} ms/batch   (+{dt - prev:6.1f})")
    prev = dt
