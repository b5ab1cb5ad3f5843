"""Why is fused_batch ~4x slower than an identical inline probe?"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused

H = R = 3072
B = 64
W = fused.hist_width(H, R)
width = fused._vmap_width(H, R)
k_idx = jnp.int32(0)
rng = np.random.default_rng(1)
hap1 = rng.integers(0, 5, H, dtype=np.uint8)
haps = np.broadcast_to(hap1, (B, H)).copy()
reads = rng.integers(0, 5, (B, R), dtype=np.uint8)
rcs = rng.integers(0, 5, (B, R), dtype=np.uint8)
rlens = rng.integers(R // 2, R - 1, B).astype(np.int32)
ms = rng.integers(0, 40, B).astype(np.int32)
d = [jnp.asarray(x) for x in (haps, reads, rcs, rlens, ms)]
dh1 = jnp.asarray(hap1)


def t(fn, n=3):
    np.asarray(jax.tree_util.tree_leaves(fn())[-1])
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[-1])
        best = min(best, time.perf_counter() - t0)
    return best


# 1. fused_batch as shipped (3 outputs incl. (B, W) histograms)
f1 = lambda: fused.fused_batch(*d, k_idx, H=H, R=R, scorer="m1b")

# 2. same but only the packed stats as output
@jax.jit
def only_packed(haps, reads, rcs, rlens, ms):
    def one(hap, read, rc, rlen, m):
        return fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R,
                                "m1b")[2]
    def chunk(a):
        return jax.vmap(one)(*a)
    n = B // width
    return lax.map(chunk, (haps.reshape(n, width, -1),
                           reads.reshape(n, width, -1),
                           rcs.reshape(n, width, -1),
                           rlens.reshape(n, width),
                           ms.reshape(n, width)))

f2 = lambda: only_packed(*d)

# 3. shared hap closed over (not vmapped), only packed
@jax.jit
def shared_hap(hap, reads, rcs, rlens, ms):
    def one(read, rc, rlen, m):
        return fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R,
                                "m1b")[2]
    def chunk(a):
        return jax.vmap(one)(*a)
    n = B // width
    return lax.map(chunk, (reads.reshape(n, width, -1),
                           rcs.reshape(n, width, -1),
                           rlens.reshape(n, width),
                           ms.reshape(n, width)))

f3 = lambda: shared_hap(dh1, *d[1:])

# 4. shared hap + full 3 outputs
@jax.jit
def shared_full(hap, reads, rcs, rlens, ms):
    def one(read, rc, rlen, m):
        return fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R,
                                "m1b")
    def chunk(a):
        return jax.vmap(one)(*a)
    n = B // width
    return lax.map(chunk, (reads.reshape(n, width, -1),
                           rcs.reshape(n, width, -1),
                           rlens.reshape(n, width),
                           ms.reshape(n, width)))

f4 = lambda: shared_full(dh1, *d[1:])

for name, f in (("fused_batch (3 outs, vmapped hap)", f1),
                ("packed only, vmapped hap", f2),
                ("packed only, shared hap", f3),
                ("3 outs, shared hap", f4)):
    dt = t(f)
    print(f"{name:36s}: {dt*1e3:7.1f} ms  {dt/B*1e3:5.2f} ms/row",
          flush=True)
