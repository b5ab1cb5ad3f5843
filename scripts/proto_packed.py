"""Is the relay transfer cost per-array (RTT) or per-byte?  And how
fast is fused_batch when inputs are already device-resident?"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from vapor_tpu.engine.fused import fused_batch

H = R = 3072
rows = 64
rng = np.random.default_rng(0)
haps = rng.integers(0, 4, (rows, H), dtype=np.uint8)
fw = rng.integers(0, 4, (rows, R), dtype=np.uint8)
rc = rng.integers(0, 4, (rows, R), dtype=np.uint8)
rlens = np.full(rows, R - 100, np.int32)
ms = np.zeros(rows, np.int32)
flat = np.concatenate([haps.ravel(), fw.ravel(), rc.ravel(),
                       (rlens % 256).astype(np.uint8),
                       (rlens // 256).astype(np.uint8),
                       (ms % 256).astype(np.uint8),
                       (ms // 256).astype(np.uint8)])
print("flat bytes:", flat.nbytes)


def t(fn, n=5):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def xfer5():
    arrs = [jnp.asarray(x) for x in (haps, fw, rc, rlens, ms)]
    for a in arrs:
        a.block_until_ready()


def xfer1():
    jnp.asarray(flat).block_until_ready()


def xfer1_nocache():
    # defeat jax's const/array caching with a fresh copy each time
    f = flat.copy()
    jnp.asarray(f).block_until_ready()


def xfer5_nocache():
    arrs = [jnp.asarray(x.copy()) for x in (haps, fw, rc, rlens, ms)]
    for a in arrs:
        a.block_until_ready()


print(f"xfer 5 arrays (cached)  : {t(xfer5)*1e3:8.1f} ms")
print(f"xfer 1 packed (cached)  : {t(xfer1)*1e3:8.1f} ms")
print(f"xfer 5 arrays (fresh)   : {t(xfer5_nocache)*1e3:8.1f} ms")
print(f"xfer 1 packed (fresh)   : {t(xfer1_nocache)*1e3:8.1f} ms")

# device-resident compute
dh, dfw, drc, drl, dm = (jnp.asarray(x) for x in
                         (haps, fw, rc, rlens, ms))
jax.block_until_ready((dh, dfw, drc, drl, dm))


def compute_resident():
    out = fused_batch(dh, dfw, drc, drl, dm, jnp.int32(0),
                      H=H, R=R, scorer="m1b")
    out[2].block_until_ready()


def fetch_resident():
    out = fused_batch(dh, dfw, drc, drl, dm, jnp.int32(0),
                      H=H, R=R, scorer="m1b")
    np.asarray(out[2])


tc = t(compute_resident)
tf = t(fetch_resident)
print(f"compute, device-resident: {tc*1e3:8.1f} ms "
      f"({tc/rows*1e3:.2f} ms/row)")
print(f"+ packed fetch          : {tf*1e3:8.1f} ms "
      f"({rows/tf:.0f} rows/s)")
