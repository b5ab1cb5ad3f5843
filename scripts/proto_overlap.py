"""Can the relay overlap transfers/compute/fetches?  Single thread,
async dispatch of N calls then fetch them all, vs strict sync."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from vapor_tpu.engine.fused import fused_batch

H = R = 2048
rng = np.random.default_rng(0)
N = 6


def make(rows, seed):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.integers(0, 5, (rows, H), dtype=np.uint8)),
            jnp.asarray(r.integers(0, 5, (rows, R), dtype=np.uint8)),
            jnp.asarray(r.integers(0, 5, (rows, R), dtype=np.uint8)),
            jnp.asarray(np.full(rows, R - 99, np.int32)),
            jnp.asarray(np.zeros(rows, np.int32)))


argsets = [make(64, s) for s in range(N)]


def dispatch(a):
    return fused_batch(*a, jnp.int32(0), H=H, R=R, scorer="m1b")


# warm
np.asarray(dispatch(argsets[0])[2])

t0 = time.perf_counter()
for a in argsets:
    np.asarray(dispatch(a)[2])
t_sync = time.perf_counter() - t0

t0 = time.perf_counter()
outs = [dispatch(a) for a in argsets]
t_disp = time.perf_counter() - t0
for o in outs:
    np.asarray(o[2])
t_async = time.perf_counter() - t0

print(f"sync 6 calls : {t_sync*1e3:8.1f} ms")
print(f"async dispatch: {t_disp*1e3:8.1f} ms, total {t_async*1e3:8.1f} ms")

# host->device transfer timing while device is busy
big = np.random.default_rng(9).integers(0, 5, (64, H), dtype=np.uint8)
outs = [dispatch(a) for a in argsets]
t0 = time.perf_counter()
jnp.asarray(big)
t_x = time.perf_counter() - t0
for o in outs:
    np.asarray(o[2])
print(f"transfer while busy: {t_x*1e3:8.1f} ms")
