"""Cost of switching between compiled executables over the relay."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from vapor_tpu.engine.fused import fused_batch

H = R = 2048
rng = np.random.default_rng(0)


def make(rows):
    return (jnp.asarray(rng.integers(0, 5, (rows, H), dtype=np.uint8)),
            jnp.asarray(rng.integers(0, 5, (rows, R), dtype=np.uint8)),
            jnp.asarray(rng.integers(0, 5, (rows, R), dtype=np.uint8)),
            jnp.asarray(np.full(rows, R - 99, np.int32)),
            jnp.asarray(np.zeros(rows, np.int32)))


def call(args):
    out = fused_batch(*args, jnp.int32(0), H=H, R=R, scorer="m1b")
    np.asarray(out[2])


A = make(64)
B = make(40)
call(A); call(B)   # warm both executables

for pattern in ("AAAAAA", "ABABAB", "AAABBB"):
    t0 = time.perf_counter()
    for c in pattern:
        t1 = time.perf_counter()
        call(A if c == "A" else B)
        print(f"  {c}: {(time.perf_counter()-t1)*1e3:7.1f} ms")
    print(f"{pattern}: {(time.perf_counter()-t0)*1e3:8.1f} ms total",
          flush=True)
