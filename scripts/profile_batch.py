"""Where does the batched path spend time?  Times, on the real device:
  - host->device transfer of the combined input arrays
  - fused_batch calls at several row counts (per-row device time)
  - the packed-stats fetch
Run: python scripts/profile_batch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vapor_tpu.engine.fused import fused_batch
from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD

H = R = 3072
rng = np.random.default_rng(0)


def t(fn, n=5):
    fn()
    best = min(-(time.perf_counter() - time.perf_counter()) or 1e9
               for _ in range(1))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


for rows in (8, 16, 24, 32, 64, 96):
    haps = rng.integers(0, 4, (rows, H), dtype=np.uint8)
    fw = rng.integers(0, 4, (rows, R), dtype=np.uint8)
    rc = rng.integers(0, 4, (rows, R), dtype=np.uint8)
    rlens = np.full(rows, R - 100, np.int32)
    ms = np.zeros(rows, np.int32)

    def xfer():
        arrs = [jnp.asarray(x) for x in (haps, fw, rc, rlens, ms)]
        for a in arrs:
            a.block_until_ready()

    def full():
        out = fused_batch(jnp.asarray(haps), jnp.asarray(fw),
                          jnp.asarray(rc), jnp.asarray(rlens),
                          jnp.asarray(ms), jnp.int32(0),
                          H=H, R=R, scorer="m1b")
        np.asarray(out[2])

    def compute_only():
        out = fused_batch(jnp.asarray(haps), jnp.asarray(fw),
                          jnp.asarray(rc), jnp.asarray(rlens),
                          jnp.asarray(ms), jnp.int32(0),
                          H=H, R=R, scorer="m1b")
        out[2].block_until_ready()

    tx = t(xfer)
    tc = t(compute_only)
    tf = t(full)
    print(f"rows={rows:3d}: xfer={tx*1e3:7.1f}ms  compute(e2e)="
          f"{tc*1e3:7.1f}ms  +fetch={tf*1e3:7.1f}ms  "
          f"per-row={tf/rows*1e3:6.2f}ms  -> {rows/tf:6.0f} rows/s")
