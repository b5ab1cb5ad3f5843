"""TPU probe: what do host->device uploads cost on the relay link?

Times (a) pipelined device_put of bench-sized input arrays,
(b) fused_batch with fresh host numpy inputs per call (the production
path), vs (c) fused_batch on pre-uploaded inputs.
Run alone, NO timeout wrapper.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vapor_tpu.engine import fused

H = R = int(os.environ.get("PROBE_H", "3072"))
B = int(os.environ.get("PROBE_B", "48"))
ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def make_inputs(seed):
    r = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    hap = lut[r.integers(0, 4, size=H).astype(np.uint8)]
    haps = np.broadcast_to(hap, (B, H)).copy()
    reads = lut[r.integers(0, 4, size=(B, R)).astype(np.uint8)]
    for b in range(B):
        o = int(r.integers(0, H - 1024))
        reads[b, 100:100 + 1024] = hap[o:o + 1024]
    comp = np.zeros(256, np.uint8)
    for a, c in zip(b"ACGT", b"TGCA"):
        comp[a] = c
    rcs = comp[reads][:, ::-1].copy()
    rlens = np.full(B, R, np.int32)
    ms = np.zeros(B, np.int32)
    return haps, reads, rcs, rlens, ms


def main():
    print("devices:", jax.devices(), flush=True)
    sets = [make_inputs(i) for i in range(ITERS)]
    nbytes = sum(a.nbytes for a in sets[0])

    # (a) pure upload, pipelined
    up = [jax.device_put(jnp.asarray(a)) for a in sets[0]]
    _ = [np.asarray(u[:1]) for u in up[:1]]
    t0 = time.perf_counter()
    ups = []
    for s in sets:
        ups.append([jax.device_put(jnp.asarray(a)) for a in s])
    for u in ups:
        np.asarray(u[0][:1, :1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"upload only  {nbytes/1e3:8.0f} KB: {dt*1e3:8.2f} ms/call "
          f"({nbytes/dt/1e6:6.1f} MB/s)", flush=True)

    def call(args):
        hps, rd, rc, rl, ms = args
        return fused.fused_batch(hps, rd, rc, rl, ms, jnp.int32(0),
                                 H=H, R=R, scorer="m1b")[2]

    # (b) fused with fresh host inputs each call
    np.asarray(call(tuple(jnp.asarray(a) for a in sets[0])))
    t0 = time.perf_counter()
    outs = [call(tuple(jnp.asarray(a) for a in s)) for s in sets]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"fused fresh  H=R={H} B={B}: {dt*1e3:8.2f} ms/call "
          f"({dt/B*1e3:6.3f} ms/row)", flush=True)

    # (c) fused on pre-uploaded inputs
    pre = [tuple(jax.device_put(jnp.asarray(a)) for a in s)
           for s in sets]
    np.asarray(call(pre[0]))
    t0 = time.perf_counter()
    outs = [call(s) for s in pre]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"fused preup  H=R={H} B={B}: {dt*1e3:8.2f} ms/call "
          f"({dt/B*1e3:6.3f} ms/row)", flush=True)


if __name__ == "__main__":
    main()
