"""TPU probe: time the XLA fused m1b pipeline vs the Pallas hist pass.

Pipelined: all inputs pre-uploaded, all calls dispatched back-to-back,
small outputs fetched at the end (relay RTT amortized, like the real
async scoring path).  Run alone, NO timeout wrapper.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vapor_tpu.engine import fused, pallas_kernel as pk

H = R = int(os.environ.get("PROBE_H", "3072"))
B = int(os.environ.get("PROBE_B", "8"))
ITERS = int(os.environ.get("PROBE_ITERS", "20"))


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


def upload(sets):
    return [tuple(jax.device_put(jnp.asarray(a)) for a in s)
            for s in sets]


@jax.jit
def _sum32(x):
    return x.sum(dtype=jnp.int32)


def time_fused(sets):
    hps, rd, rc, rl, ms = sets[0]
    out = fused.fused_batch(hps, rd, rc, rl, ms, jnp.int32(0),
                            H=H, R=R, scorer="m1b")
    np.asarray(out[2])
    t0 = time.perf_counter()
    outs = []
    for s in sets:
        hps, rd, rc, rl, ms = s
        outs.append(fused.fused_batch(hps, rd, rc, rl, ms,
                                      jnp.int32(0), H=H, R=R,
                                      scorer="m1b")[2])
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / len(sets)
    print(f"fused m1b    H=R={H} B={B}: {dt*1e3:8.2f} ms/call "
          f"({dt/B*1e3:6.3f} ms/row)", flush=True)
    return dt


def time_pallas_hist(sets):
    def run(s):
        hps, rd, rc, rl, ms = s
        hap_p = jnp.concatenate([hps[0], jnp.full((pk.HALO,), 255,
                                                  jnp.uint8)])
        rd_p = jnp.pad(rd, ((0, 0), (0, pk.HALO)), constant_values=253)
        rc_p = jnp.pad(rc, ((0, 0), (0, pk.HALO)), constant_values=252)
        hd, ha = pk._pallas_hist_batch(rl, ms, hap_p, rd_p, rc_p,
                                       k=10, H=H, R=R, B=B,
                                       interpret=False)
        return _sum32(hd), _sum32(ha)

    a, b = run(sets[0])
    np.asarray(a), np.asarray(b)
    t0 = time.perf_counter()
    outs = [run(s) for s in sets]
    for a, b in outs:
        np.asarray(a), np.asarray(b)
    dt = (time.perf_counter() - t0) / len(sets)
    print(f"pallas hist  H=R={H} B={B}: {dt*1e3:8.2f} ms/call "
          f"({dt/B*1e3:6.3f} ms/row)  [hists stay on device]",
          flush=True)
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    sets = upload([make_inputs(i) for i in range(ITERS)])
    time_fused(sets)
    time_pallas_hist(sets)
    time_fused(sets)
