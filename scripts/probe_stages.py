"""TPU probe: per-stage timing of the fused m1b pipeline.

Stages (cumulative):
  hits    — MXU one-hot hit matrices (fwd+rev), reduce to scalar
  hists   — + skew_reduce d/a histograms
  clusterU— + kept tables + unskew keep masks
  full    — the real fused_batch m1b

Pipelined dispatch (inputs pre-uploaded, 20 calls, fetch at end).
Run alone, NO timeout wrapper.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vapor_tpu.engine import fused
from vapor_tpu.engine.fused import (_hits_mxu, _hits_normal,
                                    _flip_to_dot_space, skew_reduce,
                                    kept_table_device, unskew_broadcast,
                                    hist_width)

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


def _stage_one(hap, read, rc, rlen, m, k_idx, stage):
    hits = _hits_mxu if jax.default_backend() != "cpu" else _hits_normal
    k = 10 * (k_idx + 1)
    Kf = hits(hap, read, k_idx, m)
    Kr = _flip_to_dot_space(hits(hap, rc, k_idx, m), rlen, k)
    if stage == "hits":
        return (Kf.sum(dtype=jnp.int32) + Kr.sum(dtype=jnp.int32))[None]
    W = hist_width(H, R)
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = skew_reduce(Ksum, W, -1, H)
    h_a = skew_reduce(Ksum, W, +1, 0)
    if stage == "hists":
        return (h_d.sum() + h_a.sum())[None]
    kd = kept_table_device(h_d, 10, 10, False)
    ka = kept_table_device(h_a, 10, 10, False)
    keep = unskew_broadcast(kd, H, -1, H, R) | \
        unskew_broadcast(ka, H, +1, 0, R)
    if stage == "clusterU":
        return keep.sum(dtype=jnp.int32)[None]
    raise ValueError(stage)


@functools.partial(jax.jit, static_argnames=("stage",))
def stage_batch(haps, reads, rcs, rlens, ms, k_idx, stage):
    def one(hap, read, rc, rlen, m):
        return _stage_one(hap, read, rc, rlen, m, k_idx, stage)
    return jax.vmap(one)(haps, reads, rcs, rlens, ms)


def timeit(name, fn, sets):
    out = fn(sets[0])
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    outs = [fn(s) for s in sets]
    for o in outs:
        jax.tree_util.tree_map(np.asarray, o)
    dt = (time.perf_counter() - t0) / len(sets)
    print(f"{name:10s} H=R={H} B={B}: {dt*1e3:8.2f} ms/call "
          f"({dt/B*1e3:6.3f} ms/row)", flush=True)
    return dt


def compare_hits_impls(sets):
    """Marginal cost of each hits implementation + full pipeline."""
    for impl in ("mxu", "packed"):
        fused.HITS_IMPL = impl
        jax.clear_caches()
        timeit(f"hits/{impl}", run_stage_impl(impl), sets)
        def run_full_i(s):
            hps, rd, rc, rl, ms = s
            return fused.fused_batch(hps, rd, rc, rl, ms, jnp.int32(0),
                                     H=H, R=R, scorer="m1b")[2]
        timeit(f"full/{impl}", run_full_i, sets)


def run_stage_impl(impl):
    fn = fused._HITS_IMPLS[impl]

    @jax.jit
    def batch(haps, reads, rcs, rlens, ms, k_idx):
        def one(hap, read, rc, rlen, m):
            Kf = fn(hap, read, k_idx, m)
            Kr = _flip_to_dot_space(fn(hap, rc, k_idx, m), rlen,
                                    10 * (k_idx + 1))
            return (Kf.sum(dtype=jnp.int32) +
                    Kr.sum(dtype=jnp.int32))[None]
        return jax.vmap(one)(haps, reads, rcs, rlens, ms)

    def f(s):
        hps, rd, rc, rl, ms = s
        return batch(hps, rd, rc, rl, ms, jnp.int32(0))
    return f


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    sets = [tuple(jax.device_put(jnp.asarray(a)) for a in make_inputs(i))
            for i in range(ITERS)]

    def run_stage(stage):
        def f(s):
            hps, rd, rc, rl, ms = s
            return stage_batch(hps, rd, rc, rl, ms, jnp.int32(0), stage)
        return f

    def run_full(s):
        hps, rd, rc, rl, ms = s
        return fused.fused_batch(hps, rd, rc, rl, ms, jnp.int32(0),
                                 H=H, R=R, scorer="m1b")[2]

    if os.environ.get("PROBE_IMPLS"):
        compare_hits_impls(sets)
    else:
        timeit("hits", run_stage("hits"), sets)
        timeit("hists", run_stage("hists"), sets)
        timeit("clusterU", run_stage("clusterU"), sets)
        timeit("full", run_full, sets)