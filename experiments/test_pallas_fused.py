"""Full-fusion Pallas engine vs the XLA fused engine: decoded stats
must match exactly (interpret mode on CPU; the TPU compiled path is
exercised by scripts/bench_pallas.py on hardware)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vapor_tpu.engine.fused import _fused_batch_jit
from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD
from pallas_fused import (pallas_del_batch,
                                           pallas_m1b_batch,
                                           pallas_rdd_batch,
                                           pallas_w10_batch)


def _decode(packed):
    p = np.asarray(packed, dtype=np.int64)
    s, m = p[:, :6], p[:, 6:]
    out = {
        "n_dots": (s[:, 0] << 16) + s[:, 1] + (s[:, 2] << 16) + s[:, 3],
        "i_min": s[:, 4],
        "i_max": s[:, 5],
        "cnt": (m[:, 0] << 16) + m[:, 1],
        "sum_absd": (m[:, 2] << 16) + m[:, 3],
        "w10": (m[:, 4] << 16) + m[:, 5],
        "sel_cnt": (m[:, 6] << 16) + m[:, 7],
        "sel_pos": (m[:, 8] << 16) + (m[:, 9] << 16) + m[:, 10],
        "sel_neg": (m[:, 11] << 16) + (m[:, 12] << 16) + m[:, 13],
    }
    if m.shape[1] >= 28:
        out["cnt2"] = (m[:, 14] << 16) + m[:, 15]
        out["sum_absd2"] = (m[:, 16] << 16) + m[:, 17]
        out["w10_2"] = (m[:, 18] << 16) + m[:, 19]
    return out


def _batch(H, R, B, seed, err=0.1, with_rc_hits=True):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    hap_len = H - rng.integers(5, 60)
    haps = np.full((B, H), HAP_PAD, np.uint8)
    reads = np.full((B, R), READ_PAD, np.uint8)
    rcs = np.full((B, R), READ_PAD, np.uint8)
    rlens = np.zeros(B, np.int32)
    ms = np.zeros(B, np.int32)
    for b in range(B):
        hap = bases[rng.integers(0, 4, hap_len)]
        haps[b, :hap_len] = hap
        rlen = min(int(R - rng.integers(10, 80)), hap_len)
        src = hap[:rlen].copy()
        if with_rc_hits and b % 3 == 0 and rlen > 220:
            # embed a revcomp segment so the reverse strand fires
            seg = src[50:150][::-1]
            seg = np.array([comp[int(x)] for x in seg], np.uint8)
            dst = rlen // 2
            src[dst:dst + 100] = seg
        flips = rng.integers(0, rlen, max(1, int(rlen * err)))
        src[flips] = bases[rng.integers(0, 4, flips.size)]
        reads[b, :rlen] = src
        rcs[b, :rlen] = np.array([comp[int(x)] for x in src[::-1]],
                                 np.uint8)
        rlens[b] = rlen
        ms[b] = int(rng.integers(0, 30))
    return (jnp.asarray(haps), jnp.asarray(reads), jnp.asarray(rcs),
            jnp.asarray(rlens), jnp.asarray(ms))


PALLAS = {"m1b": pallas_m1b_batch, "w10": pallas_w10_batch,
          "del": pallas_del_batch, "rdd": pallas_rdd_batch}


def _check(scorer, H, R, k, B=6, err=0.1):
    haps, reads, rcs, rlens, ms = _batch(H, R, B, seed=H + k, err=err)
    got = PALLAS[scorer](haps, reads, rcs, rlens, ms, H=H, R=R, k=k,
                         interpret=True)
    _, _, want = _fused_batch_jit(haps, reads, rcs, rlens, ms,
                                  jnp.int32(k // 10 - 1),
                                  H=H, R=R, scorer=scorer)
    dg, dw = _decode(got), _decode(want)
    assert set(dg) == set(dw)
    for key in dg:
        assert np.array_equal(dg[key], dw[key]), \
            (key, dg[key], dw[key])
    assert int(dg["n_dots"].sum()) > 0


@pytest.mark.parametrize("H,R,k", [
    (256, 256, 10),
    (512, 384, 10),
    (768, 512, 20),
    (512, 512, 40),
])
def test_pallas_m1b_matches_xla(H, R, k):
    _check("m1b", H, R, k)


@pytest.mark.parametrize("H,R,k", [
    (256, 256, 10),
    (512, 384, 10),
    (768, 512, 20),
])
def test_pallas_w10_matches_xla(H, R, k):
    _check("w10", H, R, k)


@pytest.mark.parametrize("H,R,k,err", [
    (256, 256, 10, 0.1),
    (512, 384, 10, 0.04),   # low error: dense diagonals, 50-dot keeps
    (768, 512, 20, 0.1),
])
def test_pallas_del_matches_xla(H, R, k, err):
    _check("del", H, R, k, err=err)


@pytest.mark.parametrize("H,R,k,err", [
    (256, 256, 10, 0.1),
    (512, 384, 10, 0.04),   # dense diagonals: intercept fit resolves
    (768, 512, 20, 0.1),
])
def test_pallas_rdd_matches_xla(H, R, k, err):
    _check("rdd", H, R, k, err=err)


def test_pallas_chunking_pads_rows():
    # row counts not divisible by the chunk width pad internally and
    # return exactly B rows, identical to the XLA engine
    H, R, k = 256, 256, 10
    for B in (1, 3, 11):
        haps, reads, rcs, rlens, ms = _batch(H, R, B, seed=B)
        got = pallas_m1b_batch(haps, reads, rcs, rlens, ms,
                               H=H, R=R, k=k, interpret=True)
        _, _, want = _fused_batch_jit(haps, reads, rcs, rlens, ms,
                                      jnp.int32(0), H=H, R=R,
                                      scorer="m1b")
        assert got.shape[0] == B
        dg, dw = _decode(got), _decode(want)
        for key in dg:
            assert np.array_equal(dg[key], dw[key]), key


# (test_fused_batch_routes_to_pallas was deleted in round 5 with the
# routing it exercised: vapor_tpu.engine.fused no longer consults the
# pallas engine — see experiments/README.md.  Engine-vs-engine parity
# stays covered by the direct pallas_*_batch comparisons above.)
