"""The skew/unskew pyramids are exact at every merge radix.

VAPOR_TPU_RADIX (2/4/8) trades sequential pad+add rounds (log_g H)
for wider per-round merges; the histogram and the broadcast-back must
be bit-identical at every setting (the production default is chosen by
the on-chip A/B, scripts/ab_radix.py).  Brute-force oracle: the
definition c = col_offset + j + sign*i applied cell by cell.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from vapor_tpu.engine import fused

SHAPES = [(48, 64), (33, 17), (128, 96), (1, 5), (5, 1), (300, 200)]


@pytest.mark.parametrize("radix", ["2", "4", "8"])
def test_skew_reduce_exact(radix, monkeypatch):
    monkeypatch.setenv("VAPOR_TPU_RADIX", radix)
    rng = np.random.default_rng(7)
    for H, R in SHAPES:
        K = rng.integers(0, 3, size=(H, R)).astype(np.int8)
        W = fused.hist_width(H, R)
        for sign, off in ((-1, H), (+1, 0)):
            got = np.asarray(fused.skew_reduce(jnp.asarray(K), W,
                                               sign, off))
            exp = np.zeros(W, np.int64)
            for i in range(H):
                np.add.at(exp, off + np.arange(R) + sign * i, K[i])
            assert (got == exp).all(), (radix, H, R, sign)


@pytest.mark.parametrize("radix", ["2", "4", "8"])
def test_unskew_broadcast_exact(radix, monkeypatch):
    monkeypatch.setenv("VAPOR_TPU_RADIX", radix)
    rng = np.random.default_rng(11)
    for H, R in SHAPES:
        W = fused.hist_width(H, R)
        table = rng.integers(0, 2, size=(W,)).astype(bool)
        for sign, off in ((-1, H), (+1, 0)):
            got = np.asarray(fused.unskew_broadcast(
                jnp.asarray(table), H, sign, off, R))
            i = np.arange(H)[:, None]
            j = np.arange(R)[None, :]
            exp = table[off + j + sign * i]
            assert (got == exp).all(), ("unskew", radix, H, R, sign)
