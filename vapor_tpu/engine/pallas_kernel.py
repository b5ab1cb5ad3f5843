"""Pallas TPU kernel for the dotplot histogram pass (experimental).

One tiled pass over the (haplotype x read) plane per read: each (ti, tj)
grid step loads T+K-length slices of the sequences from VMEM, builds the
base-equality tile, finds k-mer runs with static log-shift ANDs, and
accumulates the diagonal / anti-diagonal histograms with in-tile
butterfly rolls — the full matrices never touch HBM, unlike the XLA
fused engine whose skew pyramids stream them ~4.5 times.

Scope (round 1): forward + reverse-complement hit histograms + dot
count, i.e. the fused engine's "hist" stage.  Masked moments stay in
the XLA engine; swapping this kernel in behind `skew_reduce` is the
round-2 integration point once real-TPU compile/perf is measurable
(developed under interpret mode — the chip tunnel died this round).

Validated bit-exactly against the fused engine in
tests/test_pallas_kernel.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import hist_width

TILE = 256
HALO = 64          # >= KMAX, keeps slice shapes static
MARGIN = 2 * TILE  # guards low-side histogram placements


def _win_and_tile(M: jnp.ndarray, k: int) -> jnp.ndarray:
    """AND over k diagonal shifts inside a (T+HALO)^2 tile (static k)."""
    pows = {1: M}
    cur, step = M, 1
    while step * 2 <= k:
        nxt = cur[:-step, :-step] & cur[step:, step:]
        cur = jnp.pad(nxt, ((0, step), (0, step)))
        step *= 2
        pows[step] = cur
    out = None
    shift, rem = 0, k
    for step in sorted(pows, reverse=True):
        if step <= rem:
            part = pows[step]
            moved = jnp.pad(part[shift:, shift:],
                            ((0, shift), (0, shift))) if shift else part
            out = moved if out is None else (out & moved)
            shift += step
            rem -= step
    return out[:TILE, :TILE]


def _tile_diag_sums(K: jnp.ndarray, anti: bool) -> jnp.ndarray:
    """(2T,) sums over b - a + (T-1) (diag) or a + b (anti) of a (T, T)
    0/1 tile, via a row-indexed butterfly roll."""
    T = TILE
    X = jnp.pad(K.astype(jnp.int32), ((0, 0), (T - 1, 1) if not anti
                                      else (0, T)))
    rows = lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    sign = 1 if anti else -1
    for bit in (1, 2, 4, 8, 16, 32, 64, 128):
        if bit >= T:
            break
        rolled = jnp.roll(X, sign * bit, axis=1)
        X = jnp.where((rows & bit) > 0, rolled, X)
    return X.sum(axis=0)


def _hist_kernel(rlen_ref, m_ref,                 # scalar prefetch
                 hap_ref, read_ref, rc_ref,       # VMEM inputs
                 hd_ref, ha_ref, n_ref,           # outputs
                 *, k: int, H: int, R: int, WHP: int):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    @pl.when((ti == 0) & (tj == 0))
    def _init():
        hd_ref[:] = jnp.zeros_like(hd_ref)
        ha_ref[:] = jnp.zeros_like(ha_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    rlen = rlen_ref[b]
    m = m_ref[b]

    hs = hap_ref[pl.ds(ti * TILE, TILE + HALO)]
    rs = read_ref[0, pl.ds(tj * TILE, TILE + HALO)]
    cs = rc_ref[0, pl.ds(tj * TILE, TILE + HALO)]

    row_iota = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    mask_m = (ti * TILE + row_iota) >= m

    Mf = hs[:, None] == rs[None, :]
    Kf = _win_and_tile(Mf, k) & mask_m
    Mr = hs[:, None] == cs[None, :]
    Kr = _win_and_tile(Mr, k) & mask_m

    # forward dots (i, j): c_d = H + j - i, c_a = i + j
    fd = _tile_diag_sums(Kf, anti=False)    # index l: b-a = l-(T-1)
    fa = _tile_diag_sums(Kf, anti=True)     # index l: a+b = l
    base_fd = MARGIN + H + (tj - ti) * TILE - (TILE - 1)
    base_fa = MARGIN + (ti + tj) * TILE
    hd_ref[0, pl.ds(base_fd, 2 * TILE)] += fd
    ha_ref[0, pl.ds(base_fa, 2 * TILE)] += fa

    # inverted dots at (i, q), j = rlen - k - q:
    #   c_d = (rlen - k + H) - (i + q)  -> reversed anti sums
    #   c_a = (rlen - k) + (q... i - q) -> reversed? c_a = rlen-k-q+i
    rd = _tile_diag_sums(Kr, anti=True)
    ra = _tile_diag_sums(Kr, anti=False)
    C = rlen - k + H
    base_rd = MARGIN + C - (ti + tj) * TILE - (2 * TILE - 1)
    # c_a = (rlen - k) + (i - q): diag sums l: q-i = l-(T-1) ->
    # i-q = (T-1)-l -> reversed vector at base (rlen-k)+(ti-tj)T-(T-1)
    base_ra = MARGIN + (rlen - k) + (ti - tj) * TILE - TILE

    @pl.when(tj * TILE < rlen)
    def _acc_inv():
        hd_ref[0, pl.ds(base_rd, 2 * TILE)] += jnp.flip(rd)
        ha_ref[0, pl.ds(base_ra, 2 * TILE)] += jnp.flip(ra)

    n_ref[0, 0] += Kf.sum(dtype=jnp.int32) + Kr.sum(dtype=jnp.int32)


def pallas_hist(hap: np.ndarray, reads: np.ndarray, rcs: np.ndarray,
                rlens: np.ndarray, ms: np.ndarray, k: int,
                interpret: bool = True
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h_d, h_a, n_dots) per read — histogram buckets as in the fused
    engine (c_d = H + j - i at index c_d, c_a = i + j)."""
    H = hap.shape[0]
    B, R = reads.shape
    WH = hist_width(H, R)
    WHP = WH + 2 * MARGIN
    hap_p = np.concatenate([hap, np.full(HALO, 255, np.uint8)])
    reads_p = np.concatenate(
        [reads, np.full((B, HALO), 253, np.uint8)], axis=1)
    rcs_p = np.concatenate(
        [rcs, np.full((B, HALO), 252, np.uint8)], axis=1)

    grid = (B, H // TILE, R // TILE)
    kern = functools.partial(_hist_kernel, k=k, H=H, R=R, WHP=WHP)
    hd, ha, n = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((H + HALO,), lambda b, i, j, *_: (0,)),
                pl.BlockSpec((1, R + HALO), lambda b, i, j, *_: (b, 0)),
                pl.BlockSpec((1, R + HALO), lambda b, i, j, *_: (b, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, WHP), lambda b, i, j, *_: (b, 0)),
                pl.BlockSpec((1, WHP), lambda b, i, j, *_: (b, 0)),
                pl.BlockSpec((1, 1), lambda b, i, j, *_: (b, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, WHP), jnp.int32),
            jax.ShapeDtypeStruct((B, WHP), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(rlens, jnp.int32), jnp.asarray(ms, jnp.int32),
      jnp.asarray(hap_p), jnp.asarray(reads_p), jnp.asarray(rcs_p))
    hd = np.asarray(hd)[:, MARGIN:MARGIN + WH]
    ha = np.asarray(ha)[:, MARGIN:MARGIN + WH]
    return hd, ha, np.asarray(n)[:, 0]
