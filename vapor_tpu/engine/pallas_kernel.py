"""Pallas TPU kernel for the dotplot histogram pass.

Design: every (b, ti, tj) grid step computes one (T, T) hit tile for
the forward and reverse-complement read strands and writes four 2T-wide
diagonal-band partial sums (fwd-diag, fwd-anti, rev-diag, rev-anti) to
its own output block.  All kernel addressing is **static**: sequences
arrive pre-sliced into overlapping (T+HALO) tiles and outputs are
per-tile blocks, so none of Mosaic's dynamic-offset alignment rules
are hit (1-D dynamic loads need 1024-element alignment, 1-D
dynamic_rotate is unsupported, dynamic-offset stores are unaligned).
Band assembly into full-width histograms — including the per-read
rlen-dependent shift of the reverse-strand bands — happens outside in
XLA on tiny (nti*ntj, 2T) arrays via the same radix-2 skew-sum used by
the fused engine.

In-tile diagonal sums use the radix-2 pairwise pad-shift-add merge
(~2 passes over the tile) instead of a log2(T)-pass butterfly roll.

Parity: tests/test_pallas_kernel.py (bit-exact vs the fused engine's
histograms, interpret mode on CPU and compiled on TPU v5e).
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


def _shift_diag(M: jnp.ndarray, step: int) -> jnp.ndarray:
    """M shifted up-left along the diagonal by `step` via static rolls.
    Wrapped garbage lands in the last `step` rows/cols; cumulative
    shifts stay <= k <= KMAX < HALO, so it never reaches [:T, :T]."""
    n0, n1 = M.shape
    return pltpu.roll(pltpu.roll(M, n0 - step, 0), n1 - step, 1)


def _win_and_tile(M: jnp.ndarray, k: int) -> jnp.ndarray:
    """AND over k diagonal shifts inside a (T+HALO)^2 tile (static k)."""
    pows = {1: M}
    cur, step = M, 1
    while step * 2 <= k:
        cur = cur & _shift_diag(cur, step)
        step *= 2
        pows[step] = cur
    out = None
    shift, rem = 0, k
    for step in sorted(pows, reverse=True):
        if step <= rem:
            part = pows[step]
            moved = _shift_diag(part, shift) if shift else part
            out = moved if out is None else (out & moved)
            shift += step
            rem -= step
    return out[:TILE, :TILE]


def _tile_skew_sum(K: jnp.ndarray, sign: int) -> jnp.ndarray:
    """(1, 2T) sums of a (T, T) 0/1 int32 tile over c = b + sign*a +
    offs, offs = T-1 for sign=-1 (diag), 0 for sign=+1 (anti); butterfly
    rolls.  (A contiguous-halves radix-2 merge does ~5x less arithmetic
    but Mosaic relayout copies on the row slices made it slower on
    v5e; the butterfly's full-width rolls lower cleanly.)"""
    T = K.shape[0]
    W = 2 * T
    X = jnp.pad(K, ((0, 0), (T - 1, 1) if sign < 0 else (0, T)))
    rows = lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    bit = 1
    while bit < T:
        shift = bit if sign > 0 else W - bit
        rolled = pltpu.roll(X, shift, axis=1)
        X = jnp.where((rows & bit) > 0, rolled, X)
        bit *= 2
    return X.sum(axis=0, keepdims=True)


def _hist_kernel(m_ref, hap_ref, read_ref, rc_ref, out_ref,
                 *, k: int):
    """One (T, T) tile: hit detection + four band sums, all static."""
    hs = hap_ref[0, 0, :]
    rs = read_ref[0, 0, 0, :]
    cs = rc_ref[0, 0, 0, :]
    ti = pl.program_id(1)
    m = m_ref[pl.program_id(0)]

    row_iota = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    mask_m = ((ti * TILE + row_iota) >= m).astype(jnp.int32)

    # int32 0/1 through the rolls (tpu.rotate is 32-bit only; i1 vregs
    # break padding), int16 from the skew sums on
    Mf = (hs[:, None] == rs[None, :]).astype(jnp.int32)
    Kf = _win_and_tile(Mf, k) & mask_m
    Mr = (hs[:, None] == cs[None, :]).astype(jnp.int32)
    Kr = _win_and_tile(Mr, k) & mask_m

    fd = _tile_skew_sum(Kf, -1)   # l: b-a+T-1
    fa = _tile_skew_sum(Kf, +1)   # l: a+b
    rd = _tile_skew_sum(Kr, +1)   # reverse strand: anti within tile
    ra = _tile_skew_sum(Kr, -1)
    out_ref[0, 0, 0, :, :] = jnp.concatenate([fd, fa, rd, ra], axis=0)


def _overlapping_tiles(seq2d: jnp.ndarray, n_tiles: int) -> jnp.ndarray:
    """(..., L) -> (..., n_tiles, TILE+HALO) static overlapping slices."""
    parts = [lax.slice_in_dim(seq2d, t * TILE, t * TILE + TILE + HALO,
                              axis=-1)
             for t in range(n_tiles)]
    return jnp.stack(parts, axis=-2)


def _skew_sum_unit(X: jnp.ndarray, sign: int, unit: int,
                   dtype=jnp.int32) -> jnp.ndarray:
    """Radix-2 skew-sum over rows with shift granularity `unit` columns:
    out[c] = sum_r X[r, c - sign*r*unit ...]; row r shifted by
    sign*r*unit.  Returns width W + (rows_pow2-1)*unit."""
    s = 1
    X = X.astype(dtype)
    while X.shape[0] > 1:
        rows = X.shape[0]
        if rows % 2:
            X = jnp.pad(X, ((0, 1), (0, 0)))
        A = X[0::2]
        B = X[1::2]
        w = s * unit
        if sign > 0:
            X = jnp.pad(A, ((0, 0), (0, w))) + jnp.pad(B, ((0, 0), (w, 0)))
        else:
            X = jnp.pad(A, ((0, 0), (w, 0))) + jnp.pad(B, ((0, 0), (0, w)))
        s *= 2
    return X[0]


@functools.partial(jax.jit, static_argnames=("k", "H", "R", "B",
                                             "interpret"))
def _pallas_hist_batch(rlens, ms, hap_p, reads_p, rcs_p, *, k: int,
                       H: int, R: int, B: int, interpret: bool):
    WH = hist_width(H, R)
    nti, ntj = H // TILE, R // TILE
    T2 = 2 * TILE

    hap_t = _overlapping_tiles(hap_p.astype(jnp.int32)[None, :], nti)[0]
    hap_t = hap_t[:, None, :]                       # (nti, 1, T+HALO)
    read_t = _overlapping_tiles(reads_p.astype(jnp.int32), ntj)
    read_t = read_t[:, :, None, :]                  # (B, ntj, 1, T+HALO)
    rc_t = _overlapping_tiles(rcs_p.astype(jnp.int32), ntj)
    rc_t = rc_t[:, :, None, :]

    kern = functools.partial(_hist_kernel, k=k)
    contrib = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nti, ntj),
            in_specs=[
                pl.BlockSpec((1, 1, TILE + HALO),
                             lambda b, i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, TILE + HALO),
                             lambda b, i, j, *_: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, TILE + HALO),
                             lambda b, i, j, *_: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, 4, T2),
                lambda b, i, j, *_: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, nti, ntj, 4, T2),
                                       jnp.int32),
        interpret=interpret,
    )(ms, hap_t, read_t, rc_t)

    fd, fa, rd, ra = (contrib[..., 0, :], contrib[..., 1, :],
                      contrib[..., 2, :], contrib[..., 3, :])

    def band_rows(x, sign_j):
        # per (b, ti): combine the ntj blocks, each shifted by
        # sign_j * tj * TILE  -> width T2 + (ntj-1)*TILE (+pow2 pad)
        def per_bi(xb):                              # (ntj, T2)
            return _skew_sum_unit(xb, sign_j, TILE)
        return jax.vmap(jax.vmap(per_bi))(x)         # (B, nti, Wj)

    def assemble(rows, sign_i):
        # rows (B, nti, Wj): shift row ti by sign_i * ti * TILE
        def per_b(rb):
            return _skew_sum_unit(rb, sign_i, TILE)
        return jax.vmap(per_b)(rows)                 # (B, Wij)

    # forward diag: c_d = H + (j - i) - (TILE-1) ... value l maps to
    # H + (tj-ti)*TILE + l - (TILE-1); skew over tj (+), over ti (-)
    g_fd = assemble(band_rows(fd, +1), -1)
    # forward anti: c_a = (ti+tj)*TILE + l
    g_fa = assemble(band_rows(fa, +1), +1)
    # reverse diag: value = (rlen-k+H) - (tj*T + l) - ti*T -> C - c2
    g_rd = assemble(band_rows(rd, +1), +1)
    # reverse anti: value = (rlen-k) + (T-1) + ti*T - (tj*T + l)
    g_ra = assemble(band_rows(ra, +1), -1)

    W = WH
    out_d = jnp.zeros((B, W), jnp.int32)
    out_a = jnp.zeros((B, W), jnp.int32)

    # place forward diag: index H + l' - (TILE-1) - Sd + ... where the
    # ti-skew introduced offset (Si-1)*TILE for sign=-1 (rows padded to
    # pow2 Si): g_fd[l'] holds values l' - (Si_pad-1)*TILE relative
    def pow2(n):
        p = 1
        while p < n:
            p *= 2
        return p

    Si = pow2(nti)
    # sign=-1 skew over ti gives c = base + l where row ti contributes
    # at l = (Si-1)*TILE ... value = H - (TILE-1) + (tj-ti)T + l0:
    # offset of g_fd index 0 = H - (TILE-1) - (Si-1)*TILE
    off_fd = H - (TILE - 1) - (Si - 1) * TILE
    out_d = _acc_place_static(out_d, g_fd, off_fd)
    out_a = _acc_place_static(out_a, g_fa, 0)

    # reverse strands: band value depends on rlen per read -> roll
    C = rlens - k + H                                # (B,)
    # g_rd index c ↦ value C - c  -> flip then place at C - (L-1)
    Lrd = g_rd.shape[-1]
    out_d = _acc_place_dynamic(out_d, jnp.flip(g_rd, axis=-1),
                               C - (Lrd - 1))
    # g_ra index c ↦ value (rlen-k) + (T-1) + (Si-1)*T - c
    Lra = g_ra.shape[-1]
    off_ra = (TILE - 1) + (Si - 1) * TILE - (Lra - 1)
    out_a = _acc_place_dynamic(out_a, jnp.flip(g_ra, axis=-1),
                               rlens - k + off_ra)
    return out_d, out_a


def _acc_place_static(out: jnp.ndarray, g: jnp.ndarray,
                      off: int) -> jnp.ndarray:
    """out[:, off + l] += g[:, l] with clipping (static offset)."""
    W = out.shape[-1]
    L = g.shape[-1]
    lo = max(0, -off)
    hi = min(L, W - off)
    if hi <= lo:
        return out
    return out.at[:, off + lo: off + hi].add(g[:, lo:hi])


def _acc_place_dynamic(out: jnp.ndarray, g: jnp.ndarray,
                       offs: jnp.ndarray) -> jnp.ndarray:
    """out[b, offs[b] + l] += g[b, l], per-read dynamic offset.

    Roll g into a W-wide buffer: pad/clip to W then rotate per row.
    Offsets may be negative (clipped); values beyond W-1 are dropped."""
    B, W = out.shape
    L = g.shape[-1]
    WB = W + L  # wide enough that rotation never wraps into view
    buf = jnp.zeros((B, WB), jnp.int32)
    buf = buf.at[:, :L].set(g)
    shift = jnp.clip(offs, -L, W)[:, None]
    idx = (lax.broadcasted_iota(jnp.int32, (B, WB), 1) - shift) % WB
    rolled = jnp.take_along_axis(buf, idx, axis=1)
    return out + rolled[:, :W]


def pallas_hist(hap: np.ndarray, reads: np.ndarray, rcs: np.ndarray,
                rlens: np.ndarray, ms: np.ndarray, k: int,
                interpret: bool = True
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h_d, h_a, n_dots) per read — histogram buckets as in the fused
    engine (c_d = H + j - i at index c_d, c_a = i + j)."""
    H = hap.shape[0]
    B, R = reads.shape
    WH = hist_width(H, R)
    hap_p = np.concatenate([hap, np.full(HALO, 255, np.uint8)])
    reads_p = np.concatenate(
        [reads, np.full((B, HALO), 253, np.uint8)], axis=1)
    rcs_p = np.concatenate(
        [rcs, np.full((B, HALO), 252, np.uint8)], axis=1)

    hd, ha = _pallas_hist_batch(
        jnp.asarray(rlens, jnp.int32), jnp.asarray(ms, jnp.int32),
        jnp.asarray(hap_p), jnp.asarray(reads_p), jnp.asarray(rcs_p),
        k=k, H=H, R=R, B=B, interpret=interpret)
    hd = np.asarray(hd)[:, :WH]
    ha = np.asarray(ha)[:, :WH]
    # every dot (forward and reverse) contributes exactly one h_d count
    return hd, ha, hd.sum(axis=1, dtype=np.int64).astype(np.int32)
