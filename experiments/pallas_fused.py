"""Full-fusion Pallas engine: hits + skew histograms + cluster keep +
masked moments with the (H, R) hit matrix living ONLY in VMEM.

The XLA fused engine (engine/fused.py) materializes the int8 hit
matrices in HBM and re-reads them across the skew-reduce pyramid,
unskew broadcast and moment stages (~8-15 passes at H=R=3072).  Here
each pass recomputes the hits from the packed 4-bit k-mer lane codes
(VPU-cheap: <=5 int32 compares per cell) inside a row x H-tile grid and
accumulates everything downstream in VMEM scratch, so HBM traffic per
row drops to the code arrays plus compact histogram/moment outputs.

Mosaic constraints shaped the design:

* no `rev` primitive -> the reverse-complement side works in
  column-reversed coordinates (q' = R-1-q; the rc code array is
  reversed once in XLA where `rev` exists);
* dynamic VMEM slice starts must be provably 128-aligned -> every
  in-kernel placement depends only on i0 = t*TH (TH is a multiple of
  128) plus a constant bias BIAS_D = 127 that absorbs the `TH-1` skew
  offset; the per-row rlen-dependent shift of the rc side is applied
  OUTSIDE the kernels: rc histogram parts are separate outputs that
  XLA shifts and adds (`_combine_hists`), and the rc keep-table
  lookups read per-row pre-rolled copies of the tables
  (`_prep_tables`);
* int8/int16 vector adds hit internal Mosaic errors at these shapes,
  so the VMEM pyramids run in int32 (VMEM bandwidth is not the
  bottleneck there).

Passes:

* pass A (`hist_pass`): per-tile hits for both strands, in-VMEM
  radix-2 skew pyramids -> four histogram parts (fw/rc x diag/anti)
  plus gate scalars (per-strand dot counts, i_min/i_max);
* 1-D cluster keep-tables stay in XLA between passes (cummax/cumsum
  over W-wide histograms — cheap, fuses, Mosaic lowers scans poorly);
* pass B (`moment_pass` / `moment2_pass`): hits again, keep masks
  rebuilt per tile from the prepared tables by in-VMEM unskew
  broadcast, masked moment column-sums accumulated in (1, R) scratch
  and hi/lo-split exactly like the XLA engine so the host-side
  FusedStats math is unchanged;
* `left_hist_pass`: the within-10% second cleaning stage (anti-diag
  histogram of cells not kept by the d-table).

Parity: identical decoded stats vs engine.fused._fused_batch_jit
(tests/test_pallas_fused.py).  Reference semantics reproduced: the
dotplot/cleaning/metric stack of Simple_function.pyx:161-307, 387-479,
551-580, 705-786.
"""
from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vapor_tpu.engine.fused import hist_width, _NIB_LUT
from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD

BIAS_D = 127     # (TH-1-H) mod 128 for every bucket (TH-1 ≡ 127, H ≡ 0)


def _lanes(k: int) -> int:
    return -(-k // 8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_h(H: int, R: int) -> int:
    """H-tile height: power-of-two multiple of 128 dividing H (buckets
    are multiples of 256).  Measured on v5e (B=24, m1b): TH=512 wins
    slightly at R<=1024 (fewer grid steps) but runs up to 2x SLOWER
    than TH=256 from R=1536 on (deeper pyramids hold more live VMEM
    temporaries; at R=3072 its 7.3 MB skew buffer overflows the 16 MB
    scoped-VMEM limit outright), while TH=256 stays fast through
    R=4096 (4.46 MB buffer, 1.3-1.9x over XLA).  TH=128 is the
    fallback for very wide reads; past R~13k even that may fail to
    compile — the autotune probe catches it and uses the XLA engine."""
    if H % 512 == 0 and R <= 1024:
        return 512
    th = 256 if R <= 6400 else 128
    while th > 128 and H % th:
        th //= 2
    return min(th, H)


def _consts(H: int, R: int):
    """(TH, L, L128, W, WSX): tile height, skew-row width, its 128-pad,
    dot-space histogram width, and the padded scratch/table width that
    fits every placement window plus the XLA-side rc shifts."""
    TH = _tile_h(H, R)
    L = TH + R - 1
    L128 = _round_up(L, 128)
    W = hist_width(H, R)
    WSX = _round_up(BIAS_D + 1 + W + R + 256, 128)
    return TH, L, L128, W, WSX


def pack_codes_host(seqs: jnp.ndarray, k: int, pad_byte: int
                    ) -> jnp.ndarray:
    """(B, L) uint8 -> (B, lanes, L) int32 rolling packed k-mer codes
    (same nibble scheme as fused._pack_codes, batched)."""
    B, L = seqs.shape
    lanes = _lanes(k)
    nib = jnp.asarray(_NIB_LUT, dtype=jnp.int32)[seqs]
    ext = jnp.concatenate(
        [nib, jnp.full((B, 8 * lanes), int(_NIB_LUT[pad_byte]),
                       jnp.int32)], axis=1)
    out = []
    for lane in range(lanes):
        acc = jnp.zeros((B, L), jnp.int32)
        for t in range(min(8, k - 8 * lane)):
            s = 8 * lane + t
            acc = acc | (lax.slice_in_dim(ext, s, s + L, axis=1)
                         << jnp.int32(4 * t))
        out.append(acc)
    return jnp.stack(out, axis=1)


def _hits_tile(ch_tile, cr_row, lanes: int):
    """(lanes, TH) x (lanes, R) packed codes -> (TH, R) bool hits."""
    K = ch_tile[0][:, None] == cr_row[0][None, :]
    for lane in range(1, lanes):
        K = K & (ch_tile[lane][:, None] == cr_row[lane][None, :])
    return K


def _tile_skew(K: jnp.ndarray, sign: int, L128: int) -> jnp.ndarray:
    """(TH, R) bool -> (1, L128) int32 sums over t = j + i (sign=+1)
    or t = (j - i) + TH - 1 (sign=-1).

    Roll-based radix-2 contiguous-halves pyramid: each merge adds the
    bottom half rolled by its row-index offset.  Rolls are modular but
    every true target index lies in [0, TH+R-2] < L128, so wraparound
    never aliases.  (Mosaic has no `pad`/`concatenate` lowering for
    the odd widths the classic shift-pad pyramid produces, and its
    int8/int16 adds hit internal errors — int32 + pltpu.roll lowers
    cleanly.)"""
    TH, R = K.shape
    X = jnp.pad(K.astype(jnp.int32), ((0, 0), (0, L128 - R)))
    if sign < 0:
        X = pltpu.roll(X, TH - 1, axis=1)        # global +(TH-1)
    step = 1 if sign > 0 else L128 - 1           # per-row-index shift
    while X.shape[0] > 1:
        n2 = X.shape[0] // 2
        A = X[:n2]
        B = X[n2:]
        X = A + pltpu.roll(B, (step * n2) % L128, axis=1)
    return X                                     # (1, L128)


def _tile_unskew(table_row: jnp.ndarray, TH: int, R: int,
                 sign: int) -> jnp.ndarray:
    """(1, WX>=TH+R-1) table -> (TH, R) mat:
    sign=+1: mat[i, j] = table[0, j + i]
    sign=-1: mat[i, j] = table[0, (TH-1) - i + j]
    Row-doubling with rolls (contiguous halves keep row order; all
    true indices < WX so modular rolls are exact)."""
    WX = table_row.shape[1]
    Y = table_row
    if sign < 0:
        Y = pltpu.roll(Y, (WX - (TH - 1)) % WX, axis=1)  # -(TH-1)
    step = WX - 1 if sign > 0 else 1             # roll per +row-index
    while Y.shape[0] < TH:
        n = Y.shape[0]
        Y = jnp.concatenate(
            [Y, pltpu.roll(Y, (step * n) % WX, axis=1)], axis=0)
    return Y[:, :R]


def _acc(hist_ref, row: jnp.ndarray, start) -> None:
    """hist_ref[0, start : start+width] += row (128-aligned start)."""
    Lw = row.shape[1]
    start = pl.multiple_of(start, 128)
    cur = hist_ref[0, pl.ds(start, Lw)]
    hist_ref[0, pl.ds(start, Lw)] = cur + row[0]


def _start_d(i0, H: int, TH: int):
    # BIAS_D + 1 + H - i0 - TH  ==  BIAS_D + H - i0 - (TH-1): the
    # d-type placement start; multiple of 128 by construction
    return (BIAS_D + 1) + H - i0 - TH


def _start_a(i0):
    return i0


# ---------------------------------------------------------------------------
# pass A: histogram parts + gate scalars
# ---------------------------------------------------------------------------

def _hist_kernel(ms, rlens, ch, cf, cq, hfd_o, hfa_o, hrd_o, hra_o,
                 sc_o, hfd, hfa, hrd, hra, sc_s, *, lanes: int,
                 TH: int, H: int, R: int, L128: int, WSX: int, k: int,
                 n_th: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    i0 = t * TH
    m = ms[b]

    @pl.when(t == 0)
    def _init():
        for ref in (hfd, hfa, hrd, hra):
            ref[:] = jnp.zeros((1, WSX), jnp.int32)
        sc_s[0] = 0
        sc_s[1] = 0
        sc_s[2] = H + 1
        sc_s[3] = -1

    ch_t = ch[0]
    li = lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    rows_ok = (li + i0) >= m
    Kf = _hits_tile(ch_t, cf[0], lanes) & rows_ok
    Kq = _hits_tile(ch_t, cq[0], lanes) & rows_ok

    sc_s[0] = sc_s[0] + jnp.sum(Kf, dtype=jnp.int32)
    sc_s[1] = sc_s[1] + jnp.sum(Kq, dtype=jnp.int32)
    any_row = (jnp.sum(Kf, axis=1, keepdims=True, dtype=jnp.int32) +
               jnp.sum(Kq, axis=1, keepdims=True, dtype=jnp.int32)) > 0
    gi = li + i0
    sc_s[2] = jnp.minimum(sc_s[2],
                          jnp.min(jnp.where(any_row, gi, H + 1)))
    sc_s[3] = jnp.maximum(sc_s[3],
                          jnp.max(jnp.where(any_row, gi, -1)))

    # fw: y_d = BIAS_D + H + j - i (dot space at bias), y_a = i + j
    # rc (reversed coords): y_d = BIAS_D + H + q' - li - i0,
    #                       y_a = i0 + li + q'
    # true rc coordinates are shifted by (rlen - k - R + 1): applied
    # in XLA (_combine_hists), keeping every in-kernel start aligned
    _acc(hfd, _tile_skew(Kf, -1, L128), _start_d(i0, H, TH))
    _acc(hfa, _tile_skew(Kf, +1, L128), _start_a(i0))
    _acc(hrd, _tile_skew(Kq, -1, L128), _start_d(i0, H, TH))
    _acc(hra, _tile_skew(Kq, +1, L128), _start_a(i0))

    @pl.when(t == n_th - 1)
    def _flush():
        hfd_o[0, 0, :] = hfd[0, :]
        hfa_o[0, 0, :] = hfa[0, :]
        hrd_o[0, 0, :] = hrd[0, :]
        hra_o[0, 0, :] = hra[0, :]
        sc_o[0, 0, 0] = sc_s[0]
        sc_o[0, 0, 1] = sc_s[1]
        sc_o[0, 0, 2] = sc_s[2]
        sc_o[0, 0, 3] = sc_s[3]


@functools.partial(jax.jit,
                   static_argnames=("lanes", "H", "R", "k", "interpret"))
def hist_pass(ms, rlens, ch, cf, cq, lanes: int, H: int, R: int,
              k: int, interpret: bool = False):
    """Packed codes -> four (B, WSX) histogram parts + (B, 4) gate
    scalars [n_f, n_r, i_min, i_max]."""
    B = ch.shape[0]
    TH, L, L128, W, WSX = _consts(H, R)
    n_th = H // TH
    kern = functools.partial(_hist_kernel, lanes=lanes, TH=TH, H=H,
                             R=R, L128=L128, WSX=WSX, k=k, n_th=n_th)
    wide = pl.BlockSpec((1, 1, WSX), lambda b, t, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_th),
            in_specs=[
                pl.BlockSpec((1, lanes, TH), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[wide, wide, wide, wide,
                       pl.BlockSpec((1, 1, 4), lambda b, t, *_: (b, 0, 0),
                                    memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.VMEM((1, WSX), jnp.int32),
                pltpu.VMEM((1, WSX), jnp.int32),
                pltpu.VMEM((1, WSX), jnp.int32),
                pltpu.VMEM((1, WSX), jnp.int32),
                pltpu.SMEM((4,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 4), jnp.int32),
        ],
        interpret=interpret,
    )(ms, rlens, ch, cf, cq)
    hfd, hfa, hrd, hra, sc = out
    return (hfd.reshape(B, WSX), hfa.reshape(B, WSX),
            hrd.reshape(B, WSX), hra.reshape(B, WSX), sc.reshape(B, 4))


def _rc_shift(rlens, k: int, R: int):
    """True rc coordinate = kernel coordinate + shift (negative)."""
    return rlens - (k + R - 1)


def _combine_hists(hfd, hfa, hrd, hra, rlens, H: int, R: int, k: int):
    """XLA glue: merge the four histogram parts into dot-space
    h_d / h_a of width W (the rc parts shifted per row by rlen)."""
    TH, L, L128, W, WSX = _consts(H, R)
    shift = _rc_shift(rlens, k, R)

    def one(fd, fa, rd, ra, sh):
        h_d = lax.dynamic_slice(fd, (BIAS_D + 1,), (W,)) + \
            lax.dynamic_slice(rd, (BIAS_D + 1 - sh,), (W,))
        h_a = lax.dynamic_slice(fa, (0,), (W,)) + \
            lax.dynamic_slice(ra, (-sh,), (W,))
        return h_d, h_a

    return jax.vmap(one)(hfd, hfa, hrd, hra, shift)


def _prep_tables(kd, ka, rlens, H: int, R: int, k: int):
    """Keep tables -> kernel-ready padded copies: d-type at bias
    BIAS_D+1, a-type at bias 0, plus per-row rc variants pre-rolled by
    the rlen shift so in-kernel lookups stay 128-aligned.
    Returns (kd_d, ka_a, kd_rc, ka_rc), each (B, 1, WSX) int32."""
    TH, L, L128, W, WSX = _consts(H, R)
    shift = _rc_shift(rlens, k, R)
    kd = kd.astype(jnp.int32)
    ka = ka.astype(jnp.int32)

    def one(kd_row, ka_row, sh):
        z = jnp.zeros((WSX,), jnp.int32)
        kd_d = lax.dynamic_update_slice(z, kd_row, (BIAS_D + 1,))
        ka_a = lax.dynamic_update_slice(z, ka_row, (0,))
        # rc lookup reads table[y + BIAS_D+1] wanting kd[y + sh]:
        # place kd starting at BIAS_D+1 - sh
        kd_rc = lax.dynamic_update_slice(z, kd_row, (BIAS_D + 1 - sh,))
        ka_rc = lax.dynamic_update_slice(z, ka_row, (-sh,))
        return kd_d, ka_a, kd_rc, ka_rc

    kd_d, ka_a, kd_rc, ka_rc = jax.vmap(one)(kd, ka, shift)
    return (kd_d[:, None, :], ka_a[:, None, :],
            kd_rc[:, None, :], ka_rc[:, None, :])


# ---------------------------------------------------------------------------
# keep-mask reconstruction inside kernels
# ---------------------------------------------------------------------------

def _keep_masks(kd_t, ka_t, i0, TH: int, H: int, R: int, L128: int):
    """(TH, R) keep mask from a d-type and an a-type prepared table
    (works for both strands: the rc tables are pre-rolled)."""
    sd = pl.multiple_of(_start_d(i0, H, TH), 128)
    sa = pl.multiple_of(_start_a(i0), 128)
    d_sl = kd_t[0, 0, pl.ds(sd, L128)]
    a_sl = ka_t[0, 0, pl.ds(sa, L128)]
    return (_tile_unskew(d_sl[None, :], TH, R, -1) |
            _tile_unskew(a_sl[None, :], TH, R, +1)) > 0


# ---------------------------------------------------------------------------
# pass A2: anti-diagonal histogram of leftover cells (w10 stage 2)
# ---------------------------------------------------------------------------

def _left_hist_kernel(ms, rlens, ch, cf, cq, kdd, kdr, hfa_o, hra_o,
                      hfa, hra, *, lanes: int, TH: int, H: int,
                      R: int, L128: int, WSX: int, k: int, n_th: int):
    """h_a parts over cells NOT kept by the d-table (within-10%
    cleaning stage 2, pyx:432-449 second phase)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    i0 = t * TH
    m = ms[b]

    @pl.when(t == 0)
    def _init():
        hfa[:] = jnp.zeros((1, WSX), jnp.int32)
        hra[:] = jnp.zeros((1, WSX), jnp.int32)

    ch_t = ch[0]
    li = lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    rows_ok = (li + i0) >= m
    Kf = _hits_tile(ch_t, cf[0], lanes) & rows_ok
    Kq = _hits_tile(ch_t, cq[0], lanes) & rows_ok

    sd = pl.multiple_of(_start_d(i0, H, TH), 128)
    not_f = _tile_unskew(kdd[0, 0, pl.ds(sd, L128)][None, :],
                         TH, R, -1) == 0
    not_q = _tile_unskew(kdr[0, 0, pl.ds(sd, L128)][None, :],
                         TH, R, -1) == 0

    _acc(hfa, _tile_skew(Kf & not_f, +1, L128), _start_a(i0))
    _acc(hra, _tile_skew(Kq & not_q, +1, L128), _start_a(i0))

    @pl.when(t == n_th - 1)
    def _flush():
        hfa_o[0, 0, :] = hfa[0, :]
        hra_o[0, 0, :] = hra[0, :]


@functools.partial(jax.jit,
                   static_argnames=("lanes", "H", "R", "k", "interpret"))
def left_hist_pass(ms, rlens, ch, cf, cq, kd_d, kd_rc, lanes: int,
                   H: int, R: int, k: int, interpret: bool = False):
    """-> h_a_left (B, W) in dot space (parts combined here)."""
    B = ch.shape[0]
    TH, L, L128, W, WSX = _consts(H, R)
    n_th = H // TH
    kern = functools.partial(_left_hist_kernel, lanes=lanes, TH=TH,
                             H=H, R=R, L128=L128, WSX=WSX, k=k,
                             n_th=n_th)
    wide = pl.BlockSpec((1, 1, WSX), lambda b, t, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    hfa, hra = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_th),
            in_specs=[
                pl.BlockSpec((1, lanes, TH), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                wide, wide,
            ],
            out_specs=[wide, wide],
            scratch_shapes=[
                pltpu.VMEM((1, WSX), jnp.int32),
                pltpu.VMEM((1, WSX), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
        ],
        interpret=interpret,
    )(ms, rlens, ch, cf, cq, kd_d, kd_rc)
    hfa = hfa.reshape(B, WSX)
    hra = hra.reshape(B, WSX)
    shift = _rc_shift(rlens, k, R)

    def one(fa, ra, sh):
        return lax.dynamic_slice(fa, (0,), (W,)) + \
            lax.dynamic_slice(ra, (-sh,), (W,))

    return jax.vmap(one)(hfa, hra, shift)


# ---------------------------------------------------------------------------
# pass A3: d-histogram of kept cells (rdd intercept re-centering input)
# ---------------------------------------------------------------------------

def _kept_hist_kernel(ms, rlens, ch, cf, cq, kdd, kaa, kdr, kar,
                      hfd_o, hrd_o, hfd, hrd, *, lanes: int, TH: int,
                      H: int, R: int, L128: int, WSX: int, k: int,
                      n_th: int):
    """d-histogram parts of cells KEPT by the m1b tables — the input
    to the redefine-diagonal intercept fit (pyx:241-258, 582-592)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    i0 = t * TH
    m = ms[b]

    @pl.when(t == 0)
    def _init():
        hfd[:] = jnp.zeros((1, WSX), jnp.int32)
        hrd[:] = jnp.zeros((1, WSX), jnp.int32)

    ch_t = ch[0]
    li = lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    rows_ok = (li + i0) >= m
    Kf = _hits_tile(ch_t, cf[0], lanes) & rows_ok
    Kq = _hits_tile(ch_t, cq[0], lanes) & rows_ok

    keep_f = _keep_masks(kdd, kaa, i0, TH, H, R, L128)
    keep_q = _keep_masks(kdr, kar, i0, TH, H, R, L128)

    _acc(hfd, _tile_skew(Kf & keep_f, -1, L128), _start_d(i0, H, TH))
    _acc(hrd, _tile_skew(Kq & keep_q, -1, L128), _start_d(i0, H, TH))

    @pl.when(t == n_th - 1)
    def _flush():
        hfd_o[0, 0, :] = hfd[0, :]
        hrd_o[0, 0, :] = hrd[0, :]


@functools.partial(jax.jit,
                   static_argnames=("lanes", "H", "R", "k", "interpret"))
def kept_hist_pass(ms, rlens, ch, cf, cq, kd_d, ka_a, kd_rc, ka_rc,
                   lanes: int, H: int, R: int, k: int,
                   interpret: bool = False):
    """-> h_d_kept (B, W) in dot space (rc part shifted per row)."""
    B = ch.shape[0]
    TH, L, L128, W, WSX = _consts(H, R)
    n_th = H // TH
    kern = functools.partial(_kept_hist_kernel, lanes=lanes, TH=TH,
                             H=H, R=R, L128=L128, WSX=WSX, k=k,
                             n_th=n_th)
    wide = pl.BlockSpec((1, 1, WSX), lambda b, t, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    hfd, hrd = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_th),
            in_specs=[
                pl.BlockSpec((1, lanes, TH), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                wide, wide, wide, wide,
            ],
            out_specs=[wide, wide],
            scratch_shapes=[
                pltpu.VMEM((1, WSX), jnp.int32),
                pltpu.VMEM((1, WSX), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, WSX), jnp.int32),
        ],
        interpret=interpret,
    )(ms, rlens, ch, cf, cq, kd_d, ka_a, kd_rc, ka_rc)
    hfd = hfd.reshape(B, WSX)
    hrd = hrd.reshape(B, WSX)
    shift = _rc_shift(rlens, k, R)

    # slice at BIAS_D (not BIAS_D+1): the in-kernel d-placement puts
    # j - i + H at part index BIAS_D + (j - i + H) - ... one below the
    # gap-clustering convention; clustering is shift-invariant so the
    # other passes don't care, but the intercept fit reads absolute
    # positions (v = idx - H must equal j - i exactly, fused:359-412)
    def one(fd, rd, sh):
        return lax.dynamic_slice(fd, (BIAS_D,), (W,)) + \
            lax.dynamic_slice(rd, (BIAS_D - sh,), (W,))

    return jax.vmap(one)(hfd, hrd, shift)


# ---------------------------------------------------------------------------
# pass B3: redefine-diagonal moments (sel block, per-row intercept z)
# ---------------------------------------------------------------------------

def _rdd_moment_kernel(ms, rlens, zs, ch, cf, cq, kdd, kaa, kdr, kar,
                       mom_out, cnt_s, sd_s, sel_s, ph_s, pl_s, nh_s,
                       nl_s, *, lanes: int, TH: int, H: int, R: int,
                       L128: int, k: int, n_th: int):
    """Masked moments + the directed-redefine-diagonal selection block
    (fused._moment_block want_sel semantics, pyx:241-258, 718-723)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    i0 = t * TH
    m = ms[b]
    rlen = rlens[b]
    z = zs[b]

    @pl.when(t == 0)
    def _init():
        for ref in (cnt_s, sd_s, sel_s, ph_s, pl_s, nh_s, nl_s):
            ref[:] = jnp.zeros((1, R), jnp.int32)

    ch_t = ch[0]
    li = lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    rows_ok = (li + i0) >= m
    Kf = _hits_tile(ch_t, cf[0], lanes) & rows_ok
    Kq = _hits_tile(ch_t, cq[0], lanes) & rows_ok

    keep_f = _keep_masks(kdd, kaa, i0, TH, H, R, L128)
    keep_q = _keep_masks(kdr, kar, i0, TH, H, R, L128)

    gi = li + i0
    ip = gi - m
    cols = lax.broadcasted_iota(jnp.int32, (TH, R), 1)
    den0 = 2 * ip + z
    den = jnp.where(den0 == 0, jnp.abs(den0 + 2), jnp.abs(den0))
    for K, keep, d in ((Kf, keep_f, cols - ip),
                       (Kq, keep_q, (rlen - k - R + 1) + cols - ip)):
        M = (K & keep).astype(jnp.int32)
        cnt_s[0, :] = cnt_s[0, :] + jnp.sum(M, axis=0)
        sd_s[0, :] = sd_s[0, :] + jnp.sum(M * jnp.abs(d), axis=0)
        val = z - 2 * d
        sel = M * (10 * jnp.abs(val) > den)
        sel_s[0, :] = sel_s[0, :] + jnp.sum(sel, axis=0)
        pv = jnp.maximum(val, 0)
        nv = jnp.maximum(-val, 0)
        ph_s[0, :] = ph_s[0, :] + jnp.sum(sel * (pv >> 16), axis=0)
        pl_s[0, :] = pl_s[0, :] + jnp.sum(sel * (pv & 0xFFFF), axis=0)
        nh_s[0, :] = nh_s[0, :] + jnp.sum(sel * (nv >> 16), axis=0)
        nl_s[0, :] = nl_s[0, :] + jnp.sum(sel * (nv & 0xFFFF), axis=0)

    @pl.when(t == n_th - 1)
    def _flush():
        mom_out[0, 0, 0] = jnp.sum(cnt_s[0, :] >> 16)
        mom_out[0, 0, 1] = jnp.sum(cnt_s[0, :] & 0xFFFF)
        mom_out[0, 0, 2] = jnp.sum(sd_s[0, :] >> 16)
        mom_out[0, 0, 3] = jnp.sum(sd_s[0, :] & 0xFFFF)
        mom_out[0, 0, 4] = 0
        mom_out[0, 0, 5] = 0
        mom_out[0, 0, 6] = jnp.sum(sel_s[0, :] >> 16)
        mom_out[0, 0, 7] = jnp.sum(sel_s[0, :] & 0xFFFF)
        mom_out[0, 0, 8] = jnp.sum(ph_s[0, :])
        mom_out[0, 0, 9] = jnp.sum(pl_s[0, :] >> 16)
        mom_out[0, 0, 10] = jnp.sum(pl_s[0, :] & 0xFFFF)
        mom_out[0, 0, 11] = jnp.sum(nh_s[0, :])
        mom_out[0, 0, 12] = jnp.sum(nl_s[0, :] >> 16)
        mom_out[0, 0, 13] = jnp.sum(nl_s[0, :] & 0xFFFF)


@functools.partial(jax.jit,
                   static_argnames=("lanes", "H", "R", "k", "interpret"))
def rdd_moment_pass(ms, rlens, zs, ch, cf, cq, kd_d, ka_a, kd_rc,
                    ka_rc, lanes: int, H: int, R: int, k: int,
                    interpret: bool = False):
    """-> (B, 14) int32 moment rows with the sel block populated."""
    B = ch.shape[0]
    TH, L, L128, W, WSX = _consts(H, R)
    n_th = H // TH
    kern = functools.partial(_rdd_moment_kernel, lanes=lanes, TH=TH,
                             H=H, R=R, L128=L128, k=k, n_th=n_th)
    wide = pl.BlockSpec((1, 1, WSX), lambda b, t, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, n_th),
            in_specs=[
                pl.BlockSpec((1, lanes, TH), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                wide, wide, wide, wide,
            ],
            out_specs=pl.BlockSpec((1, 1, 14),
                                   lambda b, t, *_: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((1, R), jnp.int32)
                            for _ in range(7)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, 14), jnp.int32),
        interpret=interpret,
    )(ms, rlens, zs, ch, cf, cq, kd_d, ka_a, kd_rc,
      ka_rc).reshape(B, 14)


# ---------------------------------------------------------------------------
# pass B: masked moments (single keep set)
# ---------------------------------------------------------------------------

def _moment_kernel(ms, rlens, ch, cf, cq, kdd, kaa, kdr, kar, mom_out,
                   cnt_s, sd_s, w10_s, *, lanes: int, TH: int, H: int,
                   R: int, L128: int, k: int, n_th: int,
                   want_w10: bool):
    b = pl.program_id(0)
    t = pl.program_id(1)
    i0 = t * TH
    m = ms[b]
    rlen = rlens[b]

    @pl.when(t == 0)
    def _init():
        cnt_s[:] = jnp.zeros((1, R), jnp.int32)
        sd_s[:] = jnp.zeros((1, R), jnp.int32)
        w10_s[:] = jnp.zeros((1, R), jnp.int32)

    ch_t = ch[0]
    li = lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    rows_ok = (li + i0) >= m
    Kf = _hits_tile(ch_t, cf[0], lanes) & rows_ok
    Kq = _hits_tile(ch_t, cq[0], lanes) & rows_ok

    keep_f = _keep_masks(kdd, kaa, i0, TH, H, R, L128)
    keep_q = _keep_masks(kdr, kar, i0, TH, H, R, L128)

    gi = li + i0
    ip = gi - m
    cols = lax.broadcasted_iota(jnp.int32, (TH, R), 1)
    d_f = cols - ip
    d_q = (rlen - k - R + 1) + cols - ip     # reversed-q' columns
    Mf = (Kf & keep_f).astype(jnp.int32)
    Mq = (Kq & keep_q).astype(jnp.int32)
    absd_f = jnp.abs(d_f)
    absd_q = jnp.abs(d_q)
    cnt_s[0, :] = cnt_s[0, :] + jnp.sum(Mf, axis=0) + \
        jnp.sum(Mq, axis=0)
    sd_s[0, :] = sd_s[0, :] + jnp.sum(Mf * absd_f, axis=0) + \
        jnp.sum(Mq * absd_q, axis=0)
    if want_w10:
        w10 = Mf * ((ip > 0) & (25 * absd_f < 4 * ip)) + \
            Mq * ((ip > 0) & (25 * absd_q < 4 * ip))
        w10_s[0, :] = w10_s[0, :] + jnp.sum(w10, axis=0)

    @pl.when(t == n_th - 1)
    def _flush():
        mom_out[0, 0, 0] = jnp.sum(cnt_s[0, :] >> 16)
        mom_out[0, 0, 1] = jnp.sum(cnt_s[0, :] & 0xFFFF)
        mom_out[0, 0, 2] = jnp.sum(sd_s[0, :] >> 16)
        mom_out[0, 0, 3] = jnp.sum(sd_s[0, :] & 0xFFFF)
        mom_out[0, 0, 4] = jnp.sum(w10_s[0, :] >> 16)
        mom_out[0, 0, 5] = jnp.sum(w10_s[0, :] & 0xFFFF)
        for i in range(6, 14):
            mom_out[0, 0, i] = 0


@functools.partial(jax.jit,
                   static_argnames=("lanes", "H", "R", "k", "want_w10",
                                    "interpret"))
def moment_pass(ms, rlens, ch, cf, cq, kd_d, ka_a, kd_rc, ka_rc,
                lanes: int, H: int, R: int, k: int,
                want_w10: bool = False, interpret: bool = False):
    """Masked moments -> (B, 14) int32 rows in _moment_block order
    (sel block zeroed; rdd uses rdd_moment_pass instead)."""
    B = ch.shape[0]
    TH, L, L128, W, WSX = _consts(H, R)
    n_th = H // TH
    kern = functools.partial(_moment_kernel, lanes=lanes, TH=TH, H=H,
                             R=R, L128=L128, k=k, n_th=n_th,
                             want_w10=want_w10)
    wide = pl.BlockSpec((1, 1, WSX), lambda b, t, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_th),
            in_specs=[
                pl.BlockSpec((1, lanes, TH), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                wide, wide, wide, wide,
            ],
            out_specs=pl.BlockSpec((1, 1, 14),
                                   lambda b, t, *_: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((1, R), jnp.int32),
                pltpu.VMEM((1, R), jnp.int32),
                pltpu.VMEM((1, R), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, 14), jnp.int32),
        interpret=interpret,
    )(ms, rlens, ch, cf, cq, kd_d, ka_a, kd_rc, ka_rc).reshape(B, 14)


# ---------------------------------------------------------------------------
# pass B2: dual-keep moments (the combined DEL mode)
# ---------------------------------------------------------------------------

def _moment2_kernel(ms, rlens, ch, cf, cq, k1dd, k1aa, k1dr, k1ar,
                    k2dd, k2aa, k2dr, k2ar, mom_out,
                    c1_s, s1_s, c2_s, s2_s, w2_s, *, lanes: int,
                    TH: int, H: int, R: int, L128: int, k: int,
                    n_th: int):
    """Two moment sets over two keep-table pairs in one hits pass:
    block1 = m1b cleaning (no w10), block2 = within-10% cleaning
    (w10) — the DEL validator needs both per read (pyx:1715-1726)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    i0 = t * TH
    m = ms[b]
    rlen = rlens[b]

    @pl.when(t == 0)
    def _init():
        for ref in (c1_s, s1_s, c2_s, s2_s, w2_s):
            ref[:] = jnp.zeros((1, R), jnp.int32)

    ch_t = ch[0]
    li = lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    rows_ok = (li + i0) >= m
    Kf = _hits_tile(ch_t, cf[0], lanes) & rows_ok
    Kq = _hits_tile(ch_t, cq[0], lanes) & rows_ok

    gi = li + i0
    ip = gi - m
    cols = lax.broadcasted_iota(jnp.int32, (TH, R), 1)
    d_f = cols - ip
    d_q = (rlen - k - R + 1) + cols - ip
    absd_f = jnp.abs(d_f)
    absd_q = jnp.abs(d_q)

    k1f = _keep_masks(k1dd, k1aa, i0, TH, H, R, L128)
    k1q = _keep_masks(k1dr, k1ar, i0, TH, H, R, L128)
    M1f = (Kf & k1f).astype(jnp.int32)
    M1q = (Kq & k1q).astype(jnp.int32)
    c1_s[0, :] = c1_s[0, :] + jnp.sum(M1f, axis=0) + \
        jnp.sum(M1q, axis=0)
    s1_s[0, :] = s1_s[0, :] + jnp.sum(M1f * absd_f, axis=0) + \
        jnp.sum(M1q * absd_q, axis=0)

    k2f = _keep_masks(k2dd, k2aa, i0, TH, H, R, L128)
    k2q = _keep_masks(k2dr, k2ar, i0, TH, H, R, L128)
    M2f = (Kf & k2f).astype(jnp.int32)
    M2q = (Kq & k2q).astype(jnp.int32)
    c2_s[0, :] = c2_s[0, :] + jnp.sum(M2f, axis=0) + \
        jnp.sum(M2q, axis=0)
    s2_s[0, :] = s2_s[0, :] + jnp.sum(M2f * absd_f, axis=0) + \
        jnp.sum(M2q * absd_q, axis=0)
    w10 = M2f * ((ip > 0) & (25 * absd_f < 4 * ip)) + \
        M2q * ((ip > 0) & (25 * absd_q < 4 * ip))
    w2_s[0, :] = w2_s[0, :] + jnp.sum(w10, axis=0)

    @pl.when(t == n_th - 1)
    def _flush():
        mom_out[0, 0, 0] = jnp.sum(c1_s[0, :] >> 16)
        mom_out[0, 0, 1] = jnp.sum(c1_s[0, :] & 0xFFFF)
        mom_out[0, 0, 2] = jnp.sum(s1_s[0, :] >> 16)
        mom_out[0, 0, 3] = jnp.sum(s1_s[0, :] & 0xFFFF)
        for i in range(4, 14):
            mom_out[0, 0, i] = 0
        mom_out[0, 0, 14] = jnp.sum(c2_s[0, :] >> 16)
        mom_out[0, 0, 15] = jnp.sum(c2_s[0, :] & 0xFFFF)
        mom_out[0, 0, 16] = jnp.sum(s2_s[0, :] >> 16)
        mom_out[0, 0, 17] = jnp.sum(s2_s[0, :] & 0xFFFF)
        mom_out[0, 0, 18] = jnp.sum(w2_s[0, :] >> 16)
        mom_out[0, 0, 19] = jnp.sum(w2_s[0, :] & 0xFFFF)
        for i in range(20, 28):
            mom_out[0, 0, i] = 0


@functools.partial(jax.jit,
                   static_argnames=("lanes", "H", "R", "k", "interpret"))
def moment2_pass(ms, rlens, ch, cf, cq, t1, t2, lanes: int, H: int,
                 R: int, k: int, interpret: bool = False):
    """t1/t2 = (kd_d, ka_a, kd_rc, ka_rc) table quadruples for the m1b
    and within-10% keep sets; -> (B, 28) int32 moment rows."""
    B = ch.shape[0]
    TH, L, L128, W, WSX = _consts(H, R)
    n_th = H // TH
    kern = functools.partial(_moment2_kernel, lanes=lanes, TH=TH, H=H,
                             R=R, L128=L128, k=k, n_th=n_th)
    wide = pl.BlockSpec((1, 1, WSX), lambda b, t, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_th),
            in_specs=[
                pl.BlockSpec((1, lanes, TH), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes, R), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                wide, wide, wide, wide, wide, wide, wide, wide,
            ],
            out_specs=pl.BlockSpec((1, 1, 28),
                                   lambda b, t, *_: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((1, R), jnp.int32)
                            for _ in range(5)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, 28), jnp.int32),
        interpret=interpret,
    )(ms, rlens, ch, cf, cq, *t1, *t2).reshape(B, 28)


# ---------------------------------------------------------------------------
# assembled row batches
# ---------------------------------------------------------------------------

# rows per inner pallas launch: keeps every kernel's (B_chunk, WSX)
# output block small enough that XLA's scoped-VMEM assignment of the
# custom-call results can never overflow at large batched row counts
# (the batching ladder reaches 256 rows; at WSX~10k that is ~40 MB of
# int32 parts), and bounds Mosaic compiles to one per (H, R, k, pass)
CHUNK = 8


def _chunked(body, haps, reads, rcs, rlens, ms):
    """Pad rows to a CHUNK multiple and lax.map `body` over chunks."""
    B = reads.shape[0]
    pad = (-B) % CHUNK
    if pad:
        haps = jnp.pad(haps, ((0, pad), (0, 0)),
                       constant_values=HAP_PAD)
        reads = jnp.pad(reads, ((0, pad), (0, 0)),
                        constant_values=READ_PAD)
        rcs = jnp.pad(rcs, ((0, pad), (0, 0)), constant_values=READ_PAD)
        rlens = jnp.pad(rlens, (0, pad), constant_values=1)
        ms = jnp.pad(ms, (0, pad))
    n = reads.shape[0] // CHUNK
    out = lax.map(body, (haps.reshape(n, CHUNK, -1),
                         reads.reshape(n, CHUNK, -1),
                         rcs.reshape(n, CHUNK, -1),
                         rlens.reshape(n, CHUNK),
                         ms.reshape(n, CHUNK)))
    return out.reshape(n * CHUNK, -1)[:B]


def _codes_and_hists(haps, reads, rcs, rlens, ms, H, R, k, interpret):
    lanes = _lanes(k)
    ch = pack_codes_host(haps, k, HAP_PAD)
    cf = pack_codes_host(reads, k, READ_PAD)
    # rc codes column-reversed: the kernels work in q' = R-1-q so they
    # never need Mosaic's missing `rev`
    cq = jnp.flip(pack_codes_host(rcs, k, READ_PAD), axis=-1)
    rlens = rlens.astype(jnp.int32)
    ms = ms.astype(jnp.int32)
    parts = hist_pass(ms, rlens, ch, cf, cq, lanes, H, R, k,
                      interpret=interpret)
    hfd, hfa, hrd, hra, sc = parts
    h_d, h_a = _combine_hists(hfd, hfa, hrd, hra, rlens, H, R, k)
    return lanes, ch, cf, cq, rlens, ms, h_d, h_a, sc


def _scal_block(sc):
    n_f, n_r = sc[:, 0], sc[:, 1]
    return jnp.stack([n_f >> 16, n_f & 0xFFFF, n_r >> 16,
                      n_r & 0xFFFF, sc[:, 2], sc[:, 3]], axis=1)


def _m1b_tables(h_d, h_a, rlens, H, R, k):
    from vapor_tpu.engine.fused import kept_table_device
    kd = jax.vmap(lambda h: kept_table_device(h, 10, 10, False))(h_d)
    ka = jax.vmap(lambda h: kept_table_device(h, 10, 10, False))(h_a)
    return _prep_tables(kd, ka, rlens, H, R, k)


def _w10_tables(ms, rlens, ch, cf, cq, h_d, lanes, H, R, k, interpret):
    """kd50 + leftover-anti ka50 prepared tables — the two-stage
    within-10% cleaning."""
    from vapor_tpu.engine.fused import kept_table_device
    kd50 = jax.vmap(lambda h: kept_table_device(h, 10, 50, True))(h_d)
    t = _prep_tables(kd50, kd50, rlens, H, R, k)
    kd_d, _, kd_rc, _ = t
    h_a_left = left_hist_pass(ms, rlens, ch, cf, cq, kd_d, kd_rc,
                              lanes, H, R, k, interpret=interpret)
    ka50 = jax.vmap(lambda h: kept_table_device(h, 10, 50, True))(
        h_a_left)
    full = _prep_tables(kd50, ka50, rlens, H, R, k)
    return full


def _m1b_rows(haps, reads, rcs, rlens, ms, H, R, k, interpret):
    lanes, ch, cf, cq, rlens, ms, h_d, h_a, sc = _codes_and_hists(
        haps, reads, rcs, rlens, ms, H, R, k, interpret)
    kd_d, ka_a, kd_rc, ka_rc = _m1b_tables(h_d, h_a, rlens, H, R, k)
    mom = moment_pass(ms, rlens, ch, cf, cq, kd_d, ka_a, kd_rc, ka_rc,
                      lanes, H, R, k, interpret=interpret)
    return jnp.concatenate([_scal_block(sc), mom], axis=1)


def _w10_rows(haps, reads, rcs, rlens, ms, H, R, k, interpret):
    lanes, ch, cf, cq, rlens, ms, h_d, h_a, sc = _codes_and_hists(
        haps, reads, rcs, rlens, ms, H, R, k, interpret)
    kd_d, ka_a, kd_rc, ka_rc = _w10_tables(ms, rlens, ch, cf, cq, h_d,
                                           lanes, H, R, k, interpret)
    mom = moment_pass(ms, rlens, ch, cf, cq, kd_d, ka_a, kd_rc, ka_rc,
                      lanes, H, R, k, want_w10=True,
                      interpret=interpret)
    return jnp.concatenate([_scal_block(sc), mom], axis=1)


def _del_rows(haps, reads, rcs, rlens, ms, H, R, k, interpret):
    lanes, ch, cf, cq, rlens, ms, h_d, h_a, sc = _codes_and_hists(
        haps, reads, rcs, rlens, ms, H, R, k, interpret)
    t1 = _m1b_tables(h_d, h_a, rlens, H, R, k)
    t2 = _w10_tables(ms, rlens, ch, cf, cq, h_d, lanes, H, R, k,
                     interpret)
    mom = moment2_pass(ms, rlens, ch, cf, cq, t1, t2, lanes, H, R, k,
                       interpret=interpret)
    return jnp.concatenate([_scal_block(sc), mom], axis=1)


def _rdd_rows(haps, reads, rcs, rlens, ms, H, R, k, interpret):
    from vapor_tpu.engine.fused import intercept_z_device
    lanes, ch, cf, cq, rlens, ms, h_d, h_a, sc = _codes_and_hists(
        haps, reads, rcs, rlens, ms, H, R, k, interpret)
    tabs = _m1b_tables(h_d, h_a, rlens, H, R, k)
    h_d_kept = kept_hist_pass(ms, rlens, ch, cf, cq, *tabs, lanes,
                              H, R, k, interpret=interpret)
    found, z_dev = jax.vmap(
        lambda h: intercept_z_device(h, H))(h_d_kept)
    # histogram holds d - m values; shift back only when an intercept
    # was found (ties -> 0, unshifted) — fused._fused_one:521-527
    zs = jnp.where(found, z_dev + 2 * ms, 0).astype(jnp.int32)
    mom = rdd_moment_pass(ms, rlens, zs, ch, cf, cq, *tabs, lanes,
                          H, R, k, interpret=interpret)
    return jnp.concatenate([_scal_block(sc), mom], axis=1)


def _make_batch(rows_fn, doc):
    @functools.partial(jax.jit,
                       static_argnames=("H", "R", "k", "interpret"))
    def batch(haps, reads, rcs, rlens, ms, H: int, R: int, k: int,
              interpret: bool = False):
        return _chunked(
            lambda a: rows_fn(*a, H, R, k, interpret),
            haps, reads, rcs, rlens, ms)
    batch.__doc__ = doc
    return batch


pallas_m1b_batch = _make_batch(_m1b_rows, """\
Packed stats rows for scorer='m1b': 6 scalar + 14 moment int32
columns whose FusedStats decoding matches the XLA engine exactly
(the hi/lo packing differs — per-total instead of per-column — but
reconstructs to the same integers).""")

pallas_w10_batch = _make_batch(_w10_rows, """\
Packed stats rows for scorer='w10' (within-10% two-stage cleaning,
pyx:277-295 semantics).""")

pallas_del_batch = _make_batch(_del_rows, """\
Packed stats rows for scorer='del' (combined m1b + within-10% moment
sets — the DEL validator's per-read pair, pyx:1715-1726).""")

pallas_rdd_batch = _make_batch(_rdd_rows, """\
Packed stats rows for scorer='rdd' (directed redefine-diagonal: m1b
cleaning + intercept re-centering + sel moments, pyx:241-258).""")


PALLAS_BATCHES = {"m1b": pallas_m1b_batch, "w10": pallas_w10_batch,
                  "del": pallas_del_batch, "rdd": pallas_rdd_batch}

# per-(H, R, k, scorer) engine choice: pallas wins most buckets on
# v5e (up to 1.9x) but loses a few by 15-25% — per-bucket VMEM/window
# effects, not predictable from shape arithmetic — so the first use of
# a bucket times both engines once and the verdict is memoized here
# and persisted to disk (survives processes; keyed by device kind).
_CHOICE: dict = {}
# buckets whose pallas kernel FAILED at call time this process (a
# routing verdict of 'xla' is not a failure; forced-pallas A/B runs
# honor only this set, not the table)
_BLACKLIST: set = set()
_TUNE_B = 24          # matches the dominant production ladder size
_TUNE_REPS = 3
# bump when kernel code changes: invalidates persisted autotune
# verdicts (the disk cache key includes this)
ENGINE_VERSION = 3


def _tune_cache_path():
    cache_dir = os.environ.get(
        "VAPOR_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "vapor_tpu_xla"))
    return os.path.join(cache_dir, "pallas_autotune.json")


def _load_tune_cache() -> dict:
    try:
        with open(_tune_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_tune_cache(cache: dict) -> None:
    path = _tune_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, path)           # atomic vs concurrent writers
    except Exception:
        pass


def _dummy_rows(H: int, R: int, B: int):
    """Deterministic timing rows (jit timing is data-independent)."""
    import numpy as np
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    haps = np.full((B, H), HAP_PAD, np.uint8)
    reads = np.full((B, R), READ_PAD, np.uint8)
    n = min(H, R) - 40
    haps[:, :n] = bases[rng.integers(0, 4, (B, n))]
    reads[:, :n] = haps[:, :n]
    return (jnp.asarray(haps), jnp.asarray(reads), jnp.asarray(reads),
            jnp.full((B,), n, jnp.int32), jnp.zeros((B,), jnp.int32))


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _bucket_skey(kind: str, H: int, R: int, k: int, scorer: str) -> str:
    return f"v{ENGINE_VERSION}|{kind}|H{H}|R{R}|k{k}|{scorer}"


@functools.lru_cache(maxsize=4)
def _packaged_table(kind: str) -> dict:
    """Committed autotune verdicts for a device kind (measured once by
    scripts/warmup_autotune.py, shipped in-tree) — the cold-start
    default so production runs never time-probe inline."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "autotune_tables", f"{kind}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def measure_bucket(H: int, R: int, k: int, scorer: str,
                   batch_sizes=(24, 96), reps: int = _TUNE_REPS) -> dict:
    """Time pallas vs XLA for one bucket at the given batch sizes
    (LADDER shapes the batching layer actually emits; B=8 pallas
    compiles have hung the relay, so the default starts at 24) and
    return {'pallas': total_s, 'xla': total_s, 'choice': ...}.  Used by
    the warmup tool — never called from the production scoring path.
    np.asarray is the only honest sync over the axon relay."""
    import time
    import numpy as np

    def run_pallas(args):
        return np.asarray(PALLAS_BATCHES[scorer](
            *args, H=H, R=R, k=k))

    def run_xla(args):
        from vapor_tpu.engine.fused import _fused_batch_jit
        return np.asarray(_fused_batch_jit(
            *args, jnp.int32(k // 10 - 1), H=H, R=R, scorer=scorer)[2])

    totals = {"pallas": 0.0, "xla": 0.0}
    for B in batch_sizes:
        args = _dummy_rows(H, R, B)
        for name, fn in (("pallas", run_pallas), ("xla", run_xla)):
            fn(args)                    # compile + warm
            t = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(args)
                t = min(t, time.perf_counter() - t0)
            totals[name] += t
    totals["choice"] = "pallas" if totals["pallas"] <= totals["xla"] \
        else "xla"
    return totals


def blacklist_bucket(H: int, R: int, k: int, scorer: str,
                     exc: BaseException) -> None:
    """Record a production-time pallas failure for this bucket.  Only
    deterministic compile/lowering/scoped-VMEM failures persist to
    disk; anything else (including bare RESOURCE_EXHAUSTED / Internal
    statuses, which can be transient relay or device errors) pins
    'xla' for this process only."""
    key = (H, R, k, scorer)
    _CHOICE[key] = "xla"
    _BLACKLIST.add(key)
    msg = repr(exc)
    # persist only deterministic compile/lowering failures; broad
    # status strings (RESOURCE_EXHAUSTED, Internal) can be transient
    # relay/device errors and must stay process-local (ADVICE r3)
    if any(s in msg for s in (
            "Mosaic", "mosaic", "vmem exceeded", "scoped vmem",
            "lowering", "Unsupported", "UNIMPLEMENTED")):
        disk = _load_tune_cache()
        disk[_bucket_skey(_device_kind(), H, R, k, scorer)] = "xla"
        _save_tune_cache(disk)


def choose_engine(H: int, R: int, k: int, scorer: str) -> str:
    """'pallas' or 'xla' for this bucket, with NO inline timing probe:
    consult (in order) the in-process memo, the on-disk autotune cache
    (written by scripts/warmup_autotune.py or a previous blacklist),
    and a committed per-device-kind table if one ships.  An unknown
    bucket defaults to 'xla'.  NO table ships for TPU v5e as of r4:
    the interleaved worklist-level A/B (scripts/ab_engines.py ->
    AB_r4.json) measured all-XLA faster than the r3 per-bucket
    pallas table on every latency-matched pass (~600 vs ~385 reads/s)
    — B=24/96 per-bucket micro-probes do not transfer to production
    call mixes, so any future table must be validated by ab_engines
    before committing.  Set VAPOR_TPU_AUTOTUNE=inline to restore the
    round-2 behavior of timing both engines on first encounter
    (costly mid-run)."""
    key = (H, R, k, scorer)
    if key in _CHOICE:
        return _CHOICE[key]
    kind = _device_kind()
    skey = _bucket_skey(kind, H, R, k, scorer)
    disk = _load_tune_cache()
    if skey in disk:
        _CHOICE[key] = disk[skey]
        return disk[skey]
    packaged = _packaged_table(kind)
    if skey in packaged:
        _CHOICE[key] = packaged[skey]
        return packaged[skey]
    if os.environ.get("VAPOR_TPU_AUTOTUNE", "").lower() == "inline":
        try:
            choice = measure_bucket(H, R, k, scorer,
                                    batch_sizes=(_TUNE_B,))["choice"]
            disk = _load_tune_cache()   # re-read: other buckets raced
            disk[skey] = choice
            _save_tune_cache(disk)
        except Exception as e:
            blacklist_bucket(H, R, k, scorer, e)
            choice = "xla"
        _CHOICE[key] = choice
        return choice
    _CHOICE[key] = "xla"
    try:                                # record the miss for warmup
        path = _tune_cache_path() + ".miss"
        seen = set()
        try:
            with open(path) as f:
                seen = {ln.strip() for ln in f}
        except OSError:
            pass
        if skey not in seen:            # dedup: repeated runs would
            with open(path, "a") as f:  # grow the file unboundedly
                f.write(skey + "\n")
    except Exception:
        pass
    return "xla"


def probe_bucket(H: int, R: int, k: int, scorer: str,
                 interpret: bool = False) -> bool:
    """True when this bucket should run on the pallas engine.

    interpret=True (VAPOR_TPU_PALLAS=force on CPU — tests) skips the
    autotune and answers True; otherwise the first call times pallas
    against the XLA engine on this device and the verdict sticks
    (choose_engine)."""
    if interpret:
        return True
    return choose_engine(H, R, k, scorer) == "pallas"
