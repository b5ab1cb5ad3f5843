"""Fused scoring engine v2: one device call per (scorer, haplotype).

Differences from engine.kernel (v1):

* hits are computed in **normal (i, j) coordinates** — the windowed AND
  runs along diagonal shifts (static per window size, `lax.switch` over
  k in {10,20,30,40}), and the reverse-complement side is flipped back
  into dot coordinates so both sides share every downstream stage;
* diagonal / anti-diagonal histograms use a **hierarchical skew-reduce**
  (radix-2 pairwise pad-shift-add pyramid whose buffer width grows only
  as the accumulated shift grows, with an int8/int16/int32 dtype ladder
  — total HBM traffic ~2 passes over the hit matrix, vs ~25 int32
  passes for a fixed-width roll pyramid and vs the reshape trick that
  lowers badly on TPU);
* **gap clustering runs on device** (exact integer 1-D ops), so cluster
  keep-tables never round-trip to the host;
* keep masks come back to normal space via the reverse pyramid
  (`unskew_broadcast`), and all masked moments are elementwise +
  reduction in normal space;
* the within-10% leftover stage and the redefine-diagonal intercept
  (two-level integer binning + weighted median) also run on device.

Only exact integer scalars go to the host, which finishes the float
math in f64 exactly like the oracle.  Parity: tests/test_fused_vs_oracle.
"""
from __future__ import annotations

import functools
import os
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import oracle
from .kernel import (HAP_PAD, READ_PAD, bucket_for, _split_sum)

def _pyramid_radix() -> int:
    """Merge radix for the skew/unskew pyramids, read at TRACE time
    (A/B legs must be separate processes, like VAPOR_TPU_RCDOT).
    Higher radix = fewer sequential rounds (log_g instead of log_2) at
    the cost of a g-way pad+add per round; on v5e the pass is
    op-granularity-bound (PROFILE_r5.json), so fewer rounds win."""
    r = int(os.environ.get("VAPOR_TPU_RADIX", "2"))
    return r if r in (2, 4, 8) else 2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def hist_width(H: int, R: int) -> int:
    # widest index written: col_offset=H plus j-i up to R-1 -> H+R-1
    return _round_up(H + R + 2, 128)


# ---------------------------------------------------------------------------
# hits in normal coordinates
# ---------------------------------------------------------------------------

def _win_and_static(B: jnp.ndarray, k: int) -> jnp.ndarray:
    """AND over k diagonal shifts of B, by doubling (static k)."""
    pows = {}
    cur = B
    step = 1
    pows[1] = B
    while step * 2 <= k:
        cur = cur[:-step, :-step] & cur[step:, step:]
        cur = jnp.pad(cur, ((0, step), (0, step)))
        step *= 2
        pows[step] = cur
    out = None
    shift = 0
    rem = k
    for step in sorted(pows, reverse=True):
        if step <= rem:
            part = pows[step]
            moved = jnp.pad(part[shift:, shift:],
                            ((0, shift), (0, shift))) if shift else part
            out = moved if out is None else (out & moved)
            shift += step
            rem -= step
    return out


def _hits_normal(hap: jnp.ndarray, read: jnp.ndarray, k_idx: jnp.ndarray,
                 m: jnp.ndarray) -> jnp.ndarray:
    """K[i, j] = 1 iff hap[i:i+k] == read[j:j+k], i >= m (k = 10·(idx+1))."""
    B = (hap[:, None] == read[None, :]) & (
        jax.lax.broadcasted_iota(jnp.int32, (hap.shape[0], 1), 0) >= m)
    return lax.switch(k_idx, [
        lambda b: _win_and_static(b, 10),
        lambda b: _win_and_static(b, 20),
        lambda b: _win_and_static(b, 30),
        lambda b: _win_and_static(b, 40),
    ], B)


# MXU hit detection: K[i, j] = [#matching bases over the k-window == k].
# The window match count is one bf16 matmul of one-hot encodings —
# A[i, t*V+v] = [hap[i+t] == vocab_v] against the same for the read —
# exact because counts <= 40 are integers in f32 accumulation.  The
# vocabulary covers every code the CLI paths can produce (key_modify
# collapses IUPAC to N/n, pyx:908); codes outside it (pads, the
# complement sentinel, the INS 'X' placeholder) one-hot to zero rows
# and therefore never match — identical to the equality-based kernel,
# which also never matches them against any read code.  Backends check
# sequences against _VOCAB_OK and fall back to the oracle otherwise.
_VOCAB = np.frombuffer(b"ACGTNacgtn", dtype=np.uint8)
_VOCAB_LUT = np.full(256, 127, dtype=np.int8)
for _i, _c in enumerate(_VOCAB):
    _VOCAB_LUT[_c] = _i
_V = len(_VOCAB)
_VOCAB_OK = np.zeros(256, dtype=bool)
_VOCAB_OK[_VOCAB] = True
for _c in b"Xx=":          # never-matching on either engine
    _VOCAB_OK[_c] = True
_VOCAB_OK[HAP_PAD] = _VOCAB_OK[READ_PAD] = _VOCAB_OK[0xFE] = True


def _onehot_windows(seq: jnp.ndarray, k: int) -> jnp.ndarray:
    """(L,) uint8 codes -> (L, k*V) bf16 windowed one-hot."""
    L = seq.shape[0]
    v = jnp.asarray(_VOCAB_LUT)[jnp.pad(seq, (0, k),
                                        constant_values=HAP_PAD)]
    base = (v[:, None] == jnp.arange(_V, dtype=jnp.int8)[None, :])
    cols = [lax.slice_in_dim(base, t, t + L, axis=0) for t in range(k)]
    return jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)


def _hits_mxu(hap: jnp.ndarray, read: jnp.ndarray, k_idx: jnp.ndarray,
              m: jnp.ndarray) -> jnp.ndarray:
    """MXU version of _hits_normal (bit-identical output)."""
    def one(k):
        def f(hap, read):
            A = _onehot_windows(hap, k)
            Bm = _onehot_windows(read, k)
            M = lax.dot_general(A, Bm, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            rows_ok = jax.lax.broadcasted_iota(
                jnp.int32, (hap.shape[0], 1), 0) >= m
            return (M == np.float32(k)) & rows_ok
        return f
    return lax.switch(k_idx, [one(10), one(20), one(30), one(40)],
                      hap, read)


# Packed-code hit detection: the k-mer at position i is identified by
# ceil(k/8) uint32 "lane" codes (8 symbols x 4 bits per lane), built by
# 1-D shift-or over the sequence; K[i, j] is then an AND of ~2-5 lane
# equality compares — one elementwise pass over the (H, R) matrix, no
# f32 matmul output and no k-deep shift-AND.  Injective on the 16 byte
# values the backends admit (_VOCAB_OK: ACGTNacgtn, X/x/=, the three
# pads), and windows running past a sequence end pick up side-specific
# pad nibbles, so cross-side matches there are impossible — exactly
# _hits_normal's zero-padded semantics (tests/test_fused_vs_oracle.py).
_NIB_BYTES = bytes(_VOCAB) + b"Xx=" + bytes([HAP_PAD, READ_PAD, 0xFE])
_NIB_LUT = np.full(256, 15, dtype=np.int32)
for _i, _c in enumerate(_NIB_BYTES):
    _NIB_LUT[_c] = _i


def _pack_codes(seq: jnp.ndarray, k: int, pad_byte: int) -> jnp.ndarray:
    """(L,) uint8 -> (lanes, L) uint32 rolling 4-bit-packed k-mer codes.

    Lane l packs window symbols [8l, min(8l+8, k)); positions whose
    window runs past the end pack pad nibbles (side-specific)."""
    L = seq.shape[0]
    lanes = -(-k // 8)
    nib = jnp.asarray(_NIB_LUT, dtype=jnp.uint32)[seq]
    ext = jnp.concatenate([nib, jnp.full((8 * lanes,),
                                         int(_NIB_LUT[pad_byte]),
                                         jnp.uint32)])
    out = []
    for lane in range(lanes):
        acc = jnp.zeros((L,), jnp.uint32)
        for t in range(min(8, k - 8 * lane)):
            s = 8 * lane + t
            acc = acc | (lax.slice_in_dim(ext, s, s + L)
                         << jnp.uint32(4 * t))
        out.append(acc)
    return jnp.stack(out)


def _hits_packed(hap: jnp.ndarray, read: jnp.ndarray, k_idx: jnp.ndarray,
                 m: jnp.ndarray) -> jnp.ndarray:
    """Packed-code version of _hits_normal (bit-identical output)."""
    def one(k):
        def f(hap, read):
            ch = _pack_codes(hap, k, HAP_PAD)
            cr = _pack_codes(read, k, READ_PAD)
            K = ch[0][:, None] == cr[0][None, :]
            for lane in range(1, ch.shape[0]):
                K = K & (ch[lane][:, None] == cr[lane][None, :])
            rows_ok = jax.lax.broadcasted_iota(
                jnp.int32, (hap.shape[0], 1), 0) >= m
            return K & rows_ok
        return f
    return lax.switch(k_idx, [one(10), one(20), one(30), one(40)],
                      hap, read)


def _flip_to_dot_space(Kq: jnp.ndarray, rlen: jnp.ndarray,
                       k: jnp.ndarray) -> jnp.ndarray:
    """Map reverse-complement hits (i, q) -> dot coordinates (i, j):
    j = rlen - k - q.  Wrapped-in columns are masked off."""
    H, R = Kq.shape
    flipped = jnp.flip(Kq, axis=1)          # (i, R-1-q)
    two = jnp.concatenate([flipped, flipped], axis=1)
    shift = (R - 1) - (rlen - k)            # j = (R-1-q) - shift
    rolled = lax.dynamic_slice(two, (0, shift), (H, R))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    return rolled & (cols <= rlen - k)


def _rc_dot_codes(rc: jnp.ndarray, rlen: jnp.ndarray,
                  k: int) -> jnp.ndarray:
    """(R,) rc row -> (lanes, R) lane codes D with D[l, j] = packed rc
    k-mer at q = rlen - k - j, i.e. already indexed by the DOT-space
    column j.  Comparing hap lane codes against D yields the
    reverse-strand hit matrix directly in dot coordinates, replacing
    _flip_to_dot_space's flip + concat + dynamic_slice over the full
    (H, R) matrix (lane-crossing relayouts XLA lowers poorly on TPU —
    the on-chip profile PROFILE_r5.json showed the hits stage at ~3%
    of VPU throughput with these 2-D shuffles attached) with the same
    1-D transform on an (R,)-length code row.

    Derivation: with rev[p] = crc[R-1-p], crc[rlen-k-j] =
    rev[(R-1+k-rlen) + j]; columns j > rlen - k (and the clamped
    slice when rlen < k) carry garbage and are masked by the caller's
    j <= rlen - k test, exactly like _flip_to_dot_space's column
    mask."""
    R = rc.shape[0]
    crc = _pack_codes(rc, k, READ_PAD)          # (lanes, R), q-indexed
    rev = jnp.flip(crc, axis=1)
    ext = jnp.concatenate([rev, rev], axis=1)
    off = (R - 1 + k) - rlen
    return lax.dynamic_slice(ext, (jnp.int32(0), off),
                             (crc.shape[0], R))


def _hits_packed_rc_dot(hap: jnp.ndarray, rc: jnp.ndarray,
                        rlen: jnp.ndarray, k_idx: jnp.ndarray,
                        m: jnp.ndarray) -> jnp.ndarray:
    """Reverse-strand hits directly in dot space: bit-identical to
    _flip_to_dot_space(_hits_packed(hap, rc, ...), rlen, k) for ANY
    rc row laid out as codes followed by READ_PAD tail (the only
    layout both the host and device rc builders produce) — pinned by
    tests/test_fused_vs_oracle.py / test_kernel_vs_oracle.py."""
    H = hap.shape[0]
    R = rc.shape[0]

    def one(k):
        def f(hap, rc, rlen):
            ch = _pack_codes(hap, k, HAP_PAD)
            D = _rc_dot_codes(rc, rlen, k)
            K = ch[0][:, None] == D[0][None, :]
            for lane in range(1, ch.shape[0]):
                K = K & (ch[lane][:, None] == D[lane][None, :])
            rows_ok = jax.lax.broadcasted_iota(
                jnp.int32, (H, 1), 0) >= m
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
            return K & rows_ok & (cols <= rlen - k)
        return f
    return lax.switch(k_idx, [one(10), one(20), one(30), one(40)],
                      hap, rc, rlen)


# hit-detection implementation selector (probes/tests flip this; the
# jit cache keys on the function identity via HITS_IMPL's closure use)
_HITS_IMPLS = {"packed": _hits_packed, "mxu": _hits_mxu,
               "normal": _hits_normal}
HITS_IMPL = "packed"


# ---------------------------------------------------------------------------
# relay-payload compression (host -> device)
# ---------------------------------------------------------------------------
# The axon relay uploads at ~25 MB/s, so host->device payload bytes are
# first-order in the engine pass time (PERF_NOTES r4 finding 4).  Two
# measured levers, both applied at the dispatch boundary so every
# engine route (single-device XLA / dp mesh) is untouched:
#
# * haplotype rows are shipped as UNIQUE rows + a per-row int32 index
#   and gathered on device (a flush used to upload B broadcast copies
#   of each event's haplotype — ~40 ms of a 370 ms pass);
# * sequence codes are nibble-packed 2/byte: the engine alphabet is
#   exactly the 16 bytes of _NIB_BYTES (backends vocab-check against
#   _VOCAB_OK = the same set before dispatching), so the host packs
#   with _NIB_LUT and the device unpacks through the inverse LUT —
#   byte-exact roundtrip, half the fw/hap payload (~25 ms).
#
# Packing is by HALVES, not interleave: byte j of the packed row holds
# code j (low nibble) and code j + L/2 (high nibble), so the device
# unpack is a concat of two full-width slices — no minor-dim
# interleave relayout (reshape-based shuffles lower poorly via axon).

_NIB_INV = np.frombuffer(_NIB_BYTES, dtype=np.uint8)
_NIB_LUT_U8 = _NIB_LUT.astype(np.uint8)


def pack_nibbles(rows: np.ndarray) -> np.ndarray:
    """(B, L) uint8 engine codes -> (B, L//2) halves-packed nibbles.

    Callers must guarantee every byte is in the 16-byte engine
    alphabet (_VOCAB_OK); anything else would silently decode to the
    0xFE sentinel."""
    nib = _NIB_LUT_U8[rows]
    L2 = rows.shape[1] // 2
    return nib[:, :L2] | (nib[:, L2:] << np.uint8(4))


def _unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """Device inverse of pack_nibbles: (B, L//2) -> (B, L) codes."""
    lo = packed & np.uint8(0xF)
    hi = packed >> np.uint8(4)
    return jnp.asarray(_NIB_INV)[jnp.concatenate([lo, hi], axis=1)]


def uniq_cap(P: int) -> int:
    """Unique-hap slots per flush of P rows (one reserved for the
    all-HAP_PAD pad row).  A pure function of P so the _expand_rows
    compile key stays (H, R, P) — the same granularity warm_ladder
    already covers.  Flushes with more distinct haplotypes than this
    (only possible when most requests carry 1-2 reads) fall back to
    the plain broadcast upload."""
    return min(P, 32) + 1


@jax.jit
def _expand_rows(uniq_packed, idx, fw_packed):
    """Unpack one flush's compressed payload on device:
    (U, H/2) unique hap nibbles + (P,) row->hap index + (P, R/2) fw
    nibbles -> ((P, H) hap codes, (P, R) read codes)."""
    haps = jnp.take(_unpack_nibbles(uniq_packed), idx, axis=0)
    return haps, _unpack_nibbles(fw_packed)


@jax.jit
def _derive_rc_batch(reads, rlens):
    return jax.vmap(_derive_rc_row)(reads, rlens)


def _derive_rc_row(read: jnp.ndarray, rlen: jnp.ndarray) -> jnp.ndarray:
    """Reverse-complement code row derived ON DEVICE from the forward
    row — bit-identical to the host's encode_comp(seq)[::-1] + pad
    (oracle.encode_comp is a pure code-level LUT).  Hosts used to
    upload both strands; the relay moves ~25 MB/s, so shipping fw only
    halves the dominant host->device payload.  The padded tail maps
    through the LUT to the 0xFE never-matches sentinel and is sliced
    away, so the result equals the host row byte for byte."""
    R = read.shape[0]
    comp = jnp.asarray(oracle._COMP_LUT)[read]
    ext = jnp.concatenate([jnp.flip(comp),
                           jnp.full((R,), READ_PAD, jnp.uint8)])
    return lax.dynamic_slice(ext, (R - rlen,), (R,))


# ---------------------------------------------------------------------------
# hierarchical skew-reduce / unskew-broadcast
# ---------------------------------------------------------------------------

def _merge_dtype(block: int, per_cell: int):
    """Narrowest signed int that holds `per_cell * block` exactly."""
    bound = per_cell * block
    if bound <= 127:
        return jnp.int8
    if bound <= 32767:
        return jnp.int16
    return jnp.int32


def skew_reduce(K: jnp.ndarray, W: int, sign: int, col_offset: int,
                per_cell: int = 2) -> jnp.ndarray:
    """Histogram over c = col_offset + j + sign*i of a (H, R) matrix
    whose cells are bounded by `per_cell`.

    Radix-2 contiguous-halves pyramid: merge the top and bottom row
    halves with a relative pad-shift of n/2 columns.  The buffer widens
    only as shifts accumulate and the accumulator dtype widens with the
    value bound, so total HBM traffic is ~2-4x the int8 hit matrix
    instead of log(H) passes over a fixed (H, W) int32 buffer.
    (Contiguous halves beat interleaved even/odd pairing ~2x on v5e —
    strided row slices lower poorly.)

    Invariant: after reducing to n rows with accumulated left pad p,
    X[r, c] = sum over rows a = r (mod n) of K[a, j] with
    c = j + sign*(a - r) + p  (p grows only for sign=-1).
    """
    H, R = K.shape
    X = K if K.dtype == jnp.int8 else K.astype(jnp.int8)
    radix = _pyramid_radix()
    p = 0
    merged = 1
    while X.shape[0] > 1:
        rows = X.shape[0]
        g = min(radix, 1 << (rows - 1).bit_length())
        if rows % g:
            X = jnp.pad(X, ((0, g - rows % g), (0, 0)))
        n2 = X.shape[0] // g
        merged *= g
        dt = _merge_dtype(merged, per_cell)
        parts = [X[t * n2:(t + 1) * n2].astype(dt) for t in range(g)]
        if sign > 0:
            # block t (rows a = r + t*n2 mod old n) shifts right t*n2
            X = sum(jnp.pad(parts[t], ((0, 0), (t * n2, (g - 1 - t) * n2)))
                    for t in range(g))
        else:
            # top blocks shift right most: c = j - (a - r) + p grows
            X = sum(jnp.pad(parts[t],
                            ((0, 0), ((g - 1 - t) * n2, t * n2)))
                    for t in range(g))
            p += (g - 1) * n2
    row = X[0].astype(jnp.int32)
    out = jnp.zeros((W,), jnp.int32)
    if sign > 0:
        # row[c] = hist at value c: place at col_offset
        return lax.dynamic_update_slice(
            out, row[: W - col_offset], (col_offset,))
    # row[c] = hist at value c - p; values >= -(H-1) start at c = p-(H-1)
    lo = p - (H - 1)
    seg = row[lo: lo + min(H + R - 1, W - (col_offset - H + 1))]
    return lax.dynamic_update_slice(out, seg, (col_offset - H + 1,))


def unskew_broadcast(table: jnp.ndarray, H: int, sign: int,
                     col_offset: int, R: int) -> jnp.ndarray:
    """Mat[i, j] = table[col_offset + j + sign*i] — top-down radix-2
    splitting.  Each level doubles the rows and halves the covered
    i-span; the slice width shrinks toward R, so total traffic is ~2x
    the (H, R) output in the table's dtype (use bool tables!)."""
    W = table.shape[0]
    S = 1
    while S < H:
        S *= 2
    # pad so every slice below is in range
    tp = jnp.concatenate([jnp.zeros((S,), table.dtype), table,
                          jnp.zeros((2 * S,), table.dtype)])
    if sign > 0:
        # level-0 row covers i in [0, S): indices [off, off + R+S-1)
        Y = tp[None, S + col_offset: S + col_offset + R + S - 1]
    else:
        # Y[t, c] = table[off - (t+1)s + 1 + c]
        Y = tp[None, S + col_offset - S + 1:
               S + col_offset - S + 1 + R + S - 1]
    radix = _pyramid_radix()
    s = S
    while s > 1:
        g = min(radix, s)
        sp = s // g
        Wn = R + sp - 1
        # child t covers i in [i0 + t*sp, i0 + (t+1)*sp): its slice
        # starts at t*sp (sign>0) / (g-1-t)*sp (sign<0) of the parent
        if sign > 0:
            cs = [Y[:, t * sp: t * sp + Wn] for t in range(g)]
        else:
            cs = [Y[:, (g - 1 - t) * sp: (g - 1 - t) * sp + Wn]
                  for t in range(g)]
        Y = jnp.stack(cs, axis=1).reshape(-1, Wn)
        s = sp
    return Y[:H]


# ---------------------------------------------------------------------------
# on-device gap clustering (exact, pyx:551-580 semantics)
# ---------------------------------------------------------------------------

def kept_table_device(h: jnp.ndarray, gap: int, thr: int,
                      fallback_max: bool) -> jnp.ndarray:
    """Bool keep-table over histogram buckets: clusters of present
    values (gap < `gap` merges), kept when weighted total > thr, else —
    with fallback — when total equals the maximum."""
    W = h.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (W,), 0)
    nz = h > 0
    prev_nz = lax.cummax(jnp.where(nz, idx, -1))
    prev_excl = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                 prev_nz[:-1]])
    is_start = nz & ((idx - prev_excl >= gap) | (prev_excl < 0))
    cum = jnp.cumsum(h)
    cum_before = lax.cummax(jnp.where(
        is_start, jnp.concatenate([jnp.zeros((1,), h.dtype),
                                   cum[:-1]]), -1))
    running = cum - cum_before
    # segment end = (next start) - 1, else last index
    BIG = jnp.int32(W + 1)
    nxt = jnp.flip(lax.cummin(jnp.flip(
        jnp.where(is_start, idx, BIG))))
    nxt_excl = jnp.concatenate([nxt[1:], jnp.full((1,), BIG, jnp.int32)])
    seg_end = jnp.minimum(nxt_excl - 1, W - 1)
    seg_total = running[seg_end]
    kept = nz & (seg_total > thr)
    if fallback_max:
        # segment representatives are the start buckets (an end bucket
        # can be a trailing zero when the segment runs to the boundary)
        max_total = jnp.max(jnp.where(is_start, seg_total, 0))
        fallback = nz & (seg_total == max_total)
        kept = jnp.where(jnp.any(nz & (seg_total > thr)), kept, fallback)
    return kept


# ---------------------------------------------------------------------------
# on-device most-abundant-intercept (pyx:582-591, exact integers)
# ---------------------------------------------------------------------------

def intercept_z_device(h: jnp.ndarray, col_offset: int) -> jnp.ndarray:
    """2x the re-centering intercept from a d-histogram (int32).

    Two-level 10-bin histogram mode + weighted median, all in exact
    integer arithmetic (bin test: 10(v-lo) >= t(hi-lo)).
    Buckets hold values v = index - col_offset.
    """
    W = h.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (W,), 0)
    v = idx - col_offset
    nz = h > 0
    total = h.sum()
    lo = jnp.min(jnp.where(nz, v, 2 ** 30))
    hi = jnp.max(jnp.where(nz, v, -(2 ** 30)))

    def bin_of(vals, lo_, hi_):
        t = jnp.arange(1, 11, dtype=jnp.int32)
        return (10 * (vals[:, None] - lo_) >=
                t[None, :] * (hi_ - lo_)).sum(axis=1)

    b1 = bin_of(v, lo, hi)
    counts1 = jnp.zeros((11,), h.dtype).at[b1].add(jnp.where(nz, h, 0))
    max1 = counts1.max()
    win1 = counts1 == max1

    def sub_stats(t):
        in_bin = nz & (b1 == t)
        s_lo = jnp.min(jnp.where(in_bin, v, 2 ** 30))
        s_hi = jnp.max(jnp.where(in_bin, v, -(2 ** 30)))
        b2 = bin_of(v, s_lo, s_hi)
        counts2 = jnp.zeros((11,), h.dtype).at[b2].add(
            jnp.where(in_bin, h, 0))
        m2 = counts2.max()
        n_win2 = (counts2 == m2).sum()
        # weighted median of the winning sub-bin (if unique)
        wb = jnp.argmax(counts2 == m2)
        sel = in_bin & (b2 == wb)
        hsel = jnp.where(sel, h, 0)
        n = hsel.sum()
        cums = jnp.cumsum(hsel)
        k1 = (n - 1) // 2 + 1
        k2 = n // 2 + 1
        v1 = jnp.min(jnp.where(cums >= k1, v, 2 ** 30))
        v2 = jnp.min(jnp.where(cums >= k2, v, 2 ** 30))
        return n_win2, v1 + v2

    n_wins, medians2 = jax.vmap(sub_stats)(jnp.arange(11))
    n_wins = jnp.where(win1, n_wins, 0)
    total_winners = n_wins.sum()
    # z = 2*median of the single winning sub-bin; ties -> no intercept
    pick = jnp.argmax(jnp.where(win1, n_wins, 0) > 0)
    found = (total > 0) & (total_winners == 1)
    z = jnp.where(found, medians2[pick], 0)
    return found, z


# ---------------------------------------------------------------------------
# fused per-(read, hap) statistics
# ---------------------------------------------------------------------------

def _moment_block(Ksum, keep, ip, d, z, want_w10, want_sel):
    """Moment sums over the masked dot matrix.  Both strands share
    every weight (d is the same for forward and flipped-reverse dots),
    and the per-strand sums are added in the packed row anyway, so one
    pass over Ksum = Kf + Kr replaces two passes over the strands —
    each cell contributes its multiplicity in {0, 1, 2}."""
    zero = jnp.int32(0)
    M = jnp.where(keep, Ksum, 0).astype(jnp.int32)
    absd = jnp.abs(d)
    cnt = _split_sum(M.sum(axis=0))
    sd = _split_sum((M * absd).sum(axis=0))
    if want_w10:
        w10 = _split_sum((M * ((ip > 0) & (25 * absd < 4 * ip))
                          ).sum(axis=0))
    else:
        w10 = (zero, zero)
    if want_sel:
        num = jnp.abs(z - 2 * d)
        den = jnp.abs(2 * ip + z)
        den = jnp.where(2 * ip + z == 0,
                        jnp.abs(2 * ip + z + 2), den)
        sel = M * (10 * num > den)
        sel_cnt = _split_sum(sel.sum(axis=0))
        val = z - 2 * d
        pv = jnp.maximum(val, 0)
        nv = jnp.maximum(-val, 0)
        pos_hi = (sel * (pv >> 16)).sum()
        pos_lo = _split_sum((sel * (pv & 0xFFFF)).sum(axis=0))
        neg_hi = (sel * (nv >> 16)).sum()
        neg_lo = _split_sum((sel * (nv & 0xFFFF)).sum(axis=0))
    else:
        sel_cnt = (zero, zero)
        pos_hi, pos_lo = zero, (zero, zero)
        neg_hi, neg_lo = zero, (zero, zero)
    return jnp.stack([
        cnt[0], cnt[1], sd[0], sd[1], w10[0], w10[1],
        sel_cnt[0], sel_cnt[1], pos_hi, pos_lo[0], pos_lo[1],
        neg_hi, neg_lo[0], neg_lo[1]])


def _fused_one(hap, read, rc, rlen, m, k_idx, H: int, R: int,
               scorer: str):
    """Everything for one (read, hap): gates, cleaning, moments."""
    W = hist_width(H, R)
    k = 10 * (k_idx + 1)
    # Packed-code hits everywhere: ~3 VPU ops/cell in one elementwise
    # pass, vs the one-hot MXU matmul (f32 (H, R) output) or the k-deep
    # shift-AND.  All three are bit-identical (test_fused_vs_oracle);
    # measured v5e marginal cost/row at H=R=3072: packed 0.09 ms vs
    # MXU 0.22 ms (hits stage), and the f32 matmul output was the
    # pipeline's largest HBM write.
    hits = _HITS_IMPLS[HITS_IMPL]
    Kf = hits(hap, read, k_idx, m)
    if HITS_IMPL == "packed" and \
            os.environ.get("VAPOR_TPU_RCDOT", "1") != "0":
        # reverse-strand hits computed directly in dot space (the
        # flip/roll folds into the 1-D packed code row; the (H, R)
        # relayout is gone) — read at TRACE time, so A/B runs flip
        # the env before first compile (scripts/ab_rcdot.py)
        Kr = _hits_packed_rc_dot(hap, rc, rlen, k_idx, m)
    else:
        Kr = _flip_to_dot_space(hits(hap, rc, k_idx, m), rlen, k)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, R), 1)
    ip = rows - m
    d = cols - ip                     # j - i'
    Kboth = Kf | Kr

    # gates
    n_f = _split_sum(Kf.sum(axis=0, dtype=jnp.int32))
    n_r = _split_sum(Kr.sum(axis=0, dtype=jnp.int32))
    any_row = Kboth.sum(axis=1, dtype=jnp.int32) > 0
    ridx = jax.lax.broadcasted_iota(jnp.int32, (H,), 0)
    i_min = jnp.min(jnp.where(any_row, ridx, H + 1))
    i_max = jnp.max(jnp.where(any_row, ridx, -1))
    scalars = jnp.stack([n_f[0], n_f[1], n_r[0], n_r[1], i_min, i_max])

    # histograms over c_d = j + H - i  and  c_a = j + i
    # (shift-invariant clustering: the m offset cancels inside clusters)
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = skew_reduce(Ksum, W, -1, H)
    h_a = skew_reduce(Ksum, W, +1, 0)

    z = jnp.int32(0)
    if scorer == "del":
        # combined DEL mode: both the m1b and within-10% cleanings +
        # moment sets in one pass over the hit matrices (the DEL
        # validator needs both scorers per read, pyx:1715-1726)
        kd = kept_table_device(h_d, 10, 10, False)
        ka = kept_table_device(h_a, 10, 10, False)
        keep_m1b = unskew_broadcast(kd, H, -1, H, R) | \
            unskew_broadcast(ka, H, +1, 0, R)
        kd50 = kept_table_device(h_d, 10, 50, True)
        not_kept = ~unskew_broadcast(kd50, H, -1, H, R)
        h_a_left = skew_reduce(Ksum * not_kept.astype(jnp.int8),
                               W, +1, 0)
        ka50 = kept_table_device(h_a_left, 10, 50, True)
        keep_w10 = (~not_kept) | unskew_broadcast(ka50, H, +1, 0, R)
        mom = jnp.concatenate([
            _moment_block(Ksum, keep_m1b, ip, d, z,
                          want_w10=False, want_sel=False),
            _moment_block(Ksum, keep_w10, ip, d, z,
                          want_w10=True, want_sel=False)])
        return h_d, h_a, scalars, mom
    if scorer in ("m1b", "rdd"):
        kd = kept_table_device(h_d, 10, 10, False)
        ka = kept_table_device(h_a, 10, 10, False)
        keep = unskew_broadcast(kd, H, -1, H, R) | \
            unskew_broadcast(ka, H, +1, 0, R)
        if scorer == "rdd":
            h_d_kept = skew_reduce(Ksum * keep.astype(jnp.int8),
                                   W, -1, H)
            # the histogram holds d - m values; shift the median back
            # only when one was found (ties mean intercept 0, unshifted)
            found, z_dev = intercept_z_device(h_d_kept, H)
            z = jnp.where(found, z_dev + 2 * m, 0)
    elif scorer == "w10":
        kd50 = kept_table_device(h_d, 10, 50, True)
        not_kept = ~unskew_broadcast(kd50, H, -1, H, R)
        h_a_left = skew_reduce(Ksum * not_kept.astype(jnp.int8),
                               W, +1, 0)
        ka50 = kept_table_device(h_a_left, 10, 50, True)
        keep = (~not_kept) | unskew_broadcast(ka50, H, +1, 0, R)
    else:
        keep = jnp.ones((H, R), jnp.bool_)

    mom = _moment_block(Ksum, keep, ip, d, z,
                        want_w10=(scorer == "w10"),
                        want_sel=(scorer == "rdd"))
    return h_d, h_a, scalars, mom


def _vmap_width(H: int, R: int) -> int:
    """Reads processed per device step.  Measured on v5e (full m1b
    pipeline, realistic dot density): width 8 wins at every bucket
    from 1024 to 8192 — narrower chunks underfill the VPU (w2 is 2.6x
    slower at 3072) and wider ones don't help."""
    return 8


def _chunked_rows(haps, reads, rcs, rlens, ms, k_idx, H: int, R: int,
                  scorer: str, width: int) -> jnp.ndarray:
    """Packed per-row stats for a row count divisible by `width`
    (scalars ++ moments, one int32 row per (read, hap) pair).  Shared
    by the single-device jit and the shard_map per-device body — the
    multi-chip path runs byte-identical per-row computation.
    rcs=None derives the reverse-complement rows on device
    (_derive_rc_row) so hosts ship the forward strand only."""
    n_chunks = reads.shape[0] // width

    def one(hap, read, rc, rlen, m):
        if rc is None:
            rc = _derive_rc_row(read, rlen)
        _h_d, _h_a, scalars, mom = _fused_one(hap, read, rc, rlen, m,
                                              k_idx, H, R, scorer)
        return jnp.concatenate([scalars, mom])

    if rcs is None:
        def chunk(args):
            h, r, rl, m = args
            return jax.vmap(lambda hh, rr, ll, mm:
                            one(hh, rr, None, ll, mm))(h, r, rl, m)
        out = lax.map(chunk, (haps.reshape(n_chunks, width, -1),
                              reads.reshape(n_chunks, width, -1),
                              rlens.reshape(n_chunks, width),
                              ms.reshape(n_chunks, width)))
    else:
        def chunk(args):
            return jax.vmap(one)(*args)
        out = lax.map(chunk, (haps.reshape(n_chunks, width, -1),
                              reads.reshape(n_chunks, width, -1),
                              rcs.reshape(n_chunks, width, -1),
                              rlens.reshape(n_chunks, width),
                              ms.reshape(n_chunks, width)))
    return out.reshape(n_chunks * width, -1)


def fused_batch(haps, reads, rcs, rlens, ms, k_idx, H: int, R: int,
                scorer: str, want_hists: bool = False):
    """Batched per-(read, hap) stats — the production scoring entry.

    When more than one device is visible (a TPU slice, or the 8-virtual-
    device CPU mesh in tests) the work rows are sharded across a `dp`
    mesh (parallel.mesh.maybe_mesh_rows) — the same code path the
    driver's dryrun_multichip exercises; single-device falls through
    to the jitted XLA launch below, the production engine for every
    bucket.  Per-row math is integer-exact across meshings: packed
    rows are bit-identical (tests/test_mesh_parity.py).  (A
    full-fusion Mosaic engine lives in experiments/pallas_fused.py;
    it lost the interleaved worklist-level A/B on every latency-
    matched pass — AB_r4.json, ~600 vs ~385 reads/s — and the on-chip
    stage profile PROFILE_r5.json shows the pass is op-granularity-
    bound far below every roofline, so it was demoted from the hot
    path in round 5.)"""
    if not want_hists:
        from ..parallel.mesh import maybe_mesh_rows
        packed = maybe_mesh_rows(haps, reads, rcs, rlens, ms, k_idx,
                                 H, R, scorer,
                                 width=min(_vmap_width(H, R),
                                           reads.shape[0]))
        if packed is not None:
            return None, None, packed
    # normalize here, not in callers: a python-int k_idx keeps the
    # mesh routing above fetch-free, while the jit still sees the
    # same strong-typed int32 scalar aval (no recompiles)
    return _fused_batch_jit(haps, reads, rcs, rlens, ms,
                            jnp.int32(k_idx),
                            H=H, R=R, scorer=scorer,
                            want_hists=want_hists)


@functools.partial(jax.jit, static_argnames=("H", "R", "scorer",
                                             "want_hists"))
def _fused_batch_jit(haps, reads, rcs, rlens, ms, k_idx, H: int, R: int,
                     scorer: str, want_hists: bool = False):
    """haps is (B, H): each work row carries its own haplotype, so one
    device call can span several events (cross-event batching).  k_idx
    stays a scalar — vmapping it would make the window lax.switch
    execute all four branches per read.

    want_hists=False drops the per-read (B, W) bucket histograms from
    the outputs: materializing them costs ~4x the whole scoring
    pipeline (measured v5e: 0.71 -> 2.77 ms/row at H=R=3072 — the
    vmapped dynamic_update_slice placements can't stay fused once they
    become kernel outputs), and no scoring path reads them."""
    B = reads.shape[0]
    width = min(_vmap_width(H, R), B)
    pad = (-B) % width
    if pad:
        haps = jnp.pad(haps, ((0, pad), (0, 0)),
                       constant_values=HAP_PAD)
        reads = jnp.pad(reads, ((0, pad), (0, 0)),
                        constant_values=READ_PAD)
        if rcs is not None:
            rcs = jnp.pad(rcs, ((0, pad), (0, 0)),
                          constant_values=READ_PAD)
        rlens = jnp.pad(rlens, (0, pad), constant_values=1)
        ms = jnp.pad(ms, (0, pad))
    n_chunks = reads.shape[0] // width

    def one(hap, read, rc, rlen, m):
        if rc is None:
            rc = _derive_rc_row(read, rlen)
        h_d, h_a, scalars, mom = _fused_one(hap, read, rc, rlen, m,
                                            k_idx, H, R, scorer)
        if not want_hists:
            return scalars, mom
        return h_d, h_a, scalars, mom

    if rcs is None:
        def chunk(args):
            h, r, rl, m = args
            return jax.vmap(lambda hh, rr, ll, mm:
                            one(hh, rr, None, ll, mm))(h, r, rl, m)
        out = lax.map(chunk, (haps.reshape(n_chunks, width, -1),
                              reads.reshape(n_chunks, width, -1),
                              rlens.reshape(n_chunks, width),
                              ms.reshape(n_chunks, width)))
    else:
        def chunk(args):
            return jax.vmap(one)(*args)
        out = lax.map(chunk, (haps.reshape(n_chunks, width, -1),
                              reads.reshape(n_chunks, width, -1),
                              rcs.reshape(n_chunks, width, -1),
                              rlens.reshape(n_chunks, width),
                              ms.reshape(n_chunks, width)))
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks * width,) + x.shape[2:])[:B], out)
    if not want_hists:
        scalars, mom = out
        h_d = h_a = None
    else:
        h_d, h_a, scalars, mom = out
    # one packed int32 row per read: a single small device->host fetch
    # (the histograms stay on device — the ~30 MB/s relay link made
    # fetching them the round-1 bottleneck)
    return h_d, h_a, jnp.concatenate([scalars, mom], axis=1)


# ---------------------------------------------------------------------------
# host-facing backend
# ---------------------------------------------------------------------------

class FusedStats:
    """Exact-integer host view of one fused batch.

    Only the packed per-read stats row crosses the device->host link
    (one transfer); the bucket histograms stay device-side.
    """

    def __init__(self, h_d, h_a, packed):
        self._h_d_dev = h_d
        self._h_a_dev = h_a
        p = np.asarray(packed, dtype=np.int64)
        s, m = p[:, :6], p[:, 6:]
        self.n_dots = ((s[:, 0] << 16) + s[:, 1] +
                       (s[:, 2] << 16) + s[:, 3])
        self.i_min = s[:, 4]
        self.i_max = s[:, 5]
        self.cnt = (m[:, 0] << 16) + m[:, 1]
        self.sum_absd = (m[:, 2] << 16) + m[:, 3]
        self.w10 = (m[:, 4] << 16) + m[:, 5]
        if m.shape[1] >= 28:   # combined DEL mode: second moment set
            self.cnt2 = (m[:, 14] << 16) + m[:, 15]
            self.w10_2 = (m[:, 18] << 16) + m[:, 19]
        self.sel_cnt = (m[:, 6] << 16) + m[:, 7]
        self.sel_pos = (m[:, 8] << 16) + (m[:, 9] << 16) + m[:, 10]
        self.sel_neg = (m[:, 11] << 16) + (m[:, 12] << 16) + m[:, 13]

    @property
    def h_d(self):
        return None if self._h_d_dev is None else \
            np.asarray(self._h_d_dev)

    @property
    def h_a(self):
        return None if self._h_a_dev is None else \
            np.asarray(self._h_a_dev)

    def span(self, b: int) -> int:
        if self.n_dots[b] == 0:
            return 0
        return int(self.i_max[b] - self.i_min[b])


class _Ready:
    """Trivial already-resolved future (single-call dispatch path)."""

    __slots__ = ("_v",)

    def __init__(self, v):
        self._v = v

    def result(self):
        return self._v


class FusedBackend:
    """v2 device backend: single fused call per (scorer, haplotype)."""

    name = "jax-fused"

    def _encode_hap(self, seq: str, H: int) -> np.ndarray:
        codes = oracle.encode(seq)
        out = np.full(H, HAP_PAD, dtype=np.uint8)
        out[: len(codes)] = codes
        return out

    def _encode_reads(self, reads: Sequence[Sequence], R: int):
        """Forward-strand codes only: the reverse complement is
        derived on DEVICE (engine.fused._derive_rc_row) — the relay
        moves ~25 MB/s host->device, so not shipping the second
        strand halves the dominant upload.  The rc slot stays in the
        tuple as None for the dispatch plumbing."""
        B = len(reads)
        fw = np.full((B, R), READ_PAD, dtype=np.uint8)
        rlens = np.zeros(B, dtype=np.int32)
        ms = np.zeros(B, dtype=np.int32)
        for b, r in enumerate(reads):
            codes = oracle.encode(r[0])
            fw[b, : len(codes)] = codes
            rlens[b] = len(codes)
            ms[b] = int(r[1])
        return fw, None, rlens, ms

    def _dispatch(self, hap_codes, enc, window, H, R, scorer):
        """Launch the device computation without blocking (async).
        Production (rc=None) ships the hap row once + nibble-packed
        reads and expands on device; only legacy rc-carrying callers
        pay the broadcast upload."""
        fw, rc, rlens, ms = enc
        if rc is None:
            uniq = hap_codes.reshape(1, H)
            idx = np.zeros(fw.shape[0], np.int32)
            haps_d, fw_d = _expand_rows(jnp.asarray(pack_nibbles(uniq)),
                                        jnp.asarray(idx),
                                        jnp.asarray(pack_nibbles(fw)))
            return fused_batch(haps_d, fw_d, None,
                               jnp.asarray(rlens), jnp.asarray(ms),
                               window // 10 - 1, H=H, R=R, scorer=scorer)
        haps = np.broadcast_to(hap_codes, (fw.shape[0], H))
        return fused_batch(jnp.asarray(haps), jnp.asarray(fw),
                           jnp.asarray(rc), jnp.asarray(rlens),
                           jnp.asarray(ms), window // 10 - 1,
                           H=H, R=R, scorer=scorer)

    def _submit(self, hap_codes, enc, window, H, R, scorer):
        """Future-like handle for one (hap, reads) stat request.  The
        base backend resolves immediately (jax dispatch is already
        async); BatchingBackend overrides this to coalesce requests
        across events/haplotypes into combined device calls."""
        return _Ready(self._dispatch(hap_codes, enc, window, H, R,
                                     scorer))

    def _run(self, hap_codes, enc, window, H, R, scorer) -> FusedStats:
        return FusedStats(*self._submit(hap_codes, enc, window, H, R,
                                        scorer).result())

    def score_del_batch_async(self, ref_seq: str, alt_seq: str,
                              reads: Sequence[Sequence], window: int):
        """Async combined DEL scoring dispatch; returns a finisher
        producing (m1b_scores, w10_scores) — one device call per
        haplotype instead of two."""
        if not reads:
            return lambda: ([], [])
        ref_m1b = ref_seq.upper()
        alt_m1b = alt_seq.upper()
        try:
            H_r = bucket_for(len(ref_m1b) + 1)
            H_a = bucket_for(len(alt_m1b) + 1)
            r_groups = self._read_groups(reads)
        except ValueError:
            out = ([oracle.SCORERS["abs_dis_m1b"](
                        ref_seq, alt_seq, r[0], r[1], window)
                    for r in reads],
                   [oracle.SCORERS["within_10perc_m1b"](
                        ref_seq, alt_seq, r[0], r[1], window)
                    for r in reads])
            return lambda: out
        haps = [self._encode_hap(s, hh) for s, hh in
                ((ref_m1b, H_r), (alt_m1b, H_a), (ref_seq, H_r),
                 (alt_seq, H_a))]
        encs = [(idxs, self._encode_reads([reads[i] for i in idxs], R))
                for R, idxs in r_groups]
        if not (all(_VOCAB_OK[h].all() for h in haps)
                and all(_VOCAB_OK[enc[0]].all()
                        for _, enc in encs)):
            out = ([oracle.SCORERS["abs_dis_m1b"](
                        ref_seq, alt_seq, r[0], r[1], window)
                    for r in reads],
                   [oracle.SCORERS["within_10perc_m1b"](
                        ref_seq, alt_seq, r[0], r[1], window)
                    for r in reads])
            return lambda: out
        # m1b runs on uppercased haps, within-10% on the raw ones
        # (pyx:183-184 vs 278) — same device mode, different codes
        raw_differs = ref_seq != ref_m1b or alt_seq != alt_m1b
        pend = []
        for (R, idxs), (_, enc) in zip(r_groups, encs):
            d_ref_u = self._submit(haps[0], enc, window, H_r, R, "del")
            d_alt_u = self._submit(haps[1], enc, window, H_a, R, "del")
            if raw_differs:
                d_ref_r = self._submit(haps[2], enc, window, H_r, R,
                                       "del")
                d_alt_r = self._submit(haps[3], enc, window, H_a, R,
                                       "del")
            else:
                d_ref_r, d_alt_r = d_ref_u, d_alt_u
            pend.append((idxs, d_ref_u, d_alt_u, d_ref_r, d_alt_r))
        return functools.partial(
            self._finish_del, ref_seq, alt_seq, ref_m1b, alt_m1b,
            len(reads), pend)

    def score_del_batch(self, ref_seq: str, alt_seq: str,
                        reads: Sequence[Sequence], window: int):
        return self.score_del_batch_async(ref_seq, alt_seq, reads,
                                          window)()

    def _finish_del(self, ref_seq, alt_seq, ref_m1b, alt_m1b, n_reads,
                    pend):
        m1b = [None] * n_reads
        w10 = [None] * n_reads
        for idxs, d_ref_u, d_alt_u, d_ref_r, d_alt_r in pend:
            su_ref = FusedStats(*d_ref_u.result())
            su_alt = FusedStats(*d_alt_u.result())
            sr_ref = FusedStats(*d_ref_r.result())
            sr_alt = FusedStats(*d_alt_r.result())
            for b, i in enumerate(idxs):
                nr, na = int(su_ref.n_dots[b]), int(su_alt.n_dots[b])
                if not (nr > 2 and na > 2) or not \
                        float(nr) / min(float(len(ref_m1b)),
                                        float(len(alt_m1b))) > 0.1:
                    m1b[i] = [0, 0]
                else:
                    r_ok = float(su_ref.span(b)) / \
                        float(len(ref_m1b)) > 0.6
                    a_ok = float(su_alt.span(b)) / \
                        float(len(alt_m1b)) > 0.6
                    if not (r_ok and a_ok):
                        m1b[i] = [1.1, 2.1] if r_ok else \
                            ([2.1, 1.1] if a_ok else [0, 0])
                    else:
                        cr = int(su_ref.cnt[b])
                        ca = int(su_alt.cnt[b])
                        if cr > 0 and ca > 0:
                            m1b[i] = [float(su_ref.sum_absd[b]) / cr,
                                      float(su_alt.sum_absd[b]) / ca]
                        else:
                            m1b[i] = [0, 0]
                nr2, na2 = int(sr_ref.n_dots[b]), int(sr_alt.n_dots[b])
                if not max(float(nr2) / float(len(ref_seq)),
                           float(na2) / float(len(alt_seq))) > 0.1:
                    w10[i] = [0, 0]
                elif int(sr_ref.cnt2[b]) > 0 and \
                        int(sr_alt.cnt2[b]) > 0:
                    w10[i] = [int(sr_alt.w10_2[b]),
                              int(sr_ref.w10_2[b])]
                else:
                    w10[i] = [0, 0]
        return m1b, w10

    @staticmethod
    def _read_groups(reads):
        """Original-index groups by per-read R bucket.  Reads pad only
        to their OWN length bucket, not the event maximum: a
        DEL-supporting read is genuinely shorter than a ref-spanning
        one (by the SV span), so one long read must not force every
        row to the big bucket — per-row cell count is the engine's
        cost.  Padding never changes any score, so the split is
        parity-exact (tests/test_batching.py)."""
        groups = {}
        for i, r in enumerate(reads):
            groups.setdefault(bucket_for(len(r[0]) + 1), []).append(i)
        return sorted(groups.items())

    def score_batch_async(self, scorer: str, ref_seq: str,
                          alt_seq: str, reads: Sequence[Sequence],
                          window: int):
        """Dispatch scoring without blocking; returns a zero-arg
        finisher.  Queue many events' dispatches from one thread, then
        resolve in order — single-thread async pipelining beats thread
        pools on the relay link (result fetches hold the GIL for the
        whole RPC, serializing threaded overlap)."""
        if not reads:
            return lambda: []
        if scorer in ("abs_dis_m1", "abs_dis_m2"):
            out = [oracle.SCORERS[scorer](ref_seq, alt_seq, r[0], r[1],
                                          window) for r in reads]
            return lambda: out
        upper = scorer == "abs_dis_m1b"
        ref_s = ref_seq.upper() if upper else ref_seq
        alt_s = alt_seq.upper() if upper else alt_seq
        try:
            # per-haplotype buckets: padding never changes scores, and
            # the batching layer groups by (H, R) anyway, so each hap
            # pads only to its own size (a TANDUP alt is ~2x its ref)
            H_r = bucket_for(len(ref_s) + 1)
            H_a = bucket_for(len(alt_s) + 1)
            r_groups = self._read_groups(reads)
        except ValueError:
            out = [oracle.SCORERS[scorer](ref_seq, alt_seq, r[0], r[1],
                                          window) for r in reads]
            return lambda: out
        mode = {"abs_dis_m1b": "m1b", "within_10perc_m1b": "w10",
                "redefine_diagonal": "rdd"}[scorer]
        hr = self._encode_hap(ref_s, H_r)
        ha = self._encode_hap(alt_s, H_a)
        encs = [(idxs, self._encode_reads([reads[i] for i in idxs], R))
                for R, idxs in r_groups]
        if not (_VOCAB_OK[hr].all() and _VOCAB_OK[ha].all()
                and all(_VOCAB_OK[enc[0]].all()
                        for _, enc in encs)):
            out = [oracle.SCORERS[scorer](ref_seq, alt_seq, r[0], r[1],
                                          window) for r in reads]
            return lambda: out
        # dispatch every group's two haplotypes before materializing
        # any (the device overlaps them; np.asarray blocks)
        pend = [(idxs,
                 self._submit(hr, enc, window, H_r, R, mode),
                 self._submit(ha, enc, window, H_a, R, mode))
                for (R, idxs), (_, enc) in zip(r_groups, encs)]
        return functools.partial(self._finish_score, mode, ref_s,
                                 alt_s, len(reads), pend)

    def score_batch(self, scorer: str, ref_seq: str, alt_seq: str,
                    reads: Sequence[Sequence], window: int
                    ) -> List[List[float]]:
        return self.score_batch_async(scorer, ref_seq, alt_seq, reads,
                                      window)()

    def _finish_score(self, mode, ref_s, alt_s, n_reads, pend
                      ) -> List[List[float]]:
        out: List[List[float]] = [None] * n_reads
        for idxs, d_ref, d_alt in pend:
            s_ref = FusedStats(*d_ref.result())
            s_alt = FusedStats(*d_alt.result())
            for b, i in enumerate(idxs):
                out[i] = self._score_pair(mode, ref_s, alt_s, s_ref,
                                          s_alt, b)
        return out

    @staticmethod
    def _score_pair(mode, ref_s, alt_s, s_ref, s_alt, b):
        nr, na = int(s_ref.n_dots[b]), int(s_alt.n_dots[b])
        if mode == "m1b":
            if not (nr > 2 and na > 2):
                return [0, 0]
            if not float(nr) / min(float(len(ref_s)),
                                   float(len(alt_s))) > 0.1:
                return [0, 0]
            r_ok = float(s_ref.span(b)) / float(len(ref_s)) > 0.6
            a_ok = float(s_alt.span(b)) / float(len(alt_s)) > 0.6
            if not (r_ok and a_ok):
                return [1.1, 2.1] if r_ok else \
                    ([2.1, 1.1] if a_ok else [0, 0])
            cr, ca = int(s_ref.cnt[b]), int(s_alt.cnt[b])
            if cr > 0 and ca > 0:
                return [float(s_ref.sum_absd[b]) / cr,
                        float(s_alt.sum_absd[b]) / ca]
            return [0, 0]
        if mode == "w10":
            if not max(float(nr) / float(len(ref_s)),
                       float(na) / float(len(alt_s))) > 0.1:
                return [0, 0]
            if int(s_ref.cnt[b]) > 0 and int(s_alt.cnt[b]) > 0:
                return [int(s_alt.w10[b]), int(s_ref.w10[b])]
            return [0, 0]
        # rdd
        if not (float(nr) / float(len(ref_s)) > 0.1 and
                float(na) / float(len(alt_s)) > 0.1):
            return [0, 0]
        if not (float(s_ref.span(b)) / float(len(ref_s)) > 0.7
                and float(s_alt.span(b)) / float(len(alt_s)) > 0.7):
            return [0, 0]
        if int(s_ref.cnt[b]) == 0 or int(s_alt.cnt[b]) == 0:
            return [0, 0]
        pair = []
        for s in (s_ref, s_alt):
            n_sel = int(s.sel_cnt[b])
            if n_sel == 0:
                pair.append(0.0001)
            else:
                total = float(int(s.sel_pos[b]) - int(s.sel_neg[b]))
                pair.append(abs((total / 2.0) / n_sel))
        return pair
