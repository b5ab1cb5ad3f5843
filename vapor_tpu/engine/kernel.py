"""TPU scoring engine: dotplot statistics in sheared coordinates.

The reference's per-(read x haplotype) inner loop builds a Python dict of
k-mers and emits dot lists (Simple_function.pyx:545-983).  Here the same
multiset of dots is processed as dense XLA ops, never materializing dot
lists:

* base-equality in *skewed* layout: S[i, c] = read[i + c - (H-1)] built by
  a pad+reshape trick (no gather), so a k-mer match is a vertical run of
  k TRUEs down one column — found with one `lax.cummax` pass
  (run-length-since-last-mismatch), which keeps the k-mer window size k
  *dynamic* (one compilation covers k in {10,20,30,40});
* inverted (reverse-complement) matches run the identical pipeline on the
  host-precomputed reverse-complement read; their dots live on columns of
  constant anti-diagonal;
* diagonal / anti-diagonal histograms are column sums plus slope-2
  pad+reshape groupings — pure reshapes, no scatter;
* cluster keep-tables (computed on host from the histograms, exactly
  like the oracle) come back in as per-bucket boolean tables; the
  slope-2 *inverse* reshape turns them into per-dot masks;
* every reduction is integer and exact: per-column int32 partials are
  split into 16-bit halves before summing so the host reassembles exact
  integers in f64;
* threshold gates (within-10%, >0.1 deviation) use exact integer
  rewrites of the reference's f64 comparisons (25|d| < 4i' etc. — the
  rational operands can never fall inside the rounding window of the
  binary float constants, so the integer forms are equivalent).

Scalar outputs feed the host finisher in `JaxBackend`, which reproduces
the numpy-oracle scores bit-for-bit (see tests/test_kernel_vs_oracle.py).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import oracle

# sentinels (never equal to real post-key_modify ASCII codes or each other)
HAP_PAD = 255
READ_PAD = 253
KMAX = 40

# step ~1.25-1.5x: padding waste stays under ~50% in cells while the
# executable count remains small (compiles persist in the XLA disk
# cache).  Typical whole-event haplotypes (<= 10 kb SV + 2x500 flank,
# pyx:26) land in 1536-4096; junction mode is 1536-2048.
HAP_BUCKETS = (512, 768, 1024, 1536, 2048, 2560, 3072, 4096, 5120,
               6144, 8192, 10240, 12544, 16384)


def bucket_for(n: int) -> int:
    for b in HAP_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"sequence of length {n} exceeds largest bucket")


def _hist_layout(H: int, R: int) -> Tuple[int, int, int]:
    """(WH, D_OFF, A_OFF): histogram size and value offsets.

    Bucket(d') = d' + D_OFF, bucket(a') = a' + A_OFF.  Sizes leave room
    for every *placement window* (including all-zero skew tails): the
    slope-2 groupings cover index ranges of width W + 2H - 2.
    """
    D_OFF = R + 3 * H - 3          # = lenG, keeps every placement start >= 0
    A_OFF = 2 * H + R
    WH = 2 * R + 4 * H + 1024
    return WH, D_OFF, A_OFF


def _skew_read(read: jnp.ndarray, H: int) -> jnp.ndarray:
    """S[i, c] = read[i + c - (H-1)] for c in [0, W), fill = READ_PAD."""
    R = read.shape[0]
    W = R + H - 1
    W2 = R + 2 * H - 2 + 1  # row width with room for max shift + 1
    row = jnp.concatenate([
        jnp.full((H - 1,), READ_PAD, dtype=jnp.uint8),
        read,
        jnp.full((W2 - (H - 1) - R,), READ_PAD, dtype=jnp.uint8),
    ])
    flat = jnp.broadcast_to(row, (H, W2)).reshape(-1)
    flat = jnp.concatenate(
        [flat, jnp.full((H,), READ_PAD, dtype=jnp.uint8)])
    return flat.reshape(H, W2 + 1)[:, :W]


def _hits(hap: jnp.ndarray, read: jnp.ndarray, k: jnp.ndarray,
          m: jnp.ndarray) -> jnp.ndarray:
    """K[i, c] = 1 iff a k-mer match starts at hap position i, skew col c.

    Dynamic k: run lengths via `i - cummax(last mismatch row)`, then a
    dynamic row shift by k-1 reads the run ending at the window tail.
    """
    H = hap.shape[0]
    S = _skew_read(read, H)
    B = (hap[:, None] == S) & (
        jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) >= m)
    rows = jax.lax.broadcasted_iota(jnp.int32, B.shape, 0)
    last_miss = lax.cummax(jnp.where(B, jnp.int32(-1), rows), axis=0)
    runlen = rows - last_miss
    padded = jnp.concatenate(
        [runlen, jnp.zeros((KMAX, B.shape[1]), jnp.int32)], axis=0)
    shifted = lax.dynamic_slice(padded, (k - 1, 0), (H, B.shape[1]))
    return (shifted >= k).astype(jnp.int32)


def _slope2_group(K: jnp.ndarray) -> jnp.ndarray:
    """G[u] = sum_i K[i, u - 2i] — slope-2 diagonal sums by pad+reshape."""
    M, W = K.shape
    W2 = W + 2 * M
    Kp = jnp.pad(K, ((0, 0), (0, W2 - W)))
    flat = Kp.reshape(-1)[: M * (W2 - 2)]
    return flat.reshape(M, W2 - 2).sum(axis=0)


def _slope2_lookup(table: jnp.ndarray, M: int, W: int,
                   t0: jnp.ndarray) -> jnp.ndarray:
    """X[i, c] = table[(2i + c + t0) mod len(table)].

    In-range for every real dot by construction; wrapped values land
    only where the hit matrix is zero.
    """
    WA = table.shape[0]
    bcast = jnp.broadcast_to(table, (M, WA)).reshape(-1)
    bcast = jnp.concatenate([bcast, jnp.zeros((2 * M,), table.dtype)])
    X = bcast.reshape(M, WA + 2)  # X[i, v] = table[(2i + v) mod WA]
    return lax.dynamic_slice(X, (0, t0), (M, W))


def _split_sum(col: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nonneg int32 vector -> (sum of hi16, sum of lo16), both < 2^31."""
    return (col >> 16).sum(), (col & 0xFFFF).sum()


def _dot_stats_one(hap, read, rc, rlen, m, dm, am, or_mode, z, k,
                   H: int, R: int, mode: str = "all",
                   use_masks: bool = True):
    """Per-(read, hap) statistics for one masked pass.

    dm/am: bool keep-tables over histogram buckets (d'+D_OFF, a'+A_OFF).
    or_mode=1: keep = dm|am (final cleaning); 0: keep = dm&am
    (histogram restriction passes, e.g. the within-10% leftover stage).
    z: 2x the re-centering intercept for the directed-deviation sums.

    `mode` (static) prunes the compiled work:
      "hist" — masked histograms + gate scalars only;
      "m1b"  — kept count + sum|d| moments only;
      "w10"  — kept count + within-10% count;
      "rdd"  — kept count + directed-deviation selection sums;
      "all"  — everything (tests / entry point).
    """
    WH, D_OFF, A_OFF = _hist_layout(H, R)
    W = R + H - 1
    want_hist = mode in ("hist", "all")
    want_mom = mode != "hist"
    want_w10 = mode in ("w10", "all")
    want_sel = mode in ("rdd", "all")

    Kf = _hits(hap, read, k, m)                      # forward dots
    Kr = _hits(hap, rc, k, m)                        # inverted dots
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    # per-dot coordinates (i' = i - m on the sliced haplotype)
    ip = rows - m
    d_f = cols - (H - 1) + m                         # j - i', per column
    C0 = rlen - k + (H - 1) + m
    d_r = C0 - cols - 2 * rows                       # j - i', slope -2
    a_r_col = rlen - k + (H - 1) - m - cols          # i' + j, per column

    # keep masks from bucket tables
    if use_masks:
        kd_f = jnp.broadcast_to(
            dm[jnp.clip(d_f[0:1, :] + D_OFF, 0, WH - 1)], (H, W))
        ka_f = _slope2_lookup(am, H, W, jnp.int32(A_OFF - (H - 1) - m))
        keep_f = jnp.where(or_mode > 0, kd_f | ka_f, kd_f & ka_f)

        kd_r = _slope2_lookup(jnp.flip(dm), H, W,
                              jnp.int32(WH - 1 - D_OFF) - C0)
        ka_r = jnp.broadcast_to(
            am[jnp.clip(a_r_col[0:1, :] + A_OFF, 0, WH - 1)], (H, W))
        keep_r = jnp.where(or_mode > 0, kd_r | ka_r, kd_r & ka_r)

        Mf = Kf * keep_f
        Mr = Kr * keep_r
    else:
        Mf, Mr = Kf, Kr

    # ---- masked histograms (for host-side gap clustering) --------------
    if want_hist:
        h_d = jnp.zeros((WH,), jnp.int32)
        h_d = lax.dynamic_update_slice(
            h_d, Mf.sum(axis=0), (m - (H - 1) + D_OFF,))
        G = _slope2_group(Mr)                        # grouped by c + 2i
        h_d = lax.dynamic_update_slice(
            jnp.zeros((WH,), jnp.int32), jnp.flip(G),
            (C0 - (G.shape[0] - 1) + D_OFF,)) + h_d
        Ga = _slope2_group(Mf)                       # grouped by 2i + c
        h_a = lax.dynamic_update_slice(
            jnp.zeros((WH,), jnp.int32), Ga, (A_OFF - (H - 1) - m,))
        C1 = rlen - k + (H - 1) - m
        h_a = lax.dynamic_update_slice(
            jnp.zeros((WH,), jnp.int32), jnp.flip(Mr.sum(axis=0)),
            (C1 - (W - 1) + A_OFF,)) + h_a
    else:
        h_d = jnp.zeros((1,), jnp.int32)
        h_a = jnp.zeros((1,), jnp.int32)

    # ---- gate statistics (independent of masks) ------------------------
    if want_hist:
        n_hi_f, n_lo_f = _split_sum(Kf.sum(axis=0))
        n_hi_r, n_lo_r = _split_sum(Kr.sum(axis=0))
        any_row = (Kf.sum(axis=1) > 0) | (Kr.sum(axis=1) > 0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (H,), 0)
        i_min = jnp.min(jnp.where(any_row, ridx, H + 1))
        i_max = jnp.max(jnp.where(any_row, ridx, -1))
        scalars = jnp.stack([n_hi_f, n_lo_f, n_hi_r, n_lo_r,
                             i_min, i_max])
    else:
        scalars = jnp.zeros((6,), jnp.int32)

    # ---- masked moments -------------------------------------------------
    zero = jnp.int32(0)

    def moments(Mm, d):
        absd = jnp.abs(d)
        cnt = _split_sum(Mm.sum(axis=0))
        sd = _split_sum((Mm * absd).sum(axis=0)) if mode in (
            "m1b", "all") else (zero, zero)
        if want_w10:
            # within-10%: i' > 0 and 25|d| < 4i' (== |d|/i' < 0.16 f64)
            w10 = _split_sum((Mm * ((ip > 0) & (25 * absd < 4 * ip))
                              ).sum(axis=0))
        else:
            w10 = (zero, zero)
        if want_sel:
            # directed-deviation selection on the re-centered dots:
            # dev > 0.1 with i0 = i' + z/2  ->  10|z-2d| > |2i'+z|
            # (denominator i0+1 when i0 == 0)
            num = jnp.abs(z - 2 * d)
            den = jnp.abs(2 * ip + z)
            den = jnp.where(2 * ip + z == 0,
                            jnp.abs(2 * ip + z + 2), den)
            sel = Mm * (10 * num > den)
            sel_cnt = _split_sum(sel.sum(axis=0))
            val = z - 2 * d
            pv = jnp.maximum(val, 0)
            nv = jnp.maximum(-val, 0)
            # value-level 16-bit split keeps per-column partials < 2^31
            pos_hi = (sel * (pv >> 16)).sum()
            pos_lo = _split_sum((sel * (pv & 0xFFFF)).sum(axis=0))
            neg_hi = (sel * (nv >> 16)).sum()
            neg_lo = _split_sum((sel * (nv & 0xFFFF)).sum(axis=0))
        else:
            sel_cnt = (zero, zero)
            pos_hi, pos_lo = zero, (zero, zero)
            neg_hi, neg_lo = zero, (zero, zero)
        return jnp.stack([cnt[0], cnt[1], sd[0], sd[1], w10[0], w10[1],
                          sel_cnt[0], sel_cnt[1],
                          pos_hi, pos_lo[0], pos_lo[1],
                          neg_hi, neg_lo[0], neg_lo[1]])

    if want_mom:
        mom = moments(Mf, d_f) + moments(Mr, d_r)
    else:
        mom = jnp.zeros((14,), jnp.int32)
    return h_d, h_a, scalars, mom


@functools.partial(jax.jit,
                   static_argnames=("H", "R", "mode", "use_masks"))
def _dot_stats_batch(hap, reads, rcs, rlens, ms, dms, ams, or_modes, zs,
                     k, H: int, R: int, mode: str = "all",
                     use_masks: bool = True):
    """Sequential map over the read batch (vmap would materialize the
    skewed matrices for every read at once — GBs at large buckets)."""
    def f(args):
        read, rc, rlen, m, dm, am, om, z = args
        return _dot_stats_one(hap, read, rc, rlen, m, dm, am, om, z, k,
                              H, R, mode, use_masks)
    return lax.map(f, (reads, rcs, rlens, ms, dms, ams, or_modes, zs))


class HapStats:
    """Host-side exact-integer view of one batched device pass."""

    def __init__(self, h_d, h_a, scalars, mom):
        self.h_d = np.asarray(h_d)
        self.h_a = np.asarray(h_a)
        s = np.asarray(scalars, dtype=np.int64)
        self.n_dots = ((s[:, 0] << 16) + s[:, 1] +
                       (s[:, 2] << 16) + s[:, 3])
        self.i_min = s[:, 4]
        self.i_max = s[:, 5]
        m = np.asarray(mom, dtype=np.int64)
        self.cnt = (m[:, 0] << 16) + m[:, 1]
        self.sum_absd = (m[:, 2] << 16) + m[:, 3]
        self.w10 = (m[:, 4] << 16) + m[:, 5]
        self.sel_cnt = (m[:, 6] << 16) + m[:, 7]
        self.sel_pos = (m[:, 8] << 16) + (m[:, 9] << 16) + m[:, 10]
        self.sel_neg = (m[:, 11] << 16) + (m[:, 12] << 16) + m[:, 13]

    def span(self, r: int) -> int:
        if self.n_dots[r] == 0:
            return 0
        return int(self.i_max[r] - self.i_min[r])


def kept_table(hist: np.ndarray, gap: int, thr: int,
               fallback_max: bool) -> np.ndarray:
    """Gap-cluster a histogram into a bool keep-table (host, exact).

    Same semantics as oracle._kept_value_mask on bucketized counts:
    distinct present values = nonzero buckets; clusters break at gaps
    >= `gap`; keep totals > thr, else (with fallback) totals == max.
    """
    out = np.zeros(hist.shape[0], dtype=bool)
    nz = np.nonzero(hist)[0]
    if nz.size == 0:
        return out
    breaks = np.nonzero(np.diff(nz) >= gap)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [nz.size - 1]])
    totals = np.array([hist[nz[s]:nz[e] + 1].sum()
                       for s, e in zip(starts, ends)], dtype=np.int64)
    keep = totals > thr
    if fallback_max and not keep.any():
        keep = totals == totals.max()
    for s, e, kp in zip(starts, ends, keep):
        if kp:
            out[nz[s]:nz[e] + 1] = True
    mask = np.zeros_like(out)
    mask[nz] = True
    return out & mask


class JaxBackend:
    """Device scoring backend with exact host finishing.

    score_batch() reproduces the oracle scorers bit-for-bit: the device
    returns exact integer aggregates; all float math happens here in f64
    with the same expressions the reference uses.
    """

    name = "jax"

    def __init__(self):
        self._true_tables = {}

    # -- encoding ---------------------------------------------------------

    def _encode_hap(self, seq: str, H: int) -> np.ndarray:
        codes = oracle.encode(seq)
        out = np.full(H, HAP_PAD, dtype=np.uint8)
        out[: len(codes)] = codes
        return out

    def _encode_reads(self, reads: Sequence[Sequence], R: int):
        B = len(reads)
        fw = np.full((B, R), READ_PAD, dtype=np.uint8)
        rc = np.full((B, R), READ_PAD, dtype=np.uint8)
        rlens = np.zeros(B, dtype=np.int32)
        ms = np.zeros(B, dtype=np.int32)
        for b, r in enumerate(reads):
            codes = oracle.encode(r[0])
            fw[b, : len(codes)] = codes
            rc[b, : len(codes)] = oracle.encode_comp(r[0])[::-1]
            rlens[b] = len(codes)
            ms[b] = int(r[1])
        return fw, rc, rlens, ms

    def _all_true(self, WH: int) -> np.ndarray:
        if WH not in self._true_tables:
            self._true_tables[WH] = np.ones(WH, dtype=bool)
        return self._true_tables[WH]

    def _pass(self, hap_codes, enc, k, H, R, dms=None, ams=None,
              or_mode=0, zs=None, mode="all",
              use_masks=True) -> HapStats:
        fw, rc, rlens, ms = enc
        B = fw.shape[0]
        WH, _, _ = _hist_layout(H, R)
        if dms is None:
            dms = np.broadcast_to(self._all_true(WH), (B, WH))
        if ams is None:
            ams = np.broadcast_to(self._all_true(WH), (B, WH))
        or_modes = np.full(B, or_mode, dtype=np.int32)
        if zs is None:
            zs = np.zeros(B, dtype=np.int32)
        h_d, h_a, scalars, mom = _dot_stats_batch(
            jnp.asarray(hap_codes), jnp.asarray(fw), jnp.asarray(rc),
            jnp.asarray(rlens), jnp.asarray(ms),
            jnp.asarray(np.ascontiguousarray(dms)),
            jnp.asarray(np.ascontiguousarray(ams)),
            jnp.asarray(or_modes), jnp.asarray(zs.astype(np.int32)),
            jnp.int32(k), H=H, R=R, mode=mode, use_masks=use_masks)
        return HapStats(h_d, h_a, scalars, mom)

    # -- public API -------------------------------------------------------

    def score_batch(self, scorer: str, ref_seq: str, alt_seq: str,
                    reads: Sequence[Sequence], window: int
                    ) -> List[List[float]]:
        if not reads:
            return []
        if scorer in ("abs_dis_m1", "abs_dis_m2"):
            # legacy scorers (unused by the CLI) stay on the numpy oracle
            return [oracle.SCORERS[scorer](ref_seq, alt_seq, r[0], r[1],
                                           window) for r in reads]
        upper = scorer == "abs_dis_m1b"
        ref_s = ref_seq.upper() if upper else ref_seq
        alt_s = alt_seq.upper() if upper else alt_seq
        try:
            H = bucket_for(max(len(ref_s), len(alt_s)) + 1)
            R = bucket_for(max(len(r[0]) for r in reads) + 1)
        except ValueError:
            return [oracle.SCORERS[scorer](ref_seq, alt_seq, r[0], r[1],
                                           window) for r in reads]
        enc = self._encode_reads(reads, R)
        ref_codes = self._encode_hap(ref_s, H)
        alt_codes = self._encode_hap(alt_s, H)
        if scorer == "abs_dis_m1b":
            return self._score_m1b(ref_codes, alt_codes, len(ref_s),
                                   len(alt_s), enc, window, H, R)
        if scorer == "within_10perc_m1b":
            return self._score_w10(ref_codes, alt_codes, len(ref_s),
                                   len(alt_s), enc, window, H, R)
        if scorer == "redefine_diagonal":
            return self._score_rdd(ref_codes, alt_codes, len(ref_s),
                                   len(alt_s), enc, window, H, R)
        raise ValueError(f"unknown scorer {scorer}")

    # -- per-scorer flows -------------------------------------------------

    def _clean_tables(self, st: HapStats, B: int, WH: int):
        """diag-and-anti cleaning tables (thr 10, no fallback)."""
        dms = np.zeros((B, WH), dtype=bool)
        ams = np.zeros((B, WH), dtype=bool)
        for b in range(B):
            dms[b] = kept_table(st.h_d[b], 10, 10, False)
            ams[b] = kept_table(st.h_a[b], 10, 10, False)
        return dms, ams

    def _score_m1b(self, ref_codes, alt_codes, ref_len, alt_len, enc,
                   window, H, R) -> List[List[float]]:
        WH, _, _ = _hist_layout(H, R)
        B = enc[0].shape[0]
        p_ref = self._pass(ref_codes, enc, window, H, R,
                           mode="hist", use_masks=False)
        p_alt = self._pass(alt_codes, enc, window, H, R,
                           mode="hist", use_masks=False)
        r_dm, r_am = self._clean_tables(p_ref, B, WH)
        a_dm, a_am = self._clean_tables(p_alt, B, WH)
        m_ref = self._pass(ref_codes, enc, window, H, R, r_dm, r_am, 1,
                           mode="m1b")
        m_alt = self._pass(alt_codes, enc, window, H, R, a_dm, a_am, 1,
                           mode="m1b")
        out = []
        for b in range(B):
            nr, na = int(p_ref.n_dots[b]), int(p_alt.n_dots[b])
            if not (nr > 2 and na > 2):
                out.append([0, 0])
                continue
            if not float(nr) / min(float(ref_len), float(alt_len)) > 0.1:
                out.append([0, 0])
                continue
            r_ok = float(p_ref.span(b)) / float(ref_len) > 0.6
            a_ok = float(p_alt.span(b)) / float(alt_len) > 0.6
            if not (r_ok and a_ok):
                out.append([1.1, 2.1] if r_ok else
                           ([2.1, 1.1] if a_ok else [0, 0]))
                continue
            cr, ca = int(m_ref.cnt[b]), int(m_alt.cnt[b])
            if cr > 0 and ca > 0:
                out.append([float(m_ref.sum_absd[b]) / cr,
                            float(m_alt.sum_absd[b]) / ca])
            else:
                out.append([0, 0])
        return out

    def _score_w10(self, ref_codes, alt_codes, ref_len, alt_len, enc,
                   window, H, R) -> List[List[float]]:
        WH, _, _ = _hist_layout(H, R)
        B = enc[0].shape[0]
        p_ref = self._pass(ref_codes, enc, window, H, R,
                           mode="hist", use_masks=False)
        p_alt = self._pass(alt_codes, enc, window, H, R,
                           mode="hist", use_masks=False)

        def d50(p):
            t = np.zeros((B, WH), dtype=bool)
            for b in range(B):
                t[b] = kept_table(p.h_d[b], 10, 50, True)
            return t

        r_d50, a_d50 = d50(p_ref), d50(p_alt)
        # leftover stage: anti histogram of dots with d NOT kept
        l_ref = self._pass(ref_codes, enc, window, H, R, ~r_d50, None, 0,
                           mode="hist")
        l_alt = self._pass(alt_codes, enc, window, H, R, ~a_d50, None, 0,
                           mode="hist")
        r_a50 = np.zeros((B, WH), dtype=bool)
        a_a50 = np.zeros((B, WH), dtype=bool)
        for b in range(B):
            r_a50[b] = kept_table(l_ref.h_a[b], 10, 50, True)
            a_a50[b] = kept_table(l_alt.h_a[b], 10, 50, True)
        m_ref = self._pass(ref_codes, enc, window, H, R, r_d50, r_a50, 1,
                           mode="w10")
        m_alt = self._pass(alt_codes, enc, window, H, R, a_d50, a_a50, 1,
                           mode="w10")
        out = []
        for b in range(B):
            nr, na = int(p_ref.n_dots[b]), int(p_alt.n_dots[b])
            if not max(float(nr) / float(ref_len),
                       float(na) / float(alt_len)) > 0.1:
                out.append([0, 0])
                continue
            if int(m_ref.cnt[b]) > 0 and int(m_alt.cnt[b]) > 0:
                # [alt, ref] ordering (pyx:290)
                out.append([int(m_alt.w10[b]), int(m_ref.w10[b])])
            else:
                out.append([0, 0])
        return out

    def _score_rdd(self, ref_codes, alt_codes, ref_len, alt_len, enc,
                   window, H, R) -> List[List[float]]:
        WH, D_OFF, _ = _hist_layout(H, R)
        B = enc[0].shape[0]
        p_ref = self._pass(ref_codes, enc, window, H, R,
                           mode="hist", use_masks=False)
        p_alt = self._pass(alt_codes, enc, window, H, R,
                           mode="hist", use_masks=False)
        r_dm, r_am = self._clean_tables(p_ref, B, WH)
        a_dm, a_am = self._clean_tables(p_alt, B, WH)
        # cleaned-only histograms feed the intercept search; the kept
        # count doubles as the "cleaned nonempty" gate
        c_ref = self._pass(ref_codes, enc, window, H, R, r_dm, r_am, 1,
                           mode="hist")
        c_alt = self._pass(alt_codes, enc, window, H, R, a_dm, a_am, 1,
                           mode="hist")

        def intercepts(c):
            zs = np.zeros(B, dtype=np.int32)
            for b in range(B):
                h = c.h_d[b]
                nz = np.nonzero(h)[0]
                if nz.size == 0:
                    continue
                vals = np.repeat(nz - D_OFF, h[nz]).astype(np.int64)
                cc = oracle.most_abundant_intercept(
                    np.zeros_like(vals), vals, np.ones_like(vals))
                zs[b] = np.int32(round(2 * cc))
            return zs

        r_z = intercepts(c_ref)
        a_z = intercepts(c_alt)
        s_ref = self._pass(ref_codes, enc, window, H, R, r_dm, r_am, 1,
                           zs=r_z, mode="rdd")
        s_alt = self._pass(alt_codes, enc, window, H, R, a_dm, a_am, 1,
                           zs=a_z, mode="rdd")
        out = []
        for b in range(B):
            nr, na = int(p_ref.n_dots[b]), int(p_alt.n_dots[b])
            if not (float(nr) / float(ref_len) > 0.1 and
                    float(na) / float(alt_len) > 0.1):
                out.append([0, 0])
                continue
            if not (float(p_ref.span(b)) / float(ref_len) > 0.7 and
                    float(p_alt.span(b)) / float(alt_len) > 0.7):
                out.append([0, 0])
                continue
            if int(c_ref.h_d[b].sum()) == 0 or \
                    int(c_alt.h_d[b].sum()) == 0:
                out.append([0, 0])
                continue
            pair = []
            for s in (s_ref, s_alt):
                n_sel = int(s.sel_cnt[b])
                if n_sel == 0:
                    pair.append(0.0001)
                else:
                    total = float(int(s.sel_pos[b]) - int(s.sel_neg[b]))
                    pair.append(abs((total / 2.0) / n_sel))
            out.append(pair)
        return out
