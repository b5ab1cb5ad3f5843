"""Sparse k-mer-join dot construction vs the dense windowed-AND path.

oracle.dot_arrays must reproduce dots_from_weights(dot_weight_matrix(..))
bit-for-bit (same (i, j) order, same weights) — the dense path is the
one fuzzed against the reference in round 1 (129k comparisons), so
exact agreement here transfers that evidence to the sparse default.
"""
import random

import numpy as np

from vapor_tpu.engine import oracle

ALPHABETS = [
    "ACGT",
    "ACGTN",
    "ACGTacgtn",
    "ACGTRYSWKM",          # IUPAC (key_modify collapses to N)
    "ACGTNX=\xfe",         # sentinel-adjacent codes
]


def _rand_seq(rng, alpha, lo, hi):
    return "".join(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))


def _dense(k, s1, s2):
    W, n2, n1 = oracle.dot_weight_matrix(k, s1, s2)
    ii, jj, ww = oracle.dots_from_weights(W)
    return ii, jj, ww, n2, n1


def _check(k, s1, s2):
    di, dj, dw, dn2, dn1 = _dense(k, s1, s2)
    si, sj, sw, sn2, sn1 = oracle.dot_arrays(k, s1, s2)
    assert (sn2, sn1) == (dn2, dn1)
    assert np.array_equal(si, di)
    assert np.array_equal(sj, dj)
    assert np.array_equal(sw, dw)


def test_fuzz_vs_dense():
    rng = random.Random(99)
    for trial in range(220):
        alpha = ALPHABETS[trial % len(ALPHABETS)]
        k = (10, 20, 30, 40)[trial % 4]
        s1 = _rand_seq(rng, alpha, 0, 180)
        s2 = _rand_seq(rng, alpha, 0, 180)
        _check(k, s1, s2)


def test_structured_cases():
    rng = random.Random(7)
    body = _rand_seq(rng, "ACGT", 60, 60)
    left = _rand_seq(rng, "ACGT", 40, 40)
    right = _rand_seq(rng, "ACGT", 40, 40)
    from vapor_tpu.io.fasta import reverse_complement
    hap = left + body + right
    for s1 in (hap,                                   # self-dotplot
               left + reverse_complement(body) + right,  # inversion
               left + body * 2 + right,               # tandem dup
               left + right,                          # deletion
               "N" * 35 + body,                       # N-runs (dup dots)
               "", "ACG"):                            # degenerate
        for k in (10, 20):
            _check(k, s1, hap)
            _check(k, hap, s1)


def test_hap_index_matches_slice():
    """DotSet.from_index(hap, read, miss) == DotSet(k, read, hap[miss:])
    for every miss — the per-event cached-index path must be invisible."""
    rng = random.Random(41)
    for trial in range(60):
        alpha = ALPHABETS[trial % len(ALPHABETS)]
        k = (10, 20)[trial % 2]
        hap = _rand_seq(rng, alpha, 0, 160)
        read = _rand_seq(rng, alpha, 0, 160)
        idx = oracle.HapKmerIndex(hap, k)
        for miss in (0, 1, 7, len(hap) // 2, max(0, len(hap) - k),
                     len(hap) + 3):
            ref = oracle.DotSet(k, read, hap[miss:])
            got = oracle.DotSet.from_index(idx, read, miss)
            assert np.array_equal(got.ii, ref.ii)
            assert np.array_equal(got.jj, ref.jj)
            assert np.array_equal(got.ww, ref.ww)
            assert (got.n_dots, got.i_min, got.i_max, got.hap_len) == \
                (ref.n_dots, ref.i_min, ref.i_max, ref.hap_len)


def test_weight_two_dots():
    # palindromic k-mer: forward and inverted match at the same (i, j)
    pal = "ACGCGT" + "ACGT" * 2        # contains revcomp-symmetric 10-mer?
    s = "AACCGGTTAACCGGTT"             # revcomp(s) == s for the core
    _check(10, s, s)
    # explicit palindrome of length 10: s10 == revcomp(s10)
    s10 = "ACGTACGTAC"
    from vapor_tpu.io.fasta import reverse_complement
    pal10 = "ACGTA" + reverse_complement("ACGTA")
    assert reverse_complement(pal10) == pal10
    seq = "TT" + pal10 + "GG"
    ii, jj, ww, _, _ = oracle.dot_arrays(10, seq, seq)
    _check(10, seq, seq)
    assert (ww == 2).any()
