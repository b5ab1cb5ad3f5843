"""Differential tests: vapor_tpu.engine.oracle vs the reference engine.

The reference ``Simple_function.pyx`` is plain Python (no cdef syntax), so
we import it straight from /root/reference as the ground-truth oracle and
compare function-by-function on realistic random SV scenarios.  Skipped
when the reference checkout is absent.
"""
import importlib.machinery
import importlib.util
import random

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference
from vapor_tpu.engine import oracle
from vapor_tpu.io.fasta import reverse_complement

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]


@pytest.fixture(scope="module")
def ref_mod():
    loader = importlib.machinery.SourceFileLoader(
        "ref_simple_function",
        f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx")
    spec = importlib.util.spec_from_loader("ref_simple_function", loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod


def _mutate(seq, rng, err):
    out = []
    for ch in seq:
        r = rng.random()
        if r < err / 3:
            out.append(rng.choice([b for b in "ACGT" if b != ch]))
        elif r < 2 * err / 3:
            out.append(rng.choice("ACGT"))
            out.append(ch)
        elif r < err:
            continue
        else:
            out.append(ch)
    return "".join(out)


def _scenarios():
    """(ref_hap, alt_hap, read, miss, window) spanning the SV types."""
    rng = random.Random(42)
    cases = []
    for svtype in ("DEL", "INV", "DUP", "NONE"):
        for trial in range(3):
            # kept small: the reference cleaners are O(dots^2) in spots
            flank = rng.choice([60, 100])
            body_len = rng.choice([80, 140])
            left = "".join(rng.choice("ACGT") for _ in range(flank))
            body = "".join(rng.choice("ACGT") for _ in range(body_len))
            right = "".join(rng.choice("ACGT") for _ in range(flank))
            ref_hap = left + body + right
            if svtype == "DEL":
                alt_hap = left + right
            elif svtype == "INV":
                alt_hap = left + reverse_complement(body) + right
            elif svtype == "DUP":
                alt_hap = left + body * 2 + right
            else:
                alt_hap = ref_hap
            donor = alt_hap if trial % 2 == 0 else ref_hap
            read = _mutate(donor, rng, err=0.08)
            window = rng.choice([10, 15, 20])
            cases.append((ref_hap, alt_hap, read, 0, window))
    # edge flavors: Ns, IUPAC, lowercase, tiny read, miss offset
    base = "".join(random.Random(7).choice("ACGT") for _ in range(300))
    noisy = base[:50] + "NNNNNRYKM" + base[50:200].lower() + base[200:]
    cases.append((noisy, noisy[:180] + noisy[220:], _mutate(
        noisy, random.Random(8), 0.1), 0, 10))
    cases.append((base, base[:150] + base[250:],
                  _mutate(base, random.Random(9), 0.05), 37, 10))
    cases.append((base, base, "ACGTACGT", 0, 10))   # read shorter than k
    return cases


def test_dotdata_multiset(ref_mod):
    for ref_hap, alt_hap, read, miss, w in _scenarios():
        for hap in (ref_hap, alt_hap):
            expect = sorted(ref_mod.dotdata(w, read, hap[miss:]))
            got = sorted(oracle.dotdata(w, read, hap[miss:]))
            assert got == expect, f"dot multiset mismatch w={w}"


def test_self_dotdata_palindrome_multiplicity(ref_mod):
    # palindromic k-mers store their read position twice -> doubled dots
    seq = "ACGTACGTACGTAATTCCGGAATT" * 4
    expect = sorted(ref_mod.dotdata(10, seq, seq))
    got = sorted(oracle.dotdata(10, seq, seq))
    assert got == expect


def test_clean_diag_and_anti(ref_mod):
    for ref_hap, alt_hap, read, miss, w in _scenarios():
        dd = ref_mod.dotdata(w, read, ref_hap[miss:])
        if not dd:
            continue
        expect = sorted(tuple(x) for x in
                        ref_mod.clean_dotdata_diagnal_and_anti_diagnal(dd))
        W, _, _ = oracle.dot_weight_matrix(w, read, ref_hap[miss:])
        ii, jj, ww = oracle.dots_from_weights(W)
        m = oracle.clean_mask_diag_and_anti(ii, jj, ww)
        got = []
        for i, j, wt in zip(ii[m], jj[m], ww[m]):
            got.extend([(int(i), int(j))] * int(wt))
        assert sorted(got) == expect


def _expand(ii, jj, ww, mask):
    out = []
    for i, j, wt in zip(ii[mask], jj[mask], ww[mask]):
        out.extend([(int(i), int(j))] * int(wt))
    return sorted(out)


def test_clean_within10_stages(ref_mod):
    for ref_hap, alt_hap, read, miss, w in _scenarios():
        dd = ref_mod.dotdata(w, read, alt_hap[miss:])
        if not dd:
            continue
        clean1, _ = ref_mod.clean_dotdata_diagnal_m1b(dd)
        left = [i for i in dd if not list(i) in clean1]
        clean2, _ = ref_mod.clean_dotdata_anti_diagnal_m1b(left)
        expect = sorted(tuple(x) for x in (clean1 + clean2))
        W, _, _ = oracle.dot_weight_matrix(w, read, alt_hap[miss:])
        ii, jj, ww = oracle.dots_from_weights(W)
        m = oracle.clean_mask_within10(ii, jj, ww)
        assert _expand(ii, jj, ww, m) == expect


def test_metrics(ref_mod):
    rng = random.Random(3)
    for _ in range(20):
        n = rng.randint(1, 400)
        dots = [(rng.randint(0, 2000), rng.randint(0, 2000))
                for _ in range(n)]
        ii = np.array([d[0] for d in dots])
        jj = np.array([d[1] for d in dots])
        ww = np.ones(n, dtype=np.int64)
        assert oracle.eu_dis_abs(ii, jj, ww) == ref_mod.eu_dis_abs_calcu(dots)
        assert oracle.eu_dis_within_10perc(ii, jj, ww) == \
            ref_mod.eu_dis_dots_within_10perc(dots)
        c = ref_mod.dis_to_diagnal_most_abundant_defined(dots)
        assert oracle.most_abundant_intercept(ii, jj, ww) == c
        shifted = [[d[0] + c, d[1]] for d in dots]
        assert oracle.eu_dis_dir(ii.astype(float) + c, jj.astype(float),
                                 ww) == ref_mod.eu_dis_dir_calcu(shifted)


def test_scorers_exact(ref_mod):
    checked = {"m1b": 0, "w10": 0, "rdd": 0, "m1": 0, "m2": 0}
    for ref_hap, alt_hap, read, miss, w in _scenarios():
        x = [read, miss, "r"]
        e = ref_mod.calcu_vapor_single_read_score_abs_dis_m1b(
            ref_hap, alt_hap, x, w)
        g = oracle.score_abs_dis_m1b(ref_hap, alt_hap, read, miss, w)
        assert g == list(e)
        checked["m1b"] += e != [0, 0]

        e = ref_mod.calcu_vapor_single_read_score_within_10Perc_m1b(
            ref_hap, alt_hap, x, w)
        g = oracle.score_within_10perc_m1b(ref_hap, alt_hap, read, miss, w)
        assert g == list(e)
        checked["w10"] += e != [0, 0]

        e = ref_mod.calcu_vapor_single_read_score_directed_dis_m1b_redefine_diagnal(
            ref_hap, alt_hap, x, w)
        g = oracle.score_redefine_diagonal(ref_hap, alt_hap, read, miss, w)
        assert g == list(e)
        checked["rdd"] += e != [0, 0]

        e = ref_mod.calcu_vapor_single_read_score_abs_dis_m1(
            ref_hap, alt_hap, x, w)
        g = oracle.score_abs_dis_m1(ref_hap, alt_hap, read, miss, w)
        assert g == list(e)
        checked["m1"] += e != [0, 0]

        e = ref_mod.calcu_vapor_single_read_score_abs_dis_m2(
            ref_hap, alt_hap, x, w)
        g = oracle.score_abs_dis_m2(ref_hap, alt_hap, read, miss, w)
        assert g == list(e)
        checked["m2"] += e != [0, 0]
    # make sure the comparison exercised non-trivial paths
    assert checked["m1b"] >= 3 and checked["w10"] >= 3 and checked["rdd"] >= 1
