"""Differential tests for grammar helpers + structure classifiers."""
import importlib.machinery
import importlib.util

import pytest

from conftest import REFERENCE_DIR, has_reference
from vapor_tpu.grammar import classify, letters

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_mod():
    loader = importlib.machinery.SourceFileLoader(
        "ref_sf_classify",
        f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx")
    spec = importlib.util.spec_from_loader("ref_sf_classify", loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod


LETTER_CASES = ["a", "ab", "abc", "a^", "ab^", "c^ba", "ac^b^", "abab",
                "ba", "aab", "abb", "b^a^", "abcd", "dcba", "a^b^c^"]


def test_letter_helpers(ref_mod):
    for s in LETTER_CASES:
        assert letters.letter_split(s) == ref_mod.letter_split(s)
        assert letters.letter_subgroup(s) == ref_mod.letter_subgroup(s)


def test_block_around_check(ref_mod):
    for alt, ref in [("abcab", "abcd"), ("ba", "ab"), ("aab", "ab"),
                     ("ab^", "ab"), ("b", "ab"), ("a", "ab"),
                     ("abab", "ab")]:
        assert letters.block_around_check(alt, ref) == \
            ref_mod.block_around_check(alt, ref)


def test_bp_to_chr_hash(ref_mod):
    chromos = ["chr1", "chr16"]
    bps = ["chr16", "34910548", "34911339", "34913149", "34913438"]
    assert letters.bp_to_chr_hash(bps, chromos, 500) == \
        ref_mod.bp_to_chr_hash(bps, chromos, 500)
    assert letters.bp_to_block_len(["chr1", 100, 300, 450]) == \
        ref_mod.bp_to_block_len(["chr1", 100, 300, 450])


def test_flank_length(ref_mod):
    for bps in [["c", 0, 40], ["c", 0, 99], ["c", 0, 100], ["c", 0, 499],
                ["c", 0, 500], ["c", 0, 5000]]:
        assert letters.flank_length_calculate(bps) == \
            ref_mod.flank_length_calculate(bps)


DIPLOID_CASES = [
    ("a/a", "/a"), ("a/a", "/"), ("ab/ab", "a/ab"), ("ab/ab", "b/ab"),
    ("abc/abc", "ac/abc"), ("abc/abc", "c/abc"), ("ab/ab", "ba/ab"),
    ("a/a", "a^/a"), ("ab/ab", "ab^/ab"), ("ab/ab", "b^a^/ab"),
    ("abc/abc", "ab^c/abc"), ("ab/ab", "abb/ab"), ("ab/ab", "aab/ab"),
    ("abc/abc", "abbc/abc"), ("ab/ab", "abab/ab"),
    ("abcd/abcd", "babcd/abcd"), ("ab/ab", "bab/ab"),
    ("abc/abc", "abcb/abc"), ("abcd/abcd", "abdcd/abcd"),
]


def test_simple_del_decide(ref_mod):
    for ref_s, alt_s in DIPLOID_CASES:
        assert classify.simple_del_decide(ref_s, alt_s) == \
            ref_mod.simple_del_diploid_decide(ref_s, alt_s)


def test_simple_inv_decide(ref_mod):
    for ref_s, alt_s in DIPLOID_CASES:
        assert classify.simple_inv_decide(ref_s, alt_s) == \
            ref_mod.simple_inv_diploid_decide(ref_s, alt_s)


def test_simple_tandup_decide(ref_mod):
    for ref_s, alt_s in DIPLOID_CASES:
        assert classify.simple_tandup_decide(ref_s, alt_s) == \
            ref_mod.simple_tandup_diploid_decide(ref_s, alt_s)


def test_simple_disdup_decide(ref_mod):
    for ref_s, alt_s in DIPLOID_CASES:
        assert classify.simple_disdup_decide(ref_s, alt_s) == \
            ref_mod.simple_disdup_diploid_decide(ref_s, alt_s)


def test_dup_block_combine(ref_mod):
    for dup, ref_h, alt_h in [(["a", "b"], "abcd", "abab"),
                              (["a"], "ab", "aab"),
                              (["b", "c"], "abcd", "abcbcd")]:
        assert classify.dup_block_combine(dup, ref_h, alt_h) == \
            ref_mod.dup_block_combine(dup, ref_h, alt_h)
