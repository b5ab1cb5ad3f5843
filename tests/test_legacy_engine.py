"""Differential tests for legacy engine utilities vs the reference."""
import importlib.machinery
import importlib.util
import random

import pytest

from conftest import REFERENCE_DIR, has_reference
from vapor_tpu.engine import legacy

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_mod():
    import numpy as np
    import scipy
    scipy.std = np.std
    loader = importlib.machinery.SourceFileLoader(
        "ref_sf_legacy",
        f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx")
    spec = importlib.util.spec_from_loader("ref_sf_legacy", loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod


def _dots(rng, n, spread=2000):
    return [(rng.randint(0, spread), rng.randint(0, spread))
            for _ in range(n)]


def test_edit_distance(ref_mod):
    rng = random.Random(1)
    for _ in range(8):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 12)))
        b = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 12)))
        assert legacy.edit_distance(a, b) == ref_mod.edit_dis_setup(a, b)


def test_directed_and_regression_metrics(ref_mod):
    rng = random.Random(2)
    for i in range(10):
        dots = _dots(rng, rng.randint(3, 200))
        assert legacy.eu_dis_dir_calcu(dots) == \
            ref_mod.eu_dis_dir_calcu(dots)
        assert legacy.eu_y_vs_x_ratio_calcu(dots) == \
            ref_mod.eu_y_vs_x_ratio_calcu(dots)
        assert legacy.eu_dis_reg_calcu(dots) == \
            ref_mod.eu_dis_reg_calcu(dots)


def test_region_metrics(ref_mod, capsys):
    rng = random.Random(3)
    for _ in range(6):
        dots = sorted(_dots(rng, 80, spread=1000))
        bps = sorted(rng.sample(range(0, 1000), 4))
        got = legacy.eu_dis_region_calcu(dots, bps)
        expect = ref_mod.eu_dis_region_calcu(dots, bps)
        assert got == expect
        blocks = [[100, 300], [500, 800]]
        assert legacy.eu_dis_reg_dup_block_calcu(dots, blocks) == \
            ref_mod.eu_dis_reg_dup_block_calcu(dots, blocks)
    capsys.readouterr()


def test_line_recognizers(ref_mod):
    rng = random.Random(4)
    # synthesize dot clouds with embedded line segments
    for _ in range(5):
        dots = []
        for _ in range(3):
            x0 = rng.randint(0, 800)
            y0 = rng.randint(0, 800)
            dots += [(x0 + t, y0 + t) for t in range(rng.randint(15, 60))]
        dots += _dots(rng, 30, spread=900)
        assert legacy.dot_to_line(dots) == ref_mod.dot_to_line(dots)
        assert legacy.ref_ref_deviate_lines(dots) == \
            ref_mod.ref_ref_deviate_lines_calcu(dots)


def test_two_dimension_cluster(ref_mod):
    rng = random.Random(5)
    dim1 = [rng.randint(0, 300) for _ in range(120)]
    assert legacy.one_dimension_cluster_by_gap(dim1, 20, 5) == \
        ref_mod.one_dimention_cluster_by_gap(dim1, 20, 5)


def test_inventory_stragglers(ref_mod):
    rng = random.Random(12)
    dots = sorted(_dots(rng, 120, spread=900))
    dim1 = [d[1] - d[0] for d in dots]
    dim2 = [d[1] + d[0] for d in dots]
    assert legacy.two_dimension_cluster_by_gap(dim1, dim2, 30, 4) == \
        ref_mod.two_dimention_cluster_by_gap(dim1, dim2, 30, 4)
    tup_dots = [tuple(d) for d in dots]
    assert legacy.take_off_symmetric_dots(tup_dots) == \
        ref_mod.take_off_symmetric_dots(tup_dots)
    assert legacy.quality_filter(dots) == ref_mod.quality(dots)
    sv_info = ["chr1", 114103333, 114103408, "chr1", 114111746]
    for alt in (["a", "b", "a^"], ["a", "a^"]):
        assert legacy.dup_inv_ref_alt_bps(sv_info, 75, alt) == \
            ref_mod.dup_inv_ref_alt_bps_produce(list(sv_info), 75, alt)
        assert legacy.dup_inv_dup_bps(sv_info, 75, alt) == \
            ref_mod.dup_inv_dup_bps_produce(list(sv_info), 75, alt)


def test_directed_scorer(ref_mod):
    import random as _r
    from vapor_tpu.engine import oracle
    rng = _r.Random(44)
    body = "".join(rng.choice("ACGT") for _ in range(140))
    left = "".join(rng.choice("ACGT") for _ in range(110))
    right = "".join(rng.choice("ACGT") for _ in range(110))
    ref_hap = left + body + right
    alt_hap = left + body + body + right
    checked = 0
    for i in range(4):
        donor = alt_hap if i % 2 == 0 else ref_hap
        read = "".join(c for c in donor if rng.random() > 0.04)
        e = ref_mod.calcu_vapor_single_read_score_directed_dis_m1b(
            ref_hap, alt_hap, [read, 0, "r"], 10)
        g = oracle.score_directed_m1b(ref_hap, alt_hap, read, 0, 10)
        assert [float(x) for x in g] == [float(x) for x in e]
        checked += e != [0, 0]
    assert checked >= 1
