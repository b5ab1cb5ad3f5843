"""Vendored golden-fixture compatibility: the reference's committed test
inputs must parse into the same worklists the reference builds."""
import os

import pytest

from conftest import REFERENCE_DIR, has_reference
from vapor_tpu.io.parsers import vcf_list_readin

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def test_vapor_test_bed_parses():
    # the committed vapor_test.bed is 4-col (type in col 4)
    from vapor_tpu.io.parsers import bed4_info_readin
    events = bed4_info_readin(os.path.join(FIXTURES, "vapor_test.bed"))
    assert len(events) == 19
    assert {e[-1] for e in events} == {"/a", "a/a^"}
    assert events[0][:3] == ["chr10", 121153956, 121154250]


def test_vapor_test_vcf_parses():
    worklist, rec_hash = vcf_list_readin(
        os.path.join(FIXTURES, "vapor_test.vcf"))
    assert set(worklist) <= {"DEL", "INV", "INS", "DISDUP", "DEL_INV",
                             "DUP_INV", "TANDUP", "Other"}
    total = sum(len(v) for v in worklist.values())
    assert total > 50
    assert len(rec_hash) >= total  # duplicate positions dedup'd
    # complex letter-grammar events present
    assert "Other" in worklist
    assert all(len(e) >= 4 for e in worklist["Other"])


@pytest.mark.skipif(not has_reference(), reason="reference absent")
def test_vcf_worklist_matches_reference_shape():
    """The reference's own vcf parser (run in-process) must produce the
    same grouped worklist from the golden VCF."""
    import importlib.machinery
    import importlib.util
    import shutil
    import sys
    import tempfile
    import types

    # the parser lives in the CLI script; emulate its imports
    loader = importlib.machinery.SourceFileLoader(
        "ref_sf_fix", f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx")
    spec = importlib.util.spec_from_loader("ref_sf_fix", loader)
    sf = importlib.util.module_from_spec(spec)
    import numpy as np
    import scipy
    scipy.std = np.std
    loader.exec_module(sf)

    # minimal re-execution of vcf_list_readin from the vapor script
    src = open(f"{REFERENCE_DIR}/vapor_vali/vapor").read()
    ns = {"svtype_extract": sf.svtype_extract,
          "chr_start_end_extract": sf.chr_start_end_extract,
          "sv_len_extract": sf.sv_len_extract,
          "sv_seq_extract": sf.sv_seq_extract,
          "sv_insert_point_define": sf.sv_insert_point_define}
    start = src.index("def block_reorganize")
    end = src.index("def file_initiate")
    exec(src[start:end].replace("\t", "    "), ns)  # noqa: S102
    ref_out, ref_hash = ns["vcf_list_readin"](
        os.path.join(FIXTURES, "vapor_test.vcf"))

    mine, my_hash = vcf_list_readin(os.path.join(FIXTURES,
                                                 "vapor_test.vcf"))
    assert mine == ref_out
    assert my_hash == ref_hash


@pytest.mark.skipif(not has_reference(), reason="reference absent")
def test_legacy_genotype_extractors():
    import importlib.machinery
    import importlib.util
    import numpy as np
    import scipy
    scipy.std = np.std
    loader = importlib.machinery.SourceFileLoader(
        "ref_sf_geno", f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx")
    spec = importlib.util.spec_from_loader("ref_sf_geno", loader)
    sf = importlib.util.module_from_spec(spec)
    loader.exec_module(sf)
    from vapor_tpu.io.parsers import geno_cn_extract, genotype_extract
    rows = [
        ["c", "1", "i", "N", "<D>", "9", "P", "X", "GT", "0/1", "1|1"],
        ["c", "1", "i", "N", "<D>", "9", "P", "X", "GT:CN", "./.:2",
         "1/0:3"],
        ["c", "1", "i", "N", "<D>", "9", "P", "X", "GT", "."],
    ]
    for pin in rows:
        assert genotype_extract(pin) == sf.genotype_extract(pin)
        assert geno_cn_extract(pin) == sf.genoCN_extract(pin)
