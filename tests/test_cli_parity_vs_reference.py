"""End-to-end `.vapor` parity: vapor-tpu CLI vs the reference CLI.

The reference needs only ``samtools faidx`` / ``samtools view`` from the
outside world; the shim + importable ``vapor_vali`` package assembly
lives in scripts/refcli.py (single source of truth, shared with
``accuracy_corpus.py --head-to-head``).  Both CLIs run on the same
synthetic fixture and must produce byte-identical `.vapor` output.
"""
import os
import pathlib
import sys

import pytest

from conftest import has_reference

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))
import refcli  # noqa: E402

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    root = tmp_path_factory.mktemp("refcli")
    return pathlib.Path(refcli.build_harness(str(root)))


def _run_reference(harness, mode, sv_input, ref_fa, bam, out_file):
    refcli.run_reference(str(harness), mode, sv_input, ref_fa, bam,
                         out_file, timeout=900)


def _run_ours(mode, sv_input, ref_fa, bam, out_path, out_file):
    from vapor_tpu.cli import main
    args = [mode, "--sv-input", sv_input, "--reference", ref_fa,
            "--pacbio-input", bam, "--output-path", out_path,
            "--output-file", out_file, "--backend", "numpy"]
    assert main(args) == 0


@pytest.mark.parametrize("svtype,s0,e0,seed,het", [
    ("DEL", 6000, 6300, 11, True),
    ("DEL", 6000, 6200, 12, False),
    ("INV", 6000, 6350, 13, True),
    ("DUP", 6000, 6250, 14, False),
])
def test_bed_parity(harness, tmp_path, svtype, s0, e0, seed, het):
    from golden_cases import build_bed_case
    case = build_bed_case(str(tmp_path), svtype, s0, e0, seed, het)
    bed = case["bed"]
    ref_out = str(tmp_path / "ref.vapor")
    our_out = str(tmp_path / "ours.vapor")
    _run_reference(harness, "bed", str(bed), case["fasta"], case["bam"],
                   ref_out)
    _run_ours("bed", str(bed), case["fasta"], case["bam"],
              str(tmp_path / "figs_ours"), our_out)
    expect = open(ref_out).read()
    got = open(our_out).read()
    assert got == expect
