"""End-to-end VCF-mode parity vs the reference CLI: complex SV types.

Covers DEL, INV, TANDUP, INS (explicit sequence and unknown X-run),
DISDUP, DUP_INV, DEL_INV, letter-grammar 'Other' events, and the sub-50bp
NA path.  The reference's annotate step crashes on any header-bearing
VCF (data-row/line index mismatch, pyx:1985 vs vapor:132), but only
*after* the `.vapor` TSV is complete — so the TSV is the parity surface.
"""
import os
import subprocess
import sys

import pytest

from conftest import has_reference
from test_cli_parity_vs_reference import harness  # noqa: F401 (fixture)

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]

@pytest.fixture(scope="module")
def vcf_case(tmp_path_factory):
    from golden_cases import build_vcf_case
    return build_vcf_case(str(tmp_path_factory.mktemp("vcfcase")))


def test_vcf_mode_parity(harness, vcf_case, tmp_path, monkeypatch):
    # reference run (annotate step crashes after the TSV is written)
    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    ref_vcf = str(tmp_path / "ref_svs.vcf")
    with open(vcf_case["vcf"]) as f:
        open(ref_vcf, "w").write(f.read())
    proc = subprocess.run(
        [sys.executable, str(harness / "vapor"), "vcf",
         "--sv-input", ref_vcf, "--reference", vcf_case["fasta"],
         "--pacbio-input", vcf_case["bam"],
         "--output-path", str(tmp_path / "figs_ref"),
         "--output-file", "unused"],
        env=env, capture_output=True, text=True, timeout=1200)
    ref_out = ref_vcf + ".vapor"
    assert os.path.exists(ref_out), proc.stderr[-2000:]

    # our run with the annotate stage captured (it would overwrite
    # the TSV with the — correctly indexed — annotated VCF)
    import vapor_tpu.cli as cli
    monkeypatch.setattr(cli, "annotate_vcf", lambda *a, **k: None)
    my_vcf = str(tmp_path / "my_svs.vcf")
    with open(vcf_case["vcf"]) as f:
        open(my_vcf, "w").write(f.read())
    rc = cli.main(["vcf", "--sv-input", my_vcf,
                   "--reference", vcf_case["fasta"],
                   "--pacbio-input", vcf_case["bam"],
                   "--output-path", str(tmp_path / "figs_my"),
                   "--backend", "numpy"])
    assert rc == 0
    got = open(my_vcf + ".vapor").read()
    expect = open(ref_out).read()
    assert got == expect
