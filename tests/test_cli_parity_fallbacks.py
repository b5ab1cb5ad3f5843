"""Parity for validator fallback branches vs the reference CLI:

* DISDUP with span > 10 kb  -> insertion-point junction mode
* DISDUP whole-region read-starved -> insertion-point m1b mode
* DUP_INV with span > 10 kb -> inverted-junction within-10% mode
* INS with sequence >= 5 kb -> ref-only window QC branch
"""
import os
import subprocess
import sys

import pytest

from conftest import has_reference
from test_cli_parity_vs_reference import harness  # noqa: F401

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]

@pytest.fixture(scope="module")
def fb_case(tmp_path_factory):
    from golden_cases import build_fb_case
    return build_fb_case(str(tmp_path_factory.mktemp("fallbacks")))


def test_fallback_parity(harness, fb_case, tmp_path, monkeypatch):
    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    ref_vcf = str(tmp_path / "ref_svs.vcf")
    open(ref_vcf, "w").write(open(fb_case["vcf"]).read())
    subprocess.run(
        [sys.executable, str(harness / "vapor"), "vcf",
         "--sv-input", ref_vcf, "--reference", fb_case["fasta"],
         "--pacbio-input", fb_case["bam"],
         "--output-path", str(tmp_path / "figs_ref"),
         "--output-file", "unused"],
        env=env, capture_output=True, text=True, timeout=1800)
    ref_out = ref_vcf + ".vapor"
    assert os.path.exists(ref_out)

    import vapor_tpu.cli as cli
    monkeypatch.setattr(cli, "annotate_vcf", lambda *a, **k: None)
    my_vcf = str(tmp_path / "my_svs.vcf")
    open(my_vcf, "w").write(open(fb_case["vcf"]).read())
    assert cli.main(["vcf", "--sv-input", my_vcf,
                     "--reference", fb_case["fasta"],
                     "--pacbio-input", fb_case["bam"],
                     "--output-path", str(tmp_path / "figs_my"),
                     "--backend", "numpy"]) == 0
    got = open(my_vcf + ".vapor").read()
    expect = open(ref_out).read()
    assert got == expect
    # at least one fallback path must have produced real scores
    scored = [l for l in got.splitlines()[1:]
              if l.split("\t")[1] not in ("NA",)]
    assert scored, got
