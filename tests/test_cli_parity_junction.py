"""Parity for junction/breakpoint fallback modes (SV span >= 10 kb) and
multi-BAM XXX patterns vs the reference CLI."""
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
def big_case(tmp_path_factory):
    from golden_cases import build_big_case
    return build_big_case(str(tmp_path_factory.mktemp("bigsv")))


def test_junction_mode_parity(harness, big_case, tmp_path):
    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    ref_out = str(tmp_path / "ref.vapor")
    subprocess.run(
        [sys.executable, str(harness / "vapor"), "bed",
         "--sv-input", big_case["bed"], "--reference", big_case["fasta"],
         "--pacbio-input", big_case["bam"],
         "--output-path", str(tmp_path / "figs_ref"),
         "--output-file", ref_out],
        env=env, check=True, capture_output=True, timeout=1200)
    from vapor_tpu.cli import main
    my_out = str(tmp_path / "my.vapor")
    assert main(["bed", "--sv-input", big_case["bed"],
                 "--reference", big_case["fasta"],
                 "--pacbio-input", big_case["bam"],
                 "--output-path", str(tmp_path / "figs_my"),
                 "--output-file", my_out, "--backend", "numpy"]) == 0
    expect = open(ref_out).read()
    got = open(my_out).read()
    assert got == expect
    # make sure the junction path actually scored something
    assert any(c not in ("NA",) for c in
               [l.split("\t")[5] for l in got.splitlines()[1:]])


def test_multibam_xxx_pattern(big_case, tmp_path):
    """--pacbio-input with XXX wildcard resolves every matching BAM."""
    import shutil
    bam_dir = tmp_path / "bams"
    bam_dir.mkdir()
    shutil.copy(big_case["bam"], bam_dir / "sample.chrS.bam")
    from vapor_tpu.io.reads import resolve_bam_inputs
    pattern = str(bam_dir / "sample.XXX.bam")
    assert resolve_bam_inputs(pattern) == [str(bam_dir / "sample.chrS.bam")]
    from vapor_tpu.cli import main
    out = str(tmp_path / "o.vapor")
    assert main(["bed", "--sv-input", big_case["bed"],
                 "--reference", big_case["fasta"],
                 "--pacbio-input", pattern,
                 "--output-path", str(tmp_path / "figs"),
                 "--output-file", out, "--backend", "numpy",
                 "--no-figures"]) == 0
    assert len(open(out).read().splitlines()) == 3
