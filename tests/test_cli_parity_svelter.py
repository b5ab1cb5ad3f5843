"""Parity for svelter mode (letter-grammar events) vs the reference CLI,
plus a working-ins-mode (MELT) smoke test (the reference's ins mode is
broken, vapor:310, so only ours runs)."""
import os
import subprocess
import sys

import pytest

from conftest import has_reference
from test_cli_parity_vs_reference import harness  # noqa: F401

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]


def test_svelter_parity(harness, tmp_path):
    from golden_cases import build_svelter_case
    case = build_svelter_case(str(tmp_path))
    fa, bam, sv = case["fasta"], case["bam"], case["svelter"]

    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    ref_out = str(tmp_path / "ref.out")
    subprocess.run(
        [sys.executable, str(harness / "vapor"), "svelter",
         "--sv-input", str(sv), "--reference", fa, "--pacbio-input", bam,
         "--output-path", str(tmp_path / "figs_ref"),
         "--output-file", ref_out],
        env=env, check=True, capture_output=True, timeout=900)

    from vapor_tpu.cli import main
    my_out = str(tmp_path / "my.out")
    assert main(["svelter", "--sv-input", str(sv), "--reference", fa,
                 "--pacbio-input", bam,
                 "--output-path", str(tmp_path / "figs_my"),
                 "--output-file", my_out, "--backend", "numpy"]) == 0
    assert open(my_out).read() == open(ref_out).read()


def test_ins_melt_mode(tmp_path):
    from golden_cases import build_melt_case, run_melt_case
    case = build_melt_case(str(tmp_path))
    rows = run_melt_case(str(tmp_path), case).splitlines()
    assert len(rows) == 2
    cols = rows[1].split("\t")
    assert cols[0] == "chrM1_6000"
    assert cols[1] != "NA" and float(cols[2]) >= 0.4  # het support