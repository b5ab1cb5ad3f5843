"""End-to-end `.vapor` parity: vapor-tpu CLI vs the reference CLI.

The reference needs only ``samtools faidx`` / ``samtools view`` from the
outside world, so we give it a shim backed by vapor_tpu's own readers,
assemble an importable ``vapor_vali`` package from the reference checkout
in a temp dir, run both CLIs on the same synthetic fixture, and require
byte-identical `.vapor` output.
"""
import os
import shutil
import subprocess
import sys

import pytest

from conftest import REFERENCE_DIR, has_reference

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]

SHIM = r'''#!/usr/bin/env python
import sys
sys.path.insert(0, "%(repo)s")
from vapor_tpu.io.fasta import FastaFile
from vapor_tpu.io.bam import BamReader

def parse_region(region):
    chrom, rng = region.rsplit(":", 1)
    s, e = rng.split("-")
    return chrom, int(s), int(e)

cmd = sys.argv[1]
if cmd == "faidx":
    path, region = sys.argv[2], sys.argv[3]
    chrom, s, e = parse_region(region)
    seq = FastaFile(path).fetch(chrom, s, e)
    print(">" + region)
    for i in range(0, len(seq), 60):
        print(seq[i:i + 60])
elif cmd == "view":
    path, region = sys.argv[2], sys.argv[3]
    chrom, s, e = parse_region(region)
    for rec in BamReader(path).fetch(chrom, s, e):
        print("\t".join([rec.name, str(rec.flag), chrom,
                         str(rec.pos0 + 1), str(rec.mapq), rec.cigar,
                         "*", "0", "0", rec.seq, "*"]))
'''


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    root = tmp_path_factory.mktemp("refcli")
    # samtools shim
    bindir = root / "bin"
    bindir.mkdir()
    shim = bindir / "samtools"
    shim.write_text(SHIM % {"repo": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))})
    shim.chmod(0o755)
    # importable reference package (Simple_function.pyx is plain Python)
    pkg = root / "vapor_vali"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    # scipy removed scipy.std; the reference still calls it (into an
    # unused variable) — shim it so the reference can run at all.
    src = open(f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx").read()
    shim_lines = ("import scipy as _scipy_shim\nimport numpy as _np_shim\n"
                  "_scipy_shim.std = _np_shim.std\n")
    lines = src.split("\n")
    insert_at = 1 if lines and lines[0].startswith("from __future__") else 0
    (pkg / "Simple_function.py").write_text(
        "\n".join(lines[:insert_at]) + "\n" + shim_lines +
        "\n".join(lines[insert_at:]))
    shutil.copy(f"{REFERENCE_DIR}/vapor_vali/prep.pyx", pkg / "prep.py")
    vapor_script = root / "vapor"
    shutil.copy(f"{REFERENCE_DIR}/vapor_vali/vapor", vapor_script)
    return root


def _run_reference(harness, mode, sv_input, ref_fa, bam, out_file):
    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    cmd = [sys.executable, str(harness / "vapor"), mode,
           "--sv-input", sv_input, "--reference", ref_fa,
           "--pacbio-input", bam, "--output-path",
           str(harness / f"figs_ref_{mode}"),
           "--output-file", out_file]
    subprocess.run(cmd, env=env, check=True, capture_output=True,
                   timeout=900)


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
