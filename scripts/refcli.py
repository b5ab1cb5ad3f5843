"""Reusable reference-CLI harness (shared by scripts and the refcli
differential test suites).

The reference needs only ``samtools faidx`` / ``samtools view`` from
the outside world (Simple_function.pyx:339, 1206), so we give it a
shim backed by vapor_tpu's own readers, assemble an importable
``vapor_vali`` package from the reference checkout in a scratch dir
(the .pyx is plain Python), patch the removed ``scipy.std``, and run
the reference ``vapor`` script as a subprocess.
"""
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("VAPOR_REFERENCE_DIR", "/root/reference")

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


def has_reference() -> bool:
    return os.path.exists(
        os.path.join(REFERENCE_DIR, "vapor_vali", "Simple_function.pyx"))


def build_harness(root: str) -> str:
    """Assemble the samtools shim + importable reference package under
    ``root``; returns ``root`` (pass to run_reference)."""
    os.makedirs(root, exist_ok=True)
    bindir = os.path.join(root, "bin")
    os.makedirs(bindir, exist_ok=True)
    shim = os.path.join(bindir, "samtools")
    with open(shim, "w") as f:
        f.write(SHIM % {"repo": REPO})
    os.chmod(shim, 0o755)
    pkg = os.path.join(root, "vapor_vali")
    os.makedirs(pkg, exist_ok=True)
    open(os.path.join(pkg, "__init__.py"), "w").write("")
    # scipy removed scipy.std; the reference still calls it (into an
    # unused variable) — shim it so the reference can run at all.
    src = open(os.path.join(REFERENCE_DIR, "vapor_vali",
                            "Simple_function.pyx")).read()
    shim_lines = ("import scipy as _scipy_shim\n"
                  "import numpy as _np_shim\n"
                  "_scipy_shim.std = _np_shim.std\n")
    lines = src.split("\n")
    at = 1 if lines and lines[0].startswith("from __future__") else 0
    with open(os.path.join(pkg, "Simple_function.py"), "w") as f:
        f.write("\n".join(lines[:at]) + "\n" + shim_lines +
                "\n".join(lines[at:]))
    shutil.copy(os.path.join(REFERENCE_DIR, "vapor_vali", "prep.pyx"),
                os.path.join(pkg, "prep.py"))
    shutil.copy(os.path.join(REFERENCE_DIR, "vapor_vali", "vapor"),
                os.path.join(root, "vapor"))
    return root


def run_reference(harness: str, mode: str, sv_input: str, ref_fa: str,
                  bam: str, out_file: str, timeout: int = 14400,
                  quiet: bool = True) -> None:
    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    figs = os.path.join(harness, f"figs_ref_{mode}")
    os.makedirs(figs, exist_ok=True)
    cmd = [sys.executable, os.path.join(harness, "vapor"), mode,
           "--sv-input", sv_input, "--reference", ref_fa,
           "--pacbio-input", bam, "--output-path", figs,
           "--output-file", out_file]
    subprocess.run(cmd, env=env, check=True, capture_output=quiet,
                   timeout=timeout)
