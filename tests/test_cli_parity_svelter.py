"""Parity for svelter mode (letter-grammar events) vs the reference CLI,
plus a working-ins-mode (MELT) smoke test (the reference's ins mode is
broken, vapor:310, so only ours runs)."""
import os
import random
import subprocess
import sys

import pytest

from conftest import has_reference
from test_cli_parity_vs_reference import harness  # noqa: F401
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta, reverse_complement

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]


def _mk_reads(ref, donor, anchor, rng, n=8):
    out = []
    for i in range(n):
        src = donor if i % 2 == 0 else ref
        start = rng.randint(anchor - 1500, anchor - 900)
        t = src[start:start + 1700]
        seq = []
        for ch in t:
            x = rng.random()
            if x < 0.02:
                seq.append(rng.choice("ACGT"))
            elif x < 0.04:
                seq.append(rng.choice("ACGT"))
                seq.append(ch)
            elif x < 0.06:
                continue
            else:
                seq.append(ch)
        out.append((start, "".join(seq)))
    return out


def test_svelter_parity(harness, tmp_path):
    rng = random.Random(55)
    ref = "".join(rng.choice("ACGT") for _ in range(20000))
    # event: ab/ab -> b/ab at 8000/8200/8400 (hap1 deletes block a)
    donor = ref[:8000] + ref[8200:]
    reads = _mk_reads(ref, donor, 8000, rng)
    reads.sort(key=lambda r: r[0])
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chrS": ref})
    bam = str(tmp_path / "reads.bam")
    write_bam(bam, [("chrS", 20000)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    sv = tmp_path / "calls.svelter"
    sv.write_text("chr start end bps ref alt S1\n"
                  "chrS 8000 8400 chrS:8000:8200:8400 ab/ab b/ab 1\n")

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
    rng = random.Random(66)
    ref = "".join(rng.choice("ACGT") for _ in range(12000))
    ins_seq = "".join(rng.choice("ACGT") for _ in range(240))
    donor = ref[:6000] + ins_seq + ref[6000:]
    reads = _mk_reads(ref, donor, 6000, rng)
    reads.sort(key=lambda r: r[0])
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chrM1": ref})
    bam = str(tmp_path / "reads.bam")
    write_bam(bam, [("chrM1", 12000)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    prefix = str(tmp_path / "melt.sites")
    with open(prefix + ".vcf", "w") as fo:
        fo.write("##fileformat=VCFv4.2\n"
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                 f"chrM1\t6000\tmei1\tINS\t<INS:ME>\t99\tPASS\t"
                 f"SVLEN={len(ins_seq)};MEIINFO=ALU,+\n")
    write_fasta(prefix + ".fa", {"chrM1_6000": ins_seq})

    from vapor_tpu.cli import main
    assert main(["ins", "--sv-input", prefix, "--reference", fa,
                 "--pacbio-input", bam,
                 "--output-path", str(tmp_path / "figs"),
                 "--backend", "numpy", "--no-figures"]) == 0
    rows = open(prefix + ".vapor").read().splitlines()
    assert len(rows) == 2
    cols = rows[1].split("\t")
    assert cols[0] == "chrM1_6000"
    assert cols[1] != "NA" and float(cols[2]) >= 0.4  # het support