"""Parity for validator fallback branches vs the reference CLI:

* DISDUP with span > 10 kb  -> insertion-point junction mode
* DISDUP whole-region read-starved -> insertion-point m1b mode
* DUP_INV with span > 10 kb -> inverted-junction within-10% mode
* INS with sequence >= 5 kb -> ref-only window QC branch
"""
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

GENOME_LEN = 80000
READ_LEN = 1700


def _noisy(t, rng):
    out = []
    for ch in t:
        x = rng.random()
        if x < 0.02:
            out.append(rng.choice("ACGT"))
        elif x < 0.04:
            out.append(rng.choice("ACGT"))
            out.append(ch)
        elif x < 0.06:
            continue
        else:
            out.append(ch)
    return "".join(out)


def _span_reads(ref, donor, anchor0, rng, n=8):
    out = []
    for i in range(n):
        src = donor if i % 2 == 0 else ref
        start = rng.randint(anchor0 - 1500, anchor0 - 900)
        out.append((start, _noisy(src[start:start + READ_LEN], rng)))
    return out


@pytest.fixture(scope="module")
def fb_case(tmp_path_factory):
    rng = random.Random(808)
    d = tmp_path_factory.mktemp("fallbacks")
    ref = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    reads = []
    records = []

    # DISDUP span > 10k: dup 5000-5200 inserted at 18000
    donor = ref[:18000] + ref[5000:5200] + ref[18000:]
    reads += _span_reads(ref, donor, 18000, rng)
    records.append(("chrS", 5001, "ddL",
                    "SVTYPE=disdup;END=5200;insert_point=chrS:18000"))

    # DUP_INV span > 10k: dup 25000-25150 inverted-inserted at 38000
    donor2 = ref[:38000] + reverse_complement(ref[25000:25150]) + \
        ref[38000:]
    reads += _span_reads(ref, donor2, 38000, rng)
    records.append(("chrS", 25001, "diL",
                    "SVTYPE=dup_inv;END=25150;insert_point=chrS:38000"))

    # long INS (>= 5000): window QC uses the ref-only branch
    ins_seq = "".join(rng.choice("ACGT") for _ in range(5200))
    donor3 = ref[:50000] + ins_seq + ref[50000:]
    reads += _span_reads(ref, donor3, 50000, rng)
    records.append(("chrS", 50001, "insL",
                    f"SVTYPE=INS;END=50001;SVLEN={len(ins_seq)};"
                    f"SEQ={ins_seq}"))

    # DISDUP read-starved whole region: dup 62000-62150 at 64000 but
    # only reads near the insertion point (none span the whole region
    # start) — whole-event gate fails on reads, run_flag stays 0
    donor4 = ref[:64000] + ref[62000:62150] + ref[64000:]
    for i in range(8):
        start = rng.randint(64000 - 1400, 64000 - 1000)
        src = donor4 if i % 2 == 0 else ref
        reads.append((start, _noisy(src[start:start + READ_LEN], rng)))
    records.append(("chrS", 62001, "ddS",
                    "SVTYPE=disdup;END=62150;insert_point=chrS:64000"))

    reads.sort(key=lambda r: r[0])
    fa = str(d / "ref.fa")
    write_fasta(fa, {"chrS": ref})
    bam = str(d / "reads.bam")
    write_bam(bam, [("chrS", GENOME_LEN)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    lines = ["##fileformat=VCFv4.2",
             f"##contig=<ID=chrS,length={GENOME_LEN}>",
             '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
             '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    for chrom, pos, vid, info in records:
        lines.append(f"{chrom}\t{pos}\t{vid}\tN\t<SV>\t99\tPASS\t{info}"
                     f"\tGT\t0/1")
    vcf = str(d / "svs.vcf")
    open(vcf, "w").write("\n".join(lines) + "\n")
    return {"fasta": fa, "bam": bam, "vcf": vcf}


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
