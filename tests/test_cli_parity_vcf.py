"""End-to-end VCF-mode parity vs the reference CLI: complex SV types.

Covers DEL, INV, TANDUP, INS (explicit sequence and unknown X-run),
DISDUP, DUP_INV, DEL_INV, letter-grammar 'Other' events, and the sub-50bp
NA path.  The reference's annotate step crashes on any header-bearing
VCF (data-row/line index mismatch, pyx:1985 vs vapor:132), but only
*after* the `.vapor` TSV is complete — so the TSV is the parity surface.
"""
import os
import random
import subprocess
import sys

import pytest

from conftest import has_reference
from test_cli_parity_vs_reference import harness  # noqa: F401 (fixture)
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta, reverse_complement

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]

GENOME_LEN = 40000
READ_LEN = 1700


def _reads_for(ref, donor, anchor0, rng, n=8, het=True):
    """Spanning reads entering the window left of anchor0."""
    out = []
    for i in range(n):
        src = donor if (not het or i % 2 == 0) else ref
        start = rng.randint(max(0, anchor0 - 1500), max(1, anchor0 - 900))
        template = src[start:start + READ_LEN]
        seq = []
        for ch in template:
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


@pytest.fixture(scope="module")
def vcf_case(tmp_path_factory):
    rng = random.Random(77)
    d = tmp_path_factory.mktemp("vcfcase")
    ref = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    contig = "chrS"
    reads = []
    records = []

    def add_reads(donor, anchor):
        for start, seq in _reads_for(ref, donor, anchor, rng):
            reads.append((start, seq))

    # DEL 4000-4300
    add_reads(ref[:4000] + ref[4300:], 4000)
    records.append(("chrS", 4001, "d1", "SVTYPE=DEL;END=4300"))
    # INV 8000-8350
    add_reads(ref[:8000] + reverse_complement(ref[8000:8350]) + ref[8350:],
              8000)
    records.append(("chrS", 8001, "v1", "SVTYPE=INV;END=8350"))
    # TANDUP 12000-12250
    add_reads(ref[:12250] + ref[12000:12250] + ref[12250:], 12000)
    records.append(("chrS", 12001, "t1", "SVTYPE=DUP;END=12250"))
    # INS with explicit sequence at 16000
    ins_seq = "".join(rng.choice("ACGT") for _ in range(260))
    add_reads(ref[:16000] + ins_seq + ref[16000:], 16000)
    records.append(("chrS", 16001, "i1",
                    f"SVTYPE=INS;END=16001;SVLEN=260;SEQ={ins_seq}"))
    # INS unknown sequence (X-run) at 19000
    ins2 = "".join(rng.choice("ACGT") for _ in range(180))
    add_reads(ref[:19000] + ins2 + ref[19000:], 19000)
    records.append(("chrS", 19001, "i2", "SVTYPE=INS;END=19001;SVLEN=180"))
    # DISDUP: dup 22000-22200 inserted at 23000 (a b a)
    add_reads(ref[:23000] + ref[22000:22200] + ref[23000:], 22000)
    records.append(("chrS", 22001, "dd1",
                    "SVTYPE=disdup;END=22200;insert_point=chrS:23000"))
    # DUP_INV: dup 26000-26150 inverted-inserted at 27000
    add_reads(ref[:27000] + reverse_complement(ref[26000:26150])
              + ref[27000:], 26000)
    records.append(("chrS", 26001, "di1",
                    "SVTYPE=dup_inv;END=26150;insert_point=chrS:27000"))
    # DEL_INV: del 30000-30200 + inv 30200-30350 (adjacent)
    add_reads(ref[:30000] + reverse_complement(ref[30200:30350])
              + ref[30350:], 30000)
    records.append(("chrS", 30001, "dv1",
                    "SVTYPE=del_inv;END=30350;"
                    "del=chrS:30000-30200;inv=chrS:30200-30350"))
    # Other: ab/ab -> ab/ba block swap at 34000/34150/34300
    add_reads(ref[:34000] + ref[34150:34300] + ref[34000:34150]
              + ref[34300:], 34000)
    records.append(("chrS", 34001, "o1",
                    "SVTYPE=cannot_classify;END=34300;"
                    "Other=ab/ab_ab/ba_chrS:34000:34150:34300"))
    # sub-50bp DEL and INV -> NA rows
    records.append(("chrS", 37001, "s1", "SVTYPE=DEL;END=37030"))
    records.append(("chrS", 37501, "s2", "SVTYPE=INV;END=37530"))

    fa = str(d / "ref.fa")
    write_fasta(fa, {contig: ref})
    reads.sort(key=lambda r: r[0])
    bam = str(d / "reads.bam")
    write_bam(bam, [(contig, GENOME_LEN)], [
        BamRecord(name=f"r{i}", flag=0, ref_id=0, pos0=p, mapq=60,
                  cigar=f"{len(s)}M", seq=s, qual=b"")
        for i, (p, s) in enumerate(reads)])

    lines = ["##fileformat=VCFv4.2",
             f"##contig=<ID={contig},length={GENOME_LEN}>",
             '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
             '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"]
    for chrom, pos, vid, info in records:
        lines.append(f"{chrom}\t{pos}\t{vid}\tN\t<SV>\t99\tPASS\t{info}"
                     f"\tGT\t0/1")
    vcf = str(d / "svs.vcf")
    with open(vcf, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return {"dir": d, "fasta": fa, "bam": bam, "vcf": vcf}


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
