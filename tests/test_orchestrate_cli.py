"""Tests for scatter/merge orchestration, pdf mode, and --resume."""
import os

from vapor_tpu.cli import main
from vapor_tpu.orchestrate import merge_outputs, split_by_contig
from vapor_tpu.sim.synth import build_test_case


def _case(tmp_path):
    return build_test_case(str(tmp_path), genome_len=16000,
                           sv=("DEL", 7000, 7300), read_len=2200,
                           n_donor=6, n_ref=6, seed=21)


def test_split_and_merge(tmp_path):
    bed = tmp_path / "w.bed"
    bed.write_text("chr2\t10\t20\tA\tDEL\nchr10\t5\t9\tB\tDEL\n"
                   "chr2\t30\t40\tC\tINV\n")
    shards = split_by_contig(str(bed), str(tmp_path / "sh"))
    assert set(shards) == {"chr2", "chr10"}
    assert len(open(shards["chr2"]).readlines()) == 2
    # merge honors version sort (chr2 < chr10) and numeric positions
    a = tmp_path / "a.vapor"
    b = tmp_path / "b.vapor"
    a.write_text("#H\nchr10\t5\t9\tDEL\tB\t0\t0\t0/0\t1\t0\n")
    b.write_text("#H\nchr2\t30\t40\tINV\tC\t0\t0\t0/0\t1\t0\n"
                 "chr2\t10\t20\tDEL\tA\t0\t0\t0/0\t1\t0\n")
    out = tmp_path / "merged.vapor"
    merge_outputs([str(a), str(b)], str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "#H"
    assert [l.split("\t")[0] for l in lines[1:]] == \
        ["chr2", "chr2", "chr10"]
    assert [l.split("\t")[1] for l in lines[1:]] == ["10", "30", "5"]


def test_scatter_mode(tmp_path):
    case = _case(tmp_path)
    bed = tmp_path / "svs.bed"
    bed.write_text("chrS\t7000\t7300\tSV1\tDEL\n")
    out = str(tmp_path / "merged.vapor")
    rc = main(["scatter", "--sv-input", str(bed),
               "--reference", case["fasta"],
               "--pacbio-input", case["bam"],
               "--output-path", str(tmp_path / "work"),
               "--output-file", out, "--backend", "numpy",
               "--no-figures", "--jobs", "2"])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert lines[0].startswith("#CHR")
    assert len(lines) == 2 and "DEL" in lines[1]


def test_pdf_mode(tmp_path):
    case = _case(tmp_path)
    bed = tmp_path / "svs4.bed"
    bed.write_text("chrS\t7000\t7300\tDEL\nchrS\t9000\t9050\tINV\n")
    rc = main(["pdf", "--sv-input", str(bed),
               "--reference", case["fasta"],
               "--pacbio-input", case["bam"],
               "--output-path", str(tmp_path / "figs"),
               "--backend", "numpy", "--PB-supp", "3",
               "--sv-type", "DEL"])
    assert rc == 0
    out = str(bed) + ".vapor"
    lines = open(out).read().splitlines()
    assert len(lines) == 2  # header + the DEL row (INV filtered out)
    figs = os.listdir(tmp_path / "figs")
    assert all(f.endswith(".pdf") for f in figs)


def test_resume(tmp_path):
    case = _case(tmp_path)
    bed = tmp_path / "svs.bed"
    bed.write_text("chrS\t7000\t7300\tSV1\tDEL\n"
                   "chrS\t9000\t9200\tSV2\tINV\n")
    out = str(tmp_path / "o.vapor")
    common = ["bed", "--sv-input", str(bed), "--reference",
              case["fasta"], "--pacbio-input", case["bam"],
              "--output-path", str(tmp_path / "figs"),
              "--output-file", out, "--backend", "numpy",
              "--no-figures"]
    assert main(common) == 0
    full = open(out).read()
    # truncate to header + first row, then resume
    lines = full.splitlines(keepends=True)
    open(out, "w").writelines(lines[:2])
    assert main(common + ["--resume"]) == 0
    assert open(out).read() == full

def test_missing_inputs_clean_errors(capsys):
    assert main(["bed", "--sv-input", "/nope.bed", "--reference",
                 "/nope.fa", "--pacbio-input", "/nope.bam",
                 "--output-path", "/tmp/x", "--output-file",
                 "/tmp/x.vapor"]) == 2


def test_ins_negative_polarity(tmp_path):
    """MELT '-' strand inserts score via the reverse complement."""
    import random
    from vapor_tpu.io.bam import BamRecord, write_bam
    from vapor_tpu.io.fasta import write_fasta, reverse_complement
    from vapor_tpu.validators import ValidatorContext
    rng = random.Random(88)
    ref = "".join(rng.choice("ACGT") for _ in range(12000))
    ins = "".join(rng.choice("ACGT") for _ in range(220))
    donor = ref[:6000] + reverse_complement(ins) + ref[6000:]
    reads = []
    for i in range(8):
        src = donor if i % 2 == 0 else ref
        start = rng.randint(4500, 5100)
        seq = src[start:start + 1800]
        reads.append((start, seq))
    reads.sort(key=lambda r: r[0])
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, {"cP": ref})
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("cP", 12000)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    ctx = ValidatorContext(fa, bam, backend="numpy", figures=False)
    plus = ctx.validate_ins(3, "cP_6000", ins, "+")
    minus = ctx.validate_ins(3, "cP_6000", ins, "-")
    # donor carries revcomp(ins): '-' polarity must find support
    assert max(minus) > 0.5
    assert sum(1 for s in minus if s > 0) >= 3
    assert plus != minus
