"""I/O layer tests: FASTA faidx semantics, BAM round-trip, CIGAR clip."""
import random

import pytest

from vapor_tpu.io.bam import BamReader, BamRecord, write_bam
from vapor_tpu.io.cigar import cigar_align_start, clip_read_to_window
from vapor_tpu.io.fasta import FastaFile, write_fasta, reverse_complement
from vapor_tpu.io.reads import (collect_event_reads, extract_spanning_reads,
                                subsample_reads)
from vapor_tpu.sim.synth import build_test_case, random_genome


def test_fasta_roundtrip(tmp_path):
    genome = random_genome(5000, seed=1)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, genome)
    f = FastaFile(fa)
    ref = genome["chrS"]
    # 1-based inclusive
    assert f.fetch("chrS", 1, 10) == ref[0:10]
    assert f.fetch("chrS", 101, 160) == ref[100:160]
    # spans a line boundary (width 60)
    assert f.fetch("chrS", 55, 125) == ref[54:125]
    # clamping like samtools faidx
    assert f.fetch("chrS", -100, 10) == ref[0:10]
    assert f.fetch("chrS", 4995, 99999) == ref[4994:]
    assert f.fetch("chrS", 10, 5) == ""
    assert f.fetch("nope", 1, 10) == ""
    # revcomp
    assert f.fetch("chrS", 11, 20, revcomp=True) == \
        reverse_complement(ref[10:20])
    assert f.references == ["chrS"]


def test_fasta_multi_contig(tmp_path):
    contigs = {"c1": "ACGT" * 100, "c2": "TTTTGGGGCCCC" * 33}
    fa = str(tmp_path / "m.fa")
    write_fasta(fa, contigs, width=17)
    f = FastaFile(fa)
    assert f.references == ["c1", "c2"]
    assert f.fetch("c2", 5, 30) == contigs["c2"][4:30]
    assert f.contig_length("c1") == 400


def test_bam_roundtrip(tmp_path):
    rng = random.Random(2)
    refs = [("chrS", 100000)]
    records = []
    pos = 100
    for i in range(50):
        seq = "".join(rng.choice("ACGT") for _ in range(rng.randint(80, 300)))
        records.append(BamRecord(
            name=f"r{i}", flag=0, ref_id=0, pos0=pos, mapq=60,
            cigar=f"{len(seq)}M", seq=seq, qual=b""))
        pos += rng.randint(10, 400)
    bam = str(tmp_path / "t.bam")
    write_bam(bam, refs, records)

    reader = BamReader(bam)
    assert reader.references == ["chrS"]
    got = list(reader)
    assert len(got) == 50
    for orig, back in zip(records, got):
        assert back.name == orig.name
        assert back.pos0 == orig.pos0
        assert back.seq == orig.seq
        assert back.cigar == orig.cigar


def test_bam_fetch_overlap_semantics(tmp_path):
    refs = [("chrS", 10000)]
    # rec A [100,200), B [150,350), C [400,500)
    mk = lambda n, p, ln: BamRecord(n, 0, 0, p, 60, f"{ln}M", "A" * ln, b"")
    records = [mk("A", 100, 100), mk("B", 150, 200), mk("C", 400, 100)]
    bam = str(tmp_path / "f.bam")
    write_bam(bam, refs, records)
    reader = BamReader(bam)
    # 1-based region 151-200 overlaps A and B
    assert [r.name for r in reader.fetch("chrS", 151, 200)] == ["A", "B"]
    # region 201-400 overlaps only B (C starts at pos0=400 == end0)
    assert [r.name for r in reader.fetch("chrS", 201, 400)] == ["B"]
    # region 401-450 overlaps C
    assert [r.name for r in reader.fetch("chrS", 401, 450)] == ["C"]


def test_cigar_align_start():
    # 10S then 100M starting at POS=1000; genomic 1050 is read offset
    # 10 + (1050-1000) = 60 with miss 0
    assert cigar_align_start("10S100M", 1000, 1050) == (60, 0)
    # deletion covering the start point: 50M5D50M POS=1000, start=1052
    # (inside the D): walk stops after D at align=1055, read=50 -> miss 3
    assert cigar_align_start("50M5D50M", 1000, 1052) == (50, 3)
    # insertion before start behaves like M-continuation
    read_off, miss = cigar_align_start("50M5I50M", 1000, 1060)
    assert miss == 0
    assert read_off == 50 + 5 + 10
    # alignment ending before start with trailing M rewinds (reference
    # quirk, pyx:332-335): read offset extrapolates, miss stays 0
    assert cigar_align_start("50M", 1000, 2000) == (1000, 0)
    # ...but a trailing soft clip yields negative miss (pyx:336-337)
    read_off, miss = cigar_align_start("50M100S", 1000, 2000)
    assert (read_off, miss) == (150, -950)


def test_clip_read_gates():
    seq = "ACGT" * 500  # 2000 bp
    # POS after window start -> dropped
    assert clip_read_to_window(seq, "2000M", 501, 500, 900, 400) is None
    # miss_bp beyond flank/2 -> dropped
    assert clip_read_to_window(
        seq, "10M1000D1990M", 100, 600, 900, 400) is None
    # healthy spanning read
    got = clip_read_to_window(seq, "2000M", 101, 500, 900, 400)
    assert got is not None
    clipped, miss = got
    assert miss == 0
    assert clipped == seq[400 - 1:400 - 1 + 400]


def test_subsample_prefers_small_miss():
    reads = [[f"s{i}", i % 3, f"n{i}"] for i in range(30)]
    out = subsample_reads(reads, ideal_list_length=20)
    assert len(out) == 20
    # all miss_bp==0 and ==1 groups included first
    miss_counts = [r[1] for r in out]
    assert miss_counts.count(0) == 10
    assert miss_counts.count(1) == 10


def test_synth_end_to_end_extraction(tmp_path):
    case = build_test_case(str(tmp_path), genome_len=20000,
                           sv=("DEL", 9000, 9300), read_len=2500,
                           n_donor=6, n_ref=6, seed=3)
    flank = 300
    reads = collect_event_reads(
        case["bam"], case["contig"], case["start0"] + 1 - flank,
        case["end0"] + flank, flank)
    assert len(reads) >= 3
    for seq, miss, name in reads:
        assert len(seq) > 0
        assert miss <= flank / 2
