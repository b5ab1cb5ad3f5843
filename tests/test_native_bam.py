"""Differential tests: native C++ BAM codec vs the pure-Python decoder."""
import random

import pytest

from vapor_tpu.io.bam import BamReader, BamRecord, write_bam
from vapor_tpu import native


@pytest.fixture(scope="module")
def bam_file(tmp_path_factory):
    rng = random.Random(17)
    d = tmp_path_factory.mktemp("nbam")
    refs = [("c1", 50000), ("c2", 30000)]
    records = []
    for rid in (0, 1):
        pos = 50
        for i in range(80):
            ln = rng.randint(60, 400)
            cigar = f"{ln // 2}M5I3D{ln - ln // 2}M" if i % 3 else f"{ln}M"
            seq_len = ln // 2 + 5 + (ln - ln // 2) if i % 3 else ln
            seq = "".join(rng.choice("ACGTN") for _ in range(seq_len))
            records.append(BamRecord(
                name=f"r{rid}_{i}", flag=i % 4 * 16, ref_id=rid, pos0=pos,
                mapq=rng.randint(0, 60), cigar=cigar, seq=seq, qual=b""))
            pos += rng.randint(5, 700)
    path = str(d / "t.bam")
    write_bam(path, refs, records)
    return path


def test_native_available():
    assert native.load() is not None, "C++ codec failed to build"


def test_bgzf_decompress_matches(bam_file):
    raw = open(bam_file, "rb").read()
    from vapor_tpu.io.bam import _decompress_bgzf
    assert native.bgzf_decompress(raw) == _decompress_bgzf(bam_file)


def test_fetch_matches_python(bam_file):
    nat = BamReader(bam_file, native=True)
    pyr = BamReader(bam_file, native=False)
    assert nat._native is not None
    assert pyr._native is None
    rng = random.Random(3)
    regions = [("c1", 1, 50000), ("c2", 1, 30000), ("c1", 100, 101),
               ("missing", 1, 10)]
    regions += [("c1", a + 1, a + rng.randint(1, 5000))
                for a in (rng.randint(0, 45000) for _ in range(10))]
    for chrom, s, e in regions:
        got = [(r.name, r.flag, r.pos0, r.mapq, r.cigar, r.seq)
               for r in nat.fetch(chrom, s, e)]
        expect = [(r.name, r.flag, r.pos0, r.mapq, r.cigar, r.seq)
                  for r in pyr.fetch(chrom, s, e)]
        assert got == expect, (chrom, s, e)
