"""BAI index: write/read round-trip and indexed-fetch equivalence."""
import random

import pytest

from vapor_tpu.io.bai import IndexedBam, reg2bin, reg2bins, write_bai
from vapor_tpu.io.bam import BamReader, BamRecord, write_bam


def test_reg2bin_levels():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(1 << 26, (1 << 26) + 5) == 4681 + (1 << 12)
    assert 0 in reg2bins(0, 1 << 29)


@pytest.fixture(scope="module")
def indexed_bam(tmp_path_factory):
    rng = random.Random(99)
    d = tmp_path_factory.mktemp("bai")
    refs = [("c1", 500000), ("c2", 200000)]
    records = []
    for rid, (name, ln) in enumerate(refs):
        pos = 100
        count = 600 if rid == 0 else 250
        for i in range(count):
            L = rng.randint(150, 1200)
            seq = "".join(rng.choice("ACGT") for _ in range(L))
            records.append(BamRecord(
                name=f"{name}_{i}", flag=0, ref_id=rid, pos0=pos,
                mapq=60, cigar=f"{L}M", seq=seq, qual=b""))
            pos += rng.randint(20, 700)
    path = str(d / "big.bam")
    write_bam(path, refs, records)
    write_bai(path)
    return path


def test_indexed_fetch_matches_scan(indexed_bam):
    idx = IndexedBam(indexed_bam)
    full = BamReader(indexed_bam, native=False)
    assert idx.references == full.references
    rng = random.Random(5)
    regions = [("c1", 1, 500000), ("c2", 1, 200000),
               ("c1", 250000, 250100), ("missing", 1, 100),
               ("c2", 199000, 200000)]
    regions += [("c1", a + 1, a + rng.randint(100, 30000))
                for a in (rng.randint(0, 450000) for _ in range(12))]
    checked = 0
    for chrom, s, e in regions:
        got = [(r.name, r.pos0, r.cigar, r.seq)
               for r in idx.fetch(chrom, s, e)]
        expect = [(r.name, r.pos0, r.cigar, r.seq)
                  for r in full.fetch(chrom, s, e)]
        assert got == expect, (chrom, s, e, len(got), len(expect))
        checked += len(expect)
    assert checked > 500


def test_reads_layer_uses_index(indexed_bam):
    from vapor_tpu.io import reads as reads_mod
    reads_mod._open_bam.cache_clear()
    reader = reads_mod._open_bam(indexed_bam)
    assert isinstance(reader, IndexedBam)
    out = reads_mod.extract_spanning_reads(indexed_bam, "c1", 1000,
                                           3000, 400)
    assert isinstance(out, list)
