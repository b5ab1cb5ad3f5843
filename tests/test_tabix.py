"""Tabix index round-trip: merge_outputs(compress=True) writes BGZF +
.tbi, and region queries through the index return exactly the
overlapping rows (reference analog: ConcatVaPoR bgzip+tabix,
/root/reference/wdl/TasksBenchmark.wdl:303-309)."""
import random

from vapor_tpu.io.tabix import tabix_query, write_bgzf_indexed
from vapor_tpu.orchestrate import merge_outputs

HEADER = ("#CHR\tPOS\tEND\tSVTYPE\tSVID\tVaPoR_QS\tVaPoR_GS\t"
          "VaPoR_GT\tVaPoR_GQ\tVaPoR_Rec\n")


def _row(chrom, pos, end, i):
    return (f"{chrom}\t{pos}\t{end}\tDEL\tsv{i}\t0.9\t1.0\t0/1\t"
            f"3.2\t0.9\n")


def test_merge_outputs_writes_index_roundtrip(tmp_path):
    rng = random.Random(3)
    shard_rows = {"chr1": [], "chr2": [], "chr10": []}
    i = 0
    truth = []
    for chrom in shard_rows:
        pos = 1000
        for _ in range(50):
            pos += rng.randint(500, 3000)
            end = pos + rng.randint(50, 400)
            shard_rows[chrom].append(_row(chrom, pos, end, i))
            truth.append((chrom, pos, end, f"sv{i}"))
            i += 1
    shards = []
    for chrom, rows in shard_rows.items():
        p = tmp_path / f"{chrom}.vapor"
        p.write_text(HEADER + "".join(rows))
        shards.append(str(p))

    out = str(tmp_path / "merged.vapor.gz")
    merge_outputs(shards, out, compress=True)
    import os
    assert os.path.exists(out + ".tbi")

    # every row findable through the index by its own interval
    for chrom, pos, end, svid in truth:
        hits = tabix_query(out, chrom, pos, end)
        assert any(h[4] == svid for h in hits), (chrom, pos, svid)

    # region query returns exactly the overlapping set
    lo, hi = 20000, 60000
    expect = sorted(svid for c, p, e, svid in truth
                    if c == "chr2" and p < hi and e > lo)
    got = sorted(h[4] for h in tabix_query(out, "chr2", lo, hi))
    assert got == expect

    # non-overlapping and unknown-contig queries are empty
    assert tabix_query(out, "chr2", 10, 20) == []
    assert tabix_query(out, "chrZ", 0, 10 ** 9) == []


def test_multiblock_bgzf_offsets(tmp_path):
    """Rows spanning multiple BGZF blocks still resolve through the
    virtual offsets (forces >1 60000-byte block)."""
    rows = []
    truth = []
    pad = "P" * 120
    pos = 100
    for i in range(1200):
        pos += 97
        rows.append(f"chrB\t{pos}\t{pos + 50}\tDEL\tx{i}\t{pad}\n")
        truth.append((pos, f"x{i}"))
    path = str(tmp_path / "big.gz")
    write_bgzf_indexed(path, HEADER + "".join(rows))
    import os
    assert os.path.getsize(path) > 0
    for pos, svid in (truth[0], truth[600], truth[-1]):
        hits = tabix_query(path, "chrB", pos, pos + 1)
        assert any(h[4] == svid for h in hits), (pos, svid)
