"""Single-process tests of the multi-host sharding helpers."""
from vapor_tpu.parallel.multihost import (allgather_rows, contig_owner,
                                          contig_of_event, initialize,
                                          shard_worklist)


def test_initialize_standalone():
    assert initialize() == (0, 1)


def test_shard_worklist_contig_granular():
    events = [(f"chr{c}", i) for c in (1, 2, 3, 4) for i in range(3)]
    shards = [shard_worklist(events, p, 2) for p in range(2)]
    # disjoint, complete, contig-granular
    assert sorted(shards[0] + shards[1]) == sorted(events)
    c0 = {e[0] for e in shards[0]}
    c1 = {e[0] for e in shards[1]}
    assert not (c0 & c1)


def test_shard_worklist_roundrobin_fallback():
    events = [("chr1", i) for i in range(10)]
    shards = [shard_worklist(events, p, 4) for p in range(4)]
    assert sorted(sum(shards, [])) == sorted(events)
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_contig_owner_shared_across_types():
    """One assignment from the combined list keeps a contig on a single
    shard even when per-type event counts would greedily assign it
    differently (ADVICE r3: vcf mode computed owners per SV type)."""
    dels = [("chr1", i) for i in range(6)] + [("chr2", i)
                                             for i in range(1)]
    invs = [("chr2", i) for i in range(6)] + [("chr1", i)
                                             for i in range(1)]
    owner = contig_owner(dels + invs, 2)
    assert owner is not None
    for typed in (dels, invs):
        for p in range(2):
            got = shard_worklist(typed, p, 2, owner=owner)
            assert all(owner[e[0]] == p for e in got)
    # every contig owned by exactly one shard, globally
    assert set(owner) == {"chr1", "chr2"}


def test_contig_of_event_unwraps_blocks():
    # DEL_INV worklist entries nest blocks: [[chr, s, e], [chr, s, e]]
    assert contig_of_event([["chr7", 100, 200], ["chr7", 250, 300]]) \
        == "chr7"
    assert contig_of_event(("chr3", 5, 10)) == "chr3"


def test_allgather_rows_single_process():
    rows = [["chr1", "1", "x"], ["chr2", "2", "y"]]
    assert allgather_rows(rows) == rows
