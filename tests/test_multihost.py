"""Single-process tests of the multi-host sharding helpers."""
from vapor_tpu.parallel.multihost import (allgather_rows, initialize,
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


def test_allgather_rows_single_process():
    rows = [["chr1", "1", "x"], ["chr2", "2", "y"]]
    assert allgather_rows(rows) == rows
