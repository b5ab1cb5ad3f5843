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


def test_balanced_owner_splits_dominant_contig():
    """One contig carrying most of the cost splits into contiguous
    position blocks instead of pinning a whole host (VERDICT r4 #7)."""
    from vapor_tpu.parallel.multihost import balanced_owner
    events = [("chr1", 1000 * i, 1000 * i + 500) for i in range(30)] \
        + [("chr2", 1000 * i, 1000 * i + 500) for i in range(3)]
    owner = balanced_owner(events, 2)
    assert owner is not None
    shards = [shard_worklist(events, p, 2, owner=owner)
              for p in range(2)]
    assert sorted(shards[0] + shards[1]) == sorted(events)
    counts = sorted(len(s) for s in shards)
    # round-robin contigs would give 3 vs 30; blocks must balance
    assert counts[0] >= 12
    # every shard's chr1 events form a few contiguous position blocks
    # (disjoint region sets — not an event-interleaved shuffle)
    for s in shards:
        idx = sorted(e[1] // 1000 for e in s if e[0] == "chr1")
        runs = 1 + sum(1 for a, b in zip(idx, idx[1:]) if b != a + 1)
        assert runs <= 3


def test_balanced_owner_cost_variance_across_equal_counts():
    """Equal event counts per contig but skewed spans: the SCALING_r3
    8-host straggler shape.  Splitting must beat whole-contig max."""
    from vapor_tpu.parallel.multihost import balanced_owner, event_cost
    events = []
    for c in range(8):
        span = 200 if c < 7 else 5000     # one expensive contig
        events += [(f"chr{c}", 2000 * i, 2000 * i + span)
                   for i in range(25)]
    owner = balanced_owner(events, 8)
    assert owner is not None
    loads = [sum(event_cost(e)
                 for e in shard_worklist(events, p, 8, owner=owner))
             for p in range(8)]
    total = sum(loads)
    assert max(loads) <= 1.15 * total / 8


def test_balanced_owner_keeps_contig_granularity_when_balanced():
    # granularity is kept when each host can hold >= 2 whole contigs
    # (enough units to absorb cost-estimation error); at ~1
    # contig/host balanced_owner deliberately splits so per-contig
    # content noise averages across hosts (SCALING_r5)
    from vapor_tpu.parallel.multihost import balanced_owner
    events = [(f"chr{c}", 100 * i, 100 * i + 50)
              for c in (1, 2, 3, 4) for i in range(5)]
    owner = balanced_owner(events, 2)
    shards = [shard_worklist(events, p, 2, owner=owner)
              for p in range(2)]
    c0 = {e[0] for e in shards[0]}
    c1 = {e[0] for e in shards[1]}
    assert not (c0 & c1)
    assert len(c0) == len(c1) == 2


def test_shard_worklist_deterministic_partition():
    from vapor_tpu.parallel.multihost import balanced_owner
    events = [(f"chr{c}", 977 * i % 9000, 977 * i % 9000 + 100 + 37 * i)
              for c in (1, 2, 3) for i in range(11)]
    a = balanced_owner(events, 4)
    b = balanced_owner(list(events), 4)
    shards_a = [shard_worklist(events, p, 4, owner=a) for p in range(4)]
    shards_b = [shard_worklist(events, p, 4, owner=b) for p in range(4)]
    assert shards_a == shards_b
    assert sorted(sum(shards_a, [])) == sorted(events)
