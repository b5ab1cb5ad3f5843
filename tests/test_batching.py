"""BatchingBackend parity: grouped cross-event device calls must be
bit-exact vs the unbatched FusedBackend, sequentially and under
concurrent submission (the CLI --pipeline path)."""
import random
from concurrent.futures import ThreadPoolExecutor

import pytest

jax = pytest.importorskip("jax")

from vapor_tpu.engine.batching import BatchingBackend  # noqa: E402
from vapor_tpu.engine.fused import FusedBackend  # noqa: E402


def _mutate(seq, rng, err=0.12):
    out = []
    for c in seq:
        r = rng.random()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append(rng.choice("ACGT"))
            out.append(c)
        elif r < err:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


def _make_event(rng, hap_len, n_reads):
    ref = "".join(rng.choice("ACGT") for _ in range(hap_len))
    cut = hap_len // 3
    alt = ref[:cut] + ref[2 * cut:]
    donor = alt if rng.random() < 0.5 else ref
    reads = [[_mutate(donor[:rng.randrange(hap_len // 2, hap_len)], rng),
              rng.choice([0, 0, 13]), f"r{i}"]
             for i in range(n_reads)]
    return ref, alt, reads


SCORERS = ["abs_dis_m1b", "within_10perc_m1b", "redefine_diagonal"]


@pytest.fixture(scope="module")
def events():
    rng = random.Random(20260818)
    evs = []
    for i in range(10):
        hap_len = rng.choice([300, 400, 900])
        evs.append(_make_event(rng, hap_len, rng.randrange(2, 8)))
    return evs


def test_batched_equals_unbatched_sequential(events):
    base = FusedBackend()
    bat = BatchingBackend()
    for i, (ref, alt, reads) in enumerate(events):
        scorer = SCORERS[i % len(SCORERS)]
        w = [10, 20][i % 2]
        assert bat.score_batch(scorer, ref, alt, reads, w) == \
            base.score_batch(scorer, ref, alt, reads, w)


def test_batched_equals_unbatched_concurrent(events):
    base = FusedBackend()
    bat = BatchingBackend()
    jobs = [(SCORERS[i % len(SCORERS)], ev, [10, 20][i % 3 == 0])
            for i, ev in enumerate(events)]

    def run(be, job):
        scorer, (ref, alt, reads), w = job
        return be.score_batch(scorer, ref, alt, reads, w)

    with ThreadPoolExecutor(max_workers=6) as pool:
        got = list(pool.map(lambda j: run(bat, j), jobs))
    want = [run(base, j) for j in jobs]
    assert got == want


def test_batched_del_mode(events):
    base = FusedBackend()
    bat = BatchingBackend()
    for ref, alt, reads in events[:4]:
        # lowercase tail exercises the separate raw-case dispatches
        ref_l = ref[:-40] + ref[-40:].lower()
        assert bat.score_del_batch(ref_l, alt, reads, 10) == \
            base.score_del_batch(ref_l, alt, reads, 10)


def test_async_burst_single_flush(events):
    """All events dispatched before any finisher resolves (the bench /
    breadth-first pipeline pattern): the flush spans many bucket
    groups, exercising the combined single-fetch result path."""
    base = FusedBackend()
    bat = BatchingBackend()
    jobs = [(SCORERS[i % len(SCORERS)], ev, 10)
            for i, ev in enumerate(events)]
    fins = [bat.score_batch_async(s, ref, alt, reads, w)
            for s, (ref, alt, reads), w in jobs]
    got = [fin() for fin in fins]
    want = [base.score_batch(s, ref, alt, reads, w)
            for s, (ref, alt, reads), w in jobs]
    assert got == want


def test_async_burst_single_device(events, monkeypatch):
    """Same burst with the mesh disabled: every group lands on one
    device, so the flush takes the device-concatenated single-fetch
    path (the single-chip TPU production case)."""
    monkeypatch.setenv("VAPOR_MESH", "0")
    base = FusedBackend()
    bat = BatchingBackend()
    jobs = [(SCORERS[i % len(SCORERS)], ev, 10)
            for i, ev in enumerate(events)]
    fins = [bat.score_batch_async(s, ref, alt, reads, w)
            for s, (ref, alt, reads), w in jobs]
    got = [fin() for fin in fins]
    want = [base.score_batch(s, ref, alt, reads, w)
            for s, (ref, alt, reads), w in jobs]
    assert got == want


def test_warm_ladder_compiles_seen_buckets(events):
    bat = BatchingBackend()
    ref, alt, reads = events[0]
    want = bat.score_batch("abs_dis_m1b", ref, alt, reads, 10)
    n = bat.warm_ladder(max_rows=16)
    assert n > 0
    # scoring after warmup is unchanged
    assert bat.score_batch("abs_dis_m1b", ref, alt, reads, 10) == want


def test_batched_error_propagates():
    import numpy as np
    bat = BatchingBackend()
    # a malformed submission must resolve with an exception, not hang
    enc = (np.zeros((2, 128), np.uint8), np.zeros((2, 128), np.uint8),
           np.ones(2, np.int32), np.zeros(2, np.int32))
    fut = bat._submit(None, enc, 10, 128, 128, "m1b")
    with pytest.raises(Exception):
        fut.result(timeout=30)
