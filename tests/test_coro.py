"""Cooperative pipelining driver (utils/coro.py) semantics."""
import pytest

from vapor_tpu.utils.coro import drain, run_pipelined


def _task(i, log, steps=2):
    def gen():
        for s in range(steps):
            log.append(("dispatch", i, s))
            got = yield (lambda i=i, s=s: ("result", i, s))
            assert got == ("result", i, s)
        return (i, i * 10)
    return gen


def test_drain_returns_value():
    log = []
    assert drain(_task(7, log)()) == (7, 70)
    assert log == [("dispatch", 7, 0), ("dispatch", 7, 1)]


def test_emit_order_preserved_any_depth():
    for depth in (1, 2, 5, 100):
        log, emitted = [], []
        tasks = [_task(i, log, steps=(i % 3) + 1) for i in range(7)]
        run_pipelined(tasks, lambda *a: emitted.append(a), depth)
        assert emitted == [(i, i * 10) for i in range(7)]


def test_lookahead_dispatches_ahead():
    """With depth N, the first step of N tasks is dispatched before the
    first task's second step resolves (device-side overlap)."""
    log, emitted = [], []
    tasks = [_task(i, log, steps=2) for i in range(4)]
    run_pipelined(tasks, lambda *a: emitted.append(a), 3)
    first3 = log[:3]
    assert first3 == [("dispatch", 0, 0), ("dispatch", 1, 0),
                      ("dispatch", 2, 0)]


def test_zero_step_tasks():
    def instant(i):
        def gen():
            if False:
                yield
            return (i,)
        return gen
    emitted = []
    run_pipelined([instant(i) for i in range(5)],
                  lambda *a: emitted.append(a), 3)
    assert emitted == [(i,) for i in range(5)]


def test_exception_propagates():
    def boom():
        if False:
            yield
        raise RuntimeError("x")
    with pytest.raises(RuntimeError):
        run_pipelined([boom], lambda *a: None, 2)
    with pytest.raises(RuntimeError):
        run_pipelined([boom], lambda *a: None, 1)
