"""Cross-event request batching for the fused engine.

The reference validates events strictly one at a time (vapor:150-266
drives one validator call per worklist row).  On TPU behind a relay
link every device call pays a fixed ~20 ms result-fetch latency, so
per-(scorer, haplotype) calls leave the chip mostly idle.  This backend
coalesces stat requests into combined ``fused_batch`` calls:

* the 2-4 haplotype dispatches of a single event always merge (they
  arrive within the linger window even single-threaded), and
* with the CLI pipeline (``--pipeline N``) requests from *different*
  events merge too, grouped by (H, R, mode, window) bucket.

Work rows are (read x haplotype) pairs — ``fused_batch`` takes per-row
haplotypes — so grouping never changes any per-row result: parity with
the unbatched backend is bit-exact (tests/test_batching.py).
"""
from __future__ import annotations

import queue
import threading
import time
from collections import defaultdict
from concurrent.futures import Future

import numpy as np

import jax.numpy as jnp

from .fused import FusedBackend, fused_batch
from .kernel import HAP_PAD, READ_PAD

# flush tuning: wait LINGER for the next request after each arrival,
# never more than MAX_WAIT total — both well under one fetch latency.
LINGER_S = 0.003
MAX_WAIT_S = 0.012

# padded row-count ladder: bounds XLA compilations per (H, R, mode)
# to len(LADDER) while keeping padding waste ~15% (every size is a
# multiple of the fused engine's vmap chunk widths 8/4/2/1).  Live
# memory is bounded by the chunk width, not total rows, so the cap
# only limits single-call duration (tail latency), not HBM.
LADDER = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)
# target ~40-60 ms of device time per combined call (~76 ps/cell on
# v5e): long enough to hide the ~23 ms relay fetch of the previous
# call, short enough that several calls pipeline per flush
CELL_BUDGET = 1 << 29


def _pad_rows(n: int) -> int:
    for s in LADDER:
        if n <= s:
            return s
    return -(-n // LADDER[-1]) * LADDER[-1]


def _row_cap(H: int, R: int) -> int:
    cap = 16
    for s in LADDER:
        if s * H * R <= CELL_BUDGET:
            cap = max(cap, s)
    return cap


class _Req:
    __slots__ = ("hap", "fw", "rc", "rlens", "ms", "B", "key", "fut")


class _RowFut:
    """View of a combined-call Future as this request's packed rows."""

    __slots__ = ("_f",)

    def __init__(self, f):
        self._f = f

    def result(self):
        return self._f.result()[2][0]


class BatchingBackend(FusedBackend):
    """Fused backend with a dynamic-batching dispatcher thread."""

    name = "jax-batch"

    def __init__(self, linger: float = LINGER_S,
                 max_wait: float = MAX_WAIT_S):
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._launched: queue.Queue = queue.Queue(maxsize=4)
        self._linger = linger
        self._max_wait = max_wait
        self._thread = None
        self._collector = None
        self._lock = threading.Lock()

    # -- request side ------------------------------------------------

    def _submit(self, hap_codes, enc, window, H, R, scorer):
        self._ensure_thread()
        r = _Req()
        r.hap, (r.fw, r.rc, r.rlens, r.ms) = hap_codes, enc
        r.B = r.fw.shape[0]
        r.key = (H, R, scorer, window // 10 - 1)
        r.fut = Future()
        self._q.put(r)
        return r.fut

    def submit_selfstats(self, hap, rc, length, window, H):
        """Window-refiner self-comparison request: coalesces with other
        events' refiner steps in the same (H, window) bucket — the
        refiner round-trips were the dominant e2e host cost once score
        batches coalesced (~17 ms relay fetch per tiny call)."""
        self._ensure_thread()
        r = _Req()
        r.hap = hap.reshape(1, -1)
        r.fw = rc.reshape(1, -1)
        r.rc = r.ms = None
        r.rlens = np.asarray([length], np.int32)
        r.B = 1
        r.key = (H, H, "selfstats", window // 10 - 1)
        r.fut = Future()
        self._q.put(r)
        return _RowFut(r.fut)

    def _ensure_thread(self):
        if self._thread is not None and self._thread.is_alive():
            return
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                t = threading.Thread(target=self._loop, daemon=True,
                                     name="vapor-batch-dispatch")
                t.start()
                self._thread = t
            if self._collector is None or not self._collector.is_alive():
                c = threading.Thread(target=self._collect, daemon=True,
                                     name="vapor-batch-collect")
                c.start()
                self._collector = c

    # -- dispatcher side ----------------------------------------------

    def _loop(self):
        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self._max_wait
            while True:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(
                        timeout=min(self._linger, left)))
                except queue.Empty:
                    break
            try:
                self._flush(batch)
            except BaseException as e:   # resolve waiters, keep serving
                for r in batch:
                    if not r.fut.done():
                        r.fut.set_exception(e)

    def _flush(self, batch):
        """Group requests and launch device calls; result fetching is
        the collector thread's job, so the dispatcher keeps launching
        while earlier calls' fetches block (the device never idles
        behind the relay latency)."""
        groups = defaultdict(list)
        for r in batch:
            groups[r.key].append(r)
        for key, reqs in groups.items():
            H, R, _, _ = key
            cap = _row_cap(H, R)
            sub, rows = [], 0
            for r in reqs:
                if sub and rows + r.B > cap:
                    self._launched.put((sub, self._launch(key, sub)))
                    sub, rows = [], 0
                sub.append(r)
                rows += r.B
            if sub:
                self._launched.put((sub, self._launch(key, sub)))

    def _collect(self):
        while True:
            sub, out = self._launched.get()
            try:
                h_d, h_a, packed = out
                pk = np.asarray(packed)
                o = 0
                for r in sub:
                    r.fut.set_result((
                        None if h_d is None else h_d[o:o + r.B],
                        None if h_a is None else h_a[o:o + r.B],
                        pk[o:o + r.B]))
                    o += r.B
            except BaseException as e:
                for r in sub:
                    if not r.fut.done():
                        r.fut.set_exception(e)

    def _launch(self, key, sub):
        H, R, scorer, kidx = key
        if scorer == "selfstats":
            from .window_device import _self_stats_rows
            P = _pad_rows(sum(r.B for r in sub))
            haps = np.full((P, H), HAP_PAD, np.uint8)
            rcs = np.full((P, H), 251, np.uint8)
            lengths = np.zeros(P, np.int32)
            o = 0
            for r in sub:
                haps[o:o + r.B] = r.hap
                rcs[o:o + r.B] = r.fw
                lengths[o:o + r.B] = r.rlens
                o += r.B
            return (None, None, _self_stats_rows(
                jnp.asarray(haps), jnp.asarray(rcs),
                jnp.asarray(lengths), jnp.int32(kidx), H=H))
        rows = sum(r.B for r in sub)
        P = _pad_rows(rows)
        haps = np.full((P, H), HAP_PAD, np.uint8)
        fw = np.full((P, R), READ_PAD, np.uint8)
        rc = np.full((P, R), READ_PAD, np.uint8)
        rlens = np.ones(P, np.int32)
        ms = np.zeros(P, np.int32)
        o = 0
        for r in sub:
            haps[o:o + r.B] = r.hap
            fw[o:o + r.B] = r.fw
            rc[o:o + r.B] = r.rc
            rlens[o:o + r.B] = r.rlens
            ms[o:o + r.B] = r.ms
            o += r.B
        return fused_batch(jnp.asarray(haps), jnp.asarray(fw),
                           jnp.asarray(rc), jnp.asarray(rlens),
                           jnp.asarray(ms), jnp.int32(kidx),
                           H=H, R=R, scorer=scorer)
