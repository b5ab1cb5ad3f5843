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

Fetch strategy: on the relay link each ``np.asarray`` holds the GIL
for the whole ~10-20 ms RPC, so a flush spanning G bucket groups used
to pay G serialized fetch latencies.  The dispatcher now issues
``copy_to_host_async`` for every group at flush time — the relay runs
the transfers concurrently, so the collector's per-group fetches find
the bytes already host-side (measured: 4 ready fetches 110 ms plain vs
25 ms after the async issue) while groups still resolve individually,
which the breadth-first CLI pipeline needs to keep dispatching.
(VAPOR_TPU_COMBINE_FETCH=1 selects the alternative single
device-concatenated fetch per flush — wins on all-at-once bursts,
convoy-locks pipelined runs.)
"""
from __future__ import annotations

import os
import queue
import threading
import time
from collections import defaultdict
from concurrent.futures import Future

import numpy as np

import jax.numpy as jnp

from .fused import (FusedBackend, _expand_rows, fused_batch,
                    pack_nibbles, uniq_cap)
from .kernel import HAP_PAD, READ_PAD

# flush tuning: wait LINGER for the next request after each arrival,
# never more than MAX_WAIT total — both well under one fetch latency.
LINGER_S = float(os.environ.get("VAPOR_TPU_LINGER", "0.003"))
MAX_WAIT_S = float(os.environ.get("VAPOR_TPU_MAX_WAIT", "0.012"))
# per-group fetches with async host copies are the default (see
# _flush); =1 switches to one device-concatenated fetch per flush
COMBINE_FETCH = os.environ.get("VAPOR_TPU_COMBINE_FETCH", "0") == "1"

# padded row-count ladder: bounds XLA compilations per (H, R, mode)
# to len(LADDER) while keeping padding waste ~15% (every size is a
# multiple of the fused engine's vmap chunk widths 8/4/2/1).  Live
# memory is bounded by the chunk width, not total rows, so the cap
# only limits single-call duration (tail latency), not HBM.
LADDER = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)
# target ~40-60 ms of device time per combined call (~76 ps/cell on
# v5e): long enough to hide the ~23 ms relay fetch of the previous
# call, short enough that several calls pipeline per flush
# (env-tunable for on-chip experiments)
CELL_BUDGET = int(os.environ.get("VAPOR_TPU_CELL_BUDGET", str(1 << 29)))


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


# every (H, R, scorer, window) bucket submitted in this process —
# module-level so a warm run's keys survive into a later backend
# instance (bench_e2e builds a fresh CLI context per pass)
_SEEN_KEYS: set = set()


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
        _SEEN_KEYS.add(r.key)
        r.fut = Future()
        self._q.put(r)
        return r.fut

    def submit_selfstats(self, hap, length, window, H):
        """Window-refiner self-comparison request: coalesces with other
        events' refiner steps in the same (H, window) bucket — the
        refiner round-trips were the dominant e2e host cost once score
        batches coalesced (~17 ms relay fetch per tiny call).  Only the
        forward hap row is taken; the dispatcher nibble-packs it and
        the device derives the reverse complement."""
        self._ensure_thread()
        r = _Req()
        r.hap = hap.reshape(1, -1)
        r.fw = r.rc = r.ms = None
        r.rlens = np.asarray([length], np.int32)
        r.B = 1
        r.key = (H, H, "selfstats", window // 10 - 1)
        _SEEN_KEYS.add(r.key)
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
        behind the relay latency).  All groups of one flush share a
        single device-concatenated result array — one fetch RPC per
        flush, not per group."""
        groups = defaultdict(list)
        for r in batch:
            groups[r.key].append(r)
        launched = []
        for key, reqs in groups.items():
            H, R, _, _ = key
            cap = _row_cap(H, R)
            sub, rows = [], 0
            for r in reqs:
                if sub and rows + r.B > cap:
                    launched.append((sub, self._launch(key, sub)))
                    sub, rows = [], 0
                sub.append(r)
                rows += r.B
            if sub:
                launched.append((sub, self._launch(key, sub)))
        if not launched:
            return
        # start every group's device->host transfer NOW, without
        # blocking: the relay runs the copies concurrently, so the
        # collector's per-group np.asarray mostly finds the bytes
        # already on the host (measured on the axon relay: 4 ready
        # fetches 110 ms serialized vs 25 ms after async copy issue).
        # Groups still RESOLVE individually, which the pipelined CLI
        # needs — a flush-combined single fetch convoy-locked the
        # breadth-first scheduler (depth-24 e2e 15.0 vs 39.6 events/s).
        for _, out in launched:
            try:
                out[2].copy_to_host_async()
            except Exception:
                pass
        combined = None
        if len(launched) > 1 and COMBINE_FETCH:
            # optional A/B path: one device-concatenated fetch per
            # flush (wins on all-at-once bursts, loses pipelined; only
            # valid when every group lives on one common device)
            try:
                devs = set()
                for _, out in launched:
                    devs |= out[2].devices()
                if len(devs) == 1:
                    combined = jnp.concatenate(
                        [out[2].reshape(-1) for _, out in launched])
            except Exception:
                combined = None
        self._launched.put((launched, combined))

    def _collect(self):
        while True:
            launched, combined = self._launched.get()
            flat = None
            if combined is not None:
                try:
                    flat = np.asarray(combined)
                except BaseException as e:
                    for sub, _ in launched:
                        for r in sub:
                            if not r.fut.done():
                                r.fut.set_exception(e)
                    continue
            off = 0
            for sub, out in launched:
                try:
                    h_d, h_a, packed = out
                    if flat is not None:
                        n = packed.shape[0] * packed.shape[1]
                        pk = flat[off:off + n].reshape(packed.shape)
                        off += n
                    else:
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
            from .window_device import (_RC_PAD, _self_stats_rows,
                                        _self_stats_rows_packed)
            from .fused import _VOCAB_OK
            from . import oracle
            P = _pad_rows(sum(r.B for r in sub))
            haps = np.full((P, H), HAP_PAD, np.uint8)
            lengths = np.zeros(P, np.int32)
            o = 0
            for r in sub:
                haps[o:o + r.B] = r.hap
                lengths[o:o + r.B] = r.rlens
                o += r.B
            if _VOCAB_OK[haps].all() and \
                    os.environ.get("VAPOR_TPU_PACK", "1") != "0":
                return (None, None, _self_stats_rows_packed(
                    jnp.asarray(pack_nibbles(haps)),
                    jnp.asarray(lengths), jnp.int32(kidx), H=H))
            # out-of-alphabet bytes (encode is identity on unknowns):
            # ship both strands unpacked, rc built host-side
            rcs = np.full((P, H), _RC_PAD, np.uint8)
            for b in range(P):
                ln = lengths[b]
                rcs[b, :ln] = oracle._COMP_LUT[haps[b, :ln]][::-1]
            return (None, None, _self_stats_rows(
                jnp.asarray(haps), jnp.asarray(rcs),
                jnp.asarray(lengths), jnp.int32(kidx), H=H))
        rows = sum(r.B for r in sub)
        P = _pad_rows(rows)
        fw = np.full((P, R), READ_PAD, np.uint8)
        rlens = np.ones(P, np.int32)
        ms = np.zeros(P, np.int32)
        has_rc = any(r.rc is not None for r in sub)
        # production path: unique hap rows + per-row index, nibble-
        # packed payload, expanded on device (engine.fused._expand_rows)
        # (VAPOR_TPU_PACK=0 forces the broadcast upload — A/B runs)
        pack_off = os.environ.get("VAPOR_TPU_PACK", "1") == "0"
        cap = uniq_cap(P)
        uniq, slot_of, idx = [], {}, np.zeros(P, np.int32)
        o = 0
        for r in sub:
            if pack_off or has_rc or r.hap.ndim != 1 or \
                    len(uniq) >= cap - 1 and \
                    r.hap.tobytes() not in slot_of:
                uniq = None
                break
            kb = r.hap.tobytes()
            s = slot_of.get(kb)
            if s is None:
                s = len(uniq)
                slot_of[kb] = s
                uniq.append(r.hap)
            idx[o:o + r.B] = s
            fw[o:o + r.B] = r.fw
            rlens[o:o + r.B] = r.rlens
            ms[o:o + r.B] = r.ms
            o += r.B
        if uniq is not None:
            idx[o:] = len(uniq)          # pad rows -> all-HAP_PAD slot
            pu = np.full((cap, H), HAP_PAD, np.uint8)
            for s, row in enumerate(uniq):
                pu[s] = row
            haps_d, fw_d = _expand_rows(jnp.asarray(pack_nibbles(pu)),
                                        jnp.asarray(idx),
                                        jnp.asarray(pack_nibbles(fw)))
            # kidx stays a python int: the engine-routing check in
            # fused_batch must never see a device scalar (int() on one
            # is a blocking relay fetch per call)
            return fused_batch(haps_d, fw_d, None, jnp.asarray(rlens),
                               jnp.asarray(ms), kidx,
                               H=H, R=R, scorer=scorer)
        # fallback: rc-carrying or >cap distinct haps — broadcast upload
        haps = np.full((P, H), HAP_PAD, np.uint8)
        rc = np.full((P, R), READ_PAD, np.uint8) if has_rc else None
        o = 0
        for r in sub:
            haps[o:o + r.B] = r.hap
            fw[o:o + r.B] = r.fw
            if has_rc:
                if r.rc is not None:
                    rc[o:o + r.B] = r.rc
                else:
                    # a group mixing rc-carrying and rc=None requests
                    # must not leave the rc=None rows as READ_PAD fill
                    # (that would zero their reverse-strand hits):
                    # derive the missing rows host-side, byte-identical
                    # to the device derivation (_derive_rc_row)
                    from . import oracle
                    for b in range(r.B):
                        ln = r.rlens[b]
                        rc[o + b, :ln] = \
                            oracle._COMP_LUT[r.fw[b, :ln]][::-1]
            rlens[o:o + r.B] = r.rlens
            ms[o:o + r.B] = r.ms
            o += r.B
        return fused_batch(jnp.asarray(haps), jnp.asarray(fw),
                           None if rc is None else jnp.asarray(rc),
                           jnp.asarray(rlens),
                           jnp.asarray(ms), kidx,
                           H=H, R=R, scorer=scorer)

    # -- warmup --------------------------------------------------------

    def warm_ladder(self, max_rows: int = 0) -> int:
        """Compile every LADDER padded-row shape (up to the per-bucket
        cell cap, and optionally up to ``max_rows``) for each bucket
        seen so far in this process.

        Deeper pipelines coalesce into larger padded shapes whose
        flush-timing-dependent mix means a timed/production pass can hit
        fresh XLA compiles mid-run (the --pipeline > 8 collapse,
        PERF_NOTES.md r3).  Warming the full ladder once — persisted by
        the XLA disk compilation cache — removes that cliff.  Returns
        the number of shapes executed."""
        done = 0
        outs = []
        for key in sorted(_SEEN_KEYS):
            H, R, scorer, kidx = key
            cap = _row_cap(H, R)
            for P in LADDER:
                if P > cap or (max_rows and P > _pad_rows(max_rows)):
                    break
                r = _Req()
                r.B = P
                r.key = key
                if scorer == "selfstats":
                    r.hap = np.full((P, H), HAP_PAD, np.uint8)
                    r.fw = r.rc = r.ms = None
                    r.rlens = np.zeros(P, np.int32)
                else:
                    # 1-D hap row: warms the production packed path
                    # (dedupe + nibble pack + device expand)
                    r.hap = np.full(H, HAP_PAD, np.uint8)
                    r.fw = np.full((P, R), READ_PAD, np.uint8)
                    r.rc = None     # production ships fw only
                    r.rlens = np.ones(P, np.int32)
                    r.ms = np.zeros(P, np.int32)
                outs.append(self._launch(key, [r])[2].reshape(-1)[:1])
                done += 1
        if outs:
            np.asarray(jnp.concatenate(outs))   # block until compiled
        return done
