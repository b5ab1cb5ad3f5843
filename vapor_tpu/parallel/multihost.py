"""Multi-host execution: contig-sharded worklists over DCN.

The reference's only scale-out is file-based WDL scatter (SURVEY §2.5).
The TPU-native pattern:

* each host initializes `jax.distributed` (DCN control plane) and owns a
  deterministic shard of the worklist — by contig when contigs >= hosts
  (BAM/FASTA locality, zero cross-host reads), round-robin by event
  otherwise;
* within a host, events batch onto the local chip(s) through the fused
  engine over the local `Mesh` (see parallel.mesh);
* result rows are fixed-width; the merge is either the orchestrator's
  deterministic file merge (orchestrate.merge_outputs) or an in-job
  `process_allgather` of row blocks when a single annotated output is
  produced in-process.

On a single host this degenerates to --shard-index 0/--num-shards 1.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed if a multi-process env is configured.

    Returns (process_id, num_processes); (0, 1) standalone.  Reads the
    standard JAX env (JAX_COORDINATOR_ADDRESS etc.) when args are None.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return 0, 1
    # CPU cross-process collectives need the gloo backend (virtual
    # multi-host testing; TPU pods use the default backend untouched)
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or
        int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else
        int(os.environ.get("JAX_PROCESS_ID", "0")))
    return jax.process_index(), jax.process_count()


def contig_of_event(e) -> str:
    """Contig name of a worklist entry.  Block-structured entries
    (DEL_INV: [[chr, s, e], [chr, s, e]]) nest the contig one level
    down — unwrap so every SV type keys on the same contig string."""
    c = e[0]
    while isinstance(c, (list, tuple)):
        c = c[0]
    return str(c)


def contig_owner(events: Sequence, num_processes: int,
                 contig_of=contig_of_event) -> Optional[Dict[str, int]]:
    """Greedy-balanced contig -> host map over a full worklist, or
    None when there are fewer contigs than hosts (callers then fall
    back to event round-robin).  Computing this ONCE over the combined
    event list — not per SV type — keeps per-host BAM regions disjoint
    even when types have different per-contig counts (ADVICE r3).
    Deterministic: every host computes the same assignment."""
    contigs = []
    counts: Dict[str, int] = {}
    for e in events:
        c = contig_of(e)
        if c not in counts:
            contigs.append(c)
            counts[c] = 0
        counts[c] += 1
    if len(contigs) < num_processes:
        return None
    # largest contig first onto the least-loaded host (greedy
    # balance; first-appearance order breaks count ties)
    first = {c: i for i, c in enumerate(contigs)}
    order = sorted(contigs, key=lambda c: (-counts[c], first[c]))
    load = [0] * num_processes
    owner: Dict[str, int] = {}
    for c in order:
        h = min(range(num_processes), key=lambda i: (load[i], i))
        owner[c] = h
        load[h] += counts[c]
    return owner


def shard_worklist(events: Sequence, process_id: int, num_processes: int,
                   contig_of=contig_of_event,
                   owner: Optional[Dict[str, int]] = None) -> List:
    """Deterministic worklist shard for this host.

    Contig-granular when there are at least as many contigs as hosts
    (keeps per-host BAM regions disjoint — the WDL per-contig scatter,
    internalized), with contigs packed greedily by event count so few
    large contigs don't pile onto one host; event round-robin
    otherwise.  Pass ``owner`` (from contig_owner over the FULL
    worklist) to share one assignment across several per-type calls.
    """
    if num_processes <= 1:
        return list(events)
    if owner is None:
        owner = contig_owner(events, num_processes, contig_of)
    if owner is not None:
        return [e for e in events
                if owner.get(contig_of(e), 0) == process_id]
    return [e for i, e in enumerate(events)
            if i % num_processes == process_id]


def allgather_rows(rows: List[List[str]]) -> List[List[str]]:
    """Gather per-host result rows to every host (fixed-width text rows
    encoded as bytes; replaces the file-based ConcatVaPoR merge)."""
    import jax
    if jax.process_count() == 1:
        return rows
    import numpy as np
    from jax.experimental import multihost_utils
    blob = ("\x1e".join("\x1f".join(r) for r in rows)).encode()
    # agree on the buffer width BEFORE building it: hosts whose blobs
    # land in different power-of-two brackets must still pass
    # same-shaped arrays to process_allgather, so the width comes from
    # the allgathered maximum length, not the local one
    lengths = multihost_utils.process_allgather(
        np.array([len(blob)], dtype=np.int64))
    max_len = int(np.asarray(lengths).max())
    width = 1 << max(16, max_len.bit_length())
    buf = np.zeros(width, dtype=np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out: List[List[str]] = []
    for host, length in enumerate(np.asarray(lengths).reshape(-1)):
        text = bytes(gathered[host][: int(length)]).decode()
        if text:
            out.extend(r.split("\x1f") for r in text.split("\x1e"))
    return out
