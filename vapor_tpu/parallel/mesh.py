"""Device-mesh parallelism for event/read scoring — the production path.

The reference scales only by per-contig WDL scatter with file-based
merge (SURVEY §2.5, /root/reference/wdl/VaPoRVcf.wdl:44-77).  The
TPU-native equivalent here is **data parallelism over (read x
haplotype) work rows**: every `fused_batch` call (the single scoring
entry used by the CLI backends, the batching coalescer and the bench)
shards its row batch across a 1-D ``dp`` mesh with `shard_map` whenever
more than one device is visible, and the per-shard evaluable-dot totals
are `psum`-reduced across ``dp`` — the in-job collective replacing the
WDL ConcatVaPoR gather (TasksBenchmark.wdl:249-317).  Per-row math is
integer-exact, so output bytes are identical at any device count
(tests/test_mesh_parity.py).

Why dp-only by default: one work row's state is a single (H, R) <= 8192^2
int8 hit matrix plus O(H+R) histograms — far under one chip's HBM — so
sharding *within* a row (an ``sp`` axis over read columns or histogram
buckets) buys no memory headroom and costs boundary collectives per
stage.  Row-DP keeps every collective at one psum per call.  An ``sp``
axis can still be requested explicitly via make_mesh(n, dp=..., sp=...)
for experiments.

Multi-host: each host shards the worklist by contig (parallel.multihost)
and only fixed-width result rows cross DCN.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def device_count() -> int:
    """Devices the scoring mesh may span.  VAPOR_MESH_DEVICES caps it
    (tests use this to compare meshings in one process); VAPOR_MESH=0
    disables the mesh path entirely."""
    if os.environ.get("VAPOR_MESH", "1") == "0":
        return 1
    n = len(jax.devices())
    cap = os.environ.get("VAPOR_MESH_DEVICES")
    if cap:
        n = min(n, max(1, int(cap)))
    return n


def make_mesh(n_devices: int, dp: int = 0, sp: int = 0) -> Mesh:
    """(dp, sp) mesh over the first n_devices devices.

    Production default is dp = n_devices, sp = 1: scoring work rows are
    independent, so row data-parallelism is the only axis that pays at
    CLI shapes (see module docstring).  Explicit dp/sp must factor
    n_devices exactly.
    """
    if dp == 0 and sp == 0:
        dp, sp = n_devices, 1
    elif dp == 0:
        dp = n_devices // sp
    elif sp == 0:
        sp = n_devices // dp
    if dp * sp != n_devices or dp < 1 or sp < 1:
        raise ValueError(
            f"dp ({dp}) x sp ({sp}) must equal n_devices ({n_devices})")
    devs = np.array(jax.devices()[:n_devices]).reshape(dp, sp)
    return Mesh(devs, ("dp", "sp"))


_MESH_CACHE: Dict[int, Mesh] = {}
_STEP_CACHE: Dict[Tuple, object] = {}


def _mesh_for(dp: int) -> Mesh:
    if dp not in _MESH_CACHE:
        _MESH_CACHE[dp] = make_mesh(dp)
    return _MESH_CACHE[dp]


def row_sharded_step(mesh: Mesh, H: int, R: int, scorer: str,
                     width: int):
    """Compile the data-parallel scoring step over `mesh`: work rows
    sharded over ``dp``; each device runs the same `_chunked_rows` body
    the single-chip jit runs; the evaluable-dot totals are psum-reduced
    over ``dp`` (a real ICI collective in the production path).

    Returns step(haps, reads, rcs, rlens, ms, k_idx) ->
    (packed row stats sharded over dp, global dot total).
    """
    key = (mesh, H, R, scorer, width)
    step = _STEP_CACHE.get(key)
    if step is not None:
        return step
    from ..engine.fused import _chunked_rows

    def per_shard(haps, reads, rcs, rlens, ms, k_idx):
        packed = _chunked_rows(haps, reads, rcs, rlens, ms, k_idx,
                               H, R, scorer, width)
        # evaluable-dot total on this shard -> global via psum over dp
        # (split-sum packing: hi<<16 + lo per strand, engine.fused)
        n_local = ((packed[:, 0] << 16) + packed[:, 1]
                   + (packed[:, 2] << 16) + packed[:, 3]).sum()
        n_global = lax.psum(n_local, axis_name="dp")
        return packed, n_global

    try:
        from jax import shard_map
        check_kw = {"check_vma": False}
    except ImportError:          # older jax
        from jax.experimental.shard_map import shard_map
        check_kw = {"check_rep": False}
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P()),
        out_specs=(P("dp"), P()),
        **check_kw)
    step = jax.jit(fn)
    _STEP_CACHE[key] = step
    return step


def maybe_mesh_rows(haps, reads, rcs, rlens, ms, k_idx, H: int, R: int,
                    scorer: str, width: int) -> Optional[jnp.ndarray]:
    """Mesh-dispatch one fused_batch row batch, or None when a single
    device (or VAPOR_MESH=0) makes the plain jit the right path.

    Rows are padded to a dp*width multiple; dp is capped by the row
    count so small batches don't pay 8x padding.  The trailing slice
    stays lazy — hosts fetch the packed stats once, as today.
    """
    n = device_count()
    if n <= 1:
        return None
    from ..engine.kernel import HAP_PAD, READ_PAD
    B = reads.shape[0]
    dp = min(n, -(-B // width))
    if dp <= 1:
        return None
    if rcs is None:
        # hosts ship the forward strand only (engine.fused); the mesh
        # step shards both strands, so materialize the derived rc rows
        from ..engine.fused import _derive_rc_batch
        rcs = _derive_rc_batch(reads, rlens)
    mesh = _mesh_for(dp)
    padded = -(-B // (dp * width)) * (dp * width)
    pad = padded - B
    if pad:
        haps = jnp.pad(haps, ((0, pad), (0, 0)), constant_values=HAP_PAD)
        reads = jnp.pad(reads, ((0, pad), (0, 0)),
                        constant_values=READ_PAD)
        rcs = jnp.pad(rcs, ((0, pad), (0, 0)), constant_values=READ_PAD)
        rlens = jnp.pad(rlens, (0, pad), constant_values=1)
        ms = jnp.pad(ms, (0, pad))
    step = row_sharded_step(mesh, H, R, scorer, width)
    packed, _n_global = step(haps, reads, rcs, rlens, ms,
                             jnp.asarray(k_idx, jnp.int32))
    return packed[:B]
