"""Device-mesh parallelism for event/read scoring.

The reference scales only by per-contig WDL scatter with file-based
merge (SURVEY §2.5).  The TPU-native equivalents here:

* **data parallelism** over the (event x read) batch: reads sharded
  across the mesh's ``dp`` axis with `shard_map`; each device runs the
  sheared-coordinate kernel on its shard;
* **histogram-space parallelism** over the ``sp`` axis: the per-read
  histogram/moment buckets are reduce-scattered so each device owns a
  bucket shard (rides ICI, not DCN);
* **collective aggregation** replacing the WDL ConcatVaPoR merge: the
  per-event support counts (GS numerator/denominator) are `psum`-reduced
  across ``dp`` so every device sees the event totals.

Multi-host: each host shards the worklist by contig (cli --shard-index /
--num-shards) and only result rows cross DCN.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.fused import _fused_one, hist_width


def make_mesh(n_devices: int, dp: int = 0, sp: int = 1) -> Mesh:
    """2-D mesh (dp, sp) over the first n_devices devices."""
    devs = np.array(jax.devices()[:n_devices])
    if dp == 0:
        sp = 1
        while (n_devices // sp) * sp != n_devices or sp > n_devices:
            sp += 1
        sp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
        dp = n_devices // sp
    return Mesh(devs.reshape(dp, sp), ("dp", "sp"))


def sharded_event_step(mesh: Mesh, H: int, R: int):
    """Compile one data-parallel scoring step over `mesh` on the fused
    v2 engine (the production scoring path).

    Returns step(haps, reads, rcs, rlens, ms) ->
      (hist_d shard, packed stats, support_psum):
    (read x haplotype) work rows — each with its own haplotype, the
    cross-event layout — are sharded over dp, bucket histograms are
    reduce-scattered over sp, and the evaluable-dot totals psum-reduced
    over dp — real ICI collectives (psum, reduce_scatter) around the
    same per-row computation `fused_batch` runs on one chip.
    """
    WH = hist_width(H, R)
    n_sp = mesh.shape["sp"]
    pad = (-WH) % n_sp

    def per_shard(haps, reads, rcs, rlens, ms):
        def one(args):
            hap, read, rc, rlen, m = args
            h_d, h_a, scalars, mom = _fused_one(
                hap, read, rc, rlen, m, jnp.int32(0), H, R, "m1b")
            return h_d, jnp.concatenate([scalars, mom])
        h_d, packed = lax.map(one, (haps, reads, rcs, rlens, ms))
        # total dots on this dp shard -> global via psum over dp (ICI)
        n_local = ((packed[:, 0] << 16) + packed[:, 1]
                   + (packed[:, 2] << 16) + packed[:, 3]).sum()
        n_global = lax.psum(n_local, axis_name="dp")
        # shard histogram buckets across sp (reduce_scatter over ICI)
        h_pad = jnp.pad(h_d.sum(axis=0), (0, pad))
        h_shard = lax.psum_scatter(
            h_pad.reshape(n_sp, -1), axis_name="sp", scatter_dimension=0,
            tiled=False)
        return h_shard, packed, n_global

    from jax.experimental.shard_map import shard_map
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("sp"), P("dp"), P()),
        check_rep=False)
    return jax.jit(fn)
