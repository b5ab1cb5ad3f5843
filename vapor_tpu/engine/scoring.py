"""Scoring backend interface: oracle (numpy) now, TPU batch later.

Validators request scores for a whole read list at once so the device
backend can batch (read x haplotype) pairs; the numpy backend simply
loops the oracle scorers.
"""
from __future__ import annotations

import os
from typing import List, Sequence

from . import oracle


class NumpyBackend:
    """Per-read vectorized numpy scoring (host)."""

    name = "numpy"

    def score_batch(self, scorer: str, ref_seq: str, alt_seq: str,
                    reads: Sequence[Sequence], window: int
                    ) -> List[List[float]]:
        fn = oracle.SCORERS[scorer]
        return [fn(ref_seq, alt_seq, r[0], r[1], window) for r in reads]


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: bucketed shapes compile once
    per machine, not once per process (first TPU compiles are ~4-40s).
    Also valuable on CPU: a cold full-test-suite run does ~2.5x the
    wall time AND enough LLVM-JIT compilation that mmap regions can
    exhaust a default vm.max_map_count (observed r4 as fatal 'LLVM
    compilation error: Cannot allocate memory' — see tests/conftest.py,
    which also raises the limit when permitted)."""
    try:
        import jax
        cache_dir = os.environ.get(
            "VAPOR_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "vapor_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


_PROBE_OK = None


def _device_reachable() -> bool:
    """Probe accelerator init in a subprocess with a timeout: a wedged
    TPU relay hangs device init forever, which would hang the CLI's
    first device call.  Skipped (True) when the CPU platform is forced
    — CPU-XLA init can't hang.  Result cached per process."""
    global _PROBE_OK
    if _PROBE_OK is not None:
        return _PROBE_OK
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        _PROBE_OK = True
        return True
    try:
        import jax
        if jax.config.jax_platforms == "cpu":
            _PROBE_OK = True
            return True
    except Exception:
        pass
    import subprocess
    import sys
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); import jax.numpy as jnp; "
             "(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"],
            # must exceed worst observed claim latency (~6 min after a
            # relay wedge): killing the probe mid-claim wedges the grant
            timeout=float(os.environ.get("VAPOR_PROBE_TIMEOUT", "600")),
            check=True, capture_output=True)
        _PROBE_OK = True
    except Exception:
        _PROBE_OK = False
    return _PROBE_OK


def get_backend(name: str = "auto"):
    """Resolve the scoring backend: 'numpy', 'jax', or 'auto'."""
    if name == "numpy":
        return NumpyBackend()
    if name in ("jax", "auto", "jax-batch"):
        if name == "auto" and not _device_reachable():
            import sys
            print("vapor-tpu: accelerator unreachable — scoring on "
                  "the numpy host backend", file=sys.stderr)
            return NumpyBackend()
        try:
            _enable_compilation_cache()
            from .batching import BatchingBackend
            return BatchingBackend()
        except Exception:
            if name != "auto":
                raise
            return NumpyBackend()
    if name == "jax-nobatch":
        _enable_compilation_cache()
        from .fused import FusedBackend
        return FusedBackend()
    if name == "jax-v1":
        _enable_compilation_cache()
        from .kernel import JaxBackend
        return JaxBackend()
    raise ValueError(f"unknown backend {name!r}")
