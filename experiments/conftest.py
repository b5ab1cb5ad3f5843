"""Standalone harness config for the experiments suite:
`python -m pytest experiments/ -q` from the repo root.

Same platform setup as tests/conftest.py (CPU + 8 virtual devices) so
Mosaic kernels run in interpret mode, plus this directory on sys.path
so the demoted modules import each other directly.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root: vapor_tpu
sys.path.insert(0, _HERE)                    # demoted modules
