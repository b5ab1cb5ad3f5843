"""Test harness config: run JAX on CPU with 8 virtual devices.

Real-TPU execution is exercised by bench.py / the driver; unit tests
validate numerics and sharding on the host platform as recommended for
multi-chip designs without multi-chip hardware.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Every LLVM-JIT'd CPU executable pins ~5 mmap regions; a cold-cache
# full-suite run compiles enough programs to exhaust the default
# vm.max_map_count=65530, which surfaces as fatal "LLVM compilation
# error: Cannot allocate memory" / segfaults deep in jax (observed r4,
# three crashes in test_pallas_fused).  Raise the limit when the
# container permits (best-effort no-op otherwise); the shared
# persistent XLA cache keeps warm runs well under the default limit.
if os.environ.get("VAPOR_TPU_NO_SYSCTL", "") != "1":
    try:
        with open("/proc/sys/vm/max_map_count", "r+") as _f:
            if int(_f.read()) < 262144:
                _f.seek(0)
                _f.write("262144")
                sys.stderr.write(
                    "conftest: raised vm.max_map_count to 262144 for "
                    "LLVM-JIT mmaps (set VAPOR_TPU_NO_SYSCTL=1 to "
                    "disable)\n")
    except Exception:
        pass

# the axon sitecustomize hard-sets jax_platforms="axon,cpu" before user
# code runs; force it back so unit tests stay on the virtual-CPU mesh
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)
