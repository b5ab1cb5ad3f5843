"""vmap chunk width sweep on the full m1b pipeline, realistic data."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused

k_idx = jnp.int32(0)
B = 16


def probe(H, R, width, args):
    def one(hap, read, rc, rlen, m):
        return fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R,
                                "m1b")

    @jax.jit
    def run(hap, reads, rcs, rlens, ms):
        def chunk(a):
            return jax.vmap(functools.partial(one, hap))(*a)
        n = B // width
        o = lax.map(chunk, (reads.reshape(n, width, -1),
                            rcs.reshape(n, width, -1),
                            rlens.reshape(n, width),
                            ms.reshape(n, width)))
        return o[2], o[3]

    np.asarray(run(*args)[1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args)[1])
        best = min(best, time.perf_counter() - t0)
    return best


for H in (4096, 6144, 8192):
    R = H
    rng = np.random.default_rng(1)
    hapseq = rng.integers(0, 4, H, dtype=np.uint8)
    reads = np.tile(hapseq[:R], (B, 1))
    mut = rng.random((B, R)) < 0.08
    reads = np.where(mut, rng.integers(0, 4, (B, R)), reads).astype(np.uint8)
    rcs = rng.integers(0, 4, (B, R), dtype=np.uint8)
    args = (jnp.asarray(hapseq), jnp.asarray(reads), jnp.asarray(rcs),
            jnp.asarray(np.full(B, R - 99, np.int32)),
            jnp.asarray(np.zeros(B, np.int32)))
    out = []
    for width in (8, 16):
        dt = probe(H, R, width, args)
        out.append(f"w{width}={dt/B*1e3:5.2f}")
    print(f"H=R={H} (ms/row): " + "  ".join(out), flush=True)
