"""Honest m1b full-pipeline cost under different moment formulations.
Probes return packed[...,2].sum()+[...,3].sum() so nothing is DCE'd."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused
from vapor_tpu.engine.kernel import _split_sum

k_idx = jnp.int32(0)
B = 32


def base(hap, read, rc, rlen, m, H, R, W):
    Kf = fused._hits_normal(hap, read, k_idx, m)
    Kr = fused._flip_to_dot_space(
        fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(10))
    rows = lax.broadcasted_iota(jnp.int32, (H, R), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, R), 1)
    ip = rows - m
    d = cols - ip
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = fused.skew_reduce(Ksum, W, -1, H)
    h_a = fused.skew_reduce(Ksum, W, +1, 0)
    kd = fused.kept_table_device(h_d, 10, 10, False)
    ka = fused.kept_table_device(h_a, 10, 10, False)
    keep = fused.unskew_broadcast(kd, H, -1, H, R) | \
        fused.unskew_broadcast(ka, H, +1, 0, R)
    return Kf, Kr, Ksum, keep, ip, d


def mom_two_strand(hap, read, rc, rlen, m, H, R, W):
    Kf, Kr, Ksum, keep, ip, d = base(hap, read, rc, rlen, m, H, R, W)
    out = jnp.int32(0)
    for K in (Kf, Kr):
        M = (K & keep).astype(jnp.int32)
        absd = jnp.abs(d)
        c = _split_sum(M.sum(axis=0))
        s = _split_sum((M * absd).sum(axis=0))
        out = out + c[0] + c[1] + s[0] + s[1]
    return out


def mom_ksum_where(hap, read, rc, rlen, m, H, R, W):
    Kf, Kr, Ksum, keep, ip, d = base(hap, read, rc, rlen, m, H, R, W)
    M = jnp.where(keep, Ksum, 0).astype(jnp.int32)
    absd = jnp.abs(d)
    c = _split_sum(M.sum(axis=0))
    s = _split_sum((M * absd).sum(axis=0))
    return c[0] + c[1] + s[0] + s[1]


def mom_ksum_i8(hap, read, rc, rlen, m, H, R, W):
    Kf, Kr, Ksum, keep, ip, d = base(hap, read, rc, rlen, m, H, R, W)
    M8 = Ksum * keep.astype(jnp.int8)
    absd = jnp.abs(d)
    c = _split_sum(M8.astype(jnp.int32).sum(axis=0))
    s = _split_sum((M8 * absd).sum(axis=0))
    return c[0] + c[1] + s[0] + s[1]


def mom_ksum_i16(hap, read, rc, rlen, m, H, R, W):
    """abs-d split into int16-safe pieces: M8 * lo16(absd) in int32 via
    promote; cnt via int16 row-partials."""
    Kf, Kr, Ksum, keep, ip, d = base(hap, read, rc, rlen, m, H, R, W)
    M8 = Ksum * keep.astype(jnp.int8)
    absd = jnp.abs(d)
    c = _split_sum(M8.sum(axis=0, dtype=jnp.int32))
    s = _split_sum((M8.astype(jnp.int32) * absd).sum(axis=0))
    return c[0] + c[1] + s[0] + s[1]


def run_probe(one, H, R, W, width, args):
    per = functools.partial(one, H=H, R=R, W=W)

    @jax.jit
    def run(hap, reads, rcs, rlens, ms):
        def chunk(a):
            return jax.vmap(functools.partial(per, hap))(*a)
        n = B // width
        return lax.map(chunk, (reads.reshape(n, width, -1),
                               rcs.reshape(n, width, -1),
                               rlens.reshape(n, width),
                               ms.reshape(n, width)))

    np.asarray(run(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


for H in (2048, 3072):
    R = H
    W = fused.hist_width(H, R)
    width = fused._vmap_width(H, R)
    rng = np.random.default_rng(1)
    # realistic density: read ~= noisy copy of a hap slice
    hapseq = rng.integers(0, 4, H, dtype=np.uint8)
    reads = np.tile(hapseq[:R], (B, 1))
    mut = rng.random((B, R)) < 0.08
    reads = np.where(mut, rng.integers(0, 4, (B, R)), reads).astype(np.uint8)
    rcs = rng.integers(0, 4, (B, R), dtype=np.uint8)
    args = (jnp.asarray(hapseq), jnp.asarray(reads), jnp.asarray(rcs),
            jnp.asarray(np.full(B, R - 99, np.int32)),
            jnp.asarray(np.zeros(B, np.int32)))
    out = []
    for name, fn in (("two_strand", mom_two_strand),
                     ("ksum_where", mom_ksum_where),
                     ("ksum_i8", mom_ksum_i8),
                     ("ksum_i16", mom_ksum_i16)):
        dt = run_probe(fn, H, R, W, width, args)
        out.append(f"{name}={dt/B*1e3:5.2f}")
    print(f"H=R={H} (ms/row): " + "  ".join(out), flush=True)
