"""Honest per-stage costs at B=64 (fetch floor amortized to ~0.4ms/row).
Every probe ends in a tiny per-row int32 fetched with np.asarray."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused
from vapor_tpu.engine.kernel import _split_sum

k_idx = jnp.int32(0)
K = 10
B = 64


def v_hits(hap, read, rc, rlen, m, H, R, W):
    Kf = fused._hits_normal(hap, read, k_idx, m)
    Kr = fused._flip_to_dot_space(
        fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(K))
    return Kf.sum(dtype=jnp.int32) + Kr.sum(dtype=jnp.int32)


def v_skew(hap, read, rc, rlen, m, H, R, W):
    Kf = fused._hits_normal(hap, read, k_idx, m)
    Kr = fused._flip_to_dot_space(
        fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(K))
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = fused.skew_reduce(Ksum, W, -1, H)
    h_a = fused.skew_reduce(Ksum, W, +1, 0)
    return h_d.sum() + h_a.sum()


def v_unskew(hap, read, rc, rlen, m, H, R, W):
    Kf = fused._hits_normal(hap, read, k_idx, m)
    Kr = fused._flip_to_dot_space(
        fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(K))
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = fused.skew_reduce(Ksum, W, -1, H)
    h_a = fused.skew_reduce(Ksum, W, +1, 0)
    kd = fused.kept_table_device(h_d, 10, 10, False)
    ka = fused.kept_table_device(h_a, 10, 10, False)
    keep = fused.unskew_broadcast(kd, H, -1, H, R) | \
        fused.unskew_broadcast(ka, H, +1, 0, R)
    return (Kf & keep).sum(dtype=jnp.int32)


def v_full(hap, read, rc, rlen, m, H, R, W):
    o = fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R, "m1b")
    return o[2].sum() + o[3].sum()


def v_full_del(hap, read, rc, rlen, m, H, R, W):
    o = fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R, "del")
    return o[2].sum() + o[3].sum()


def v_hist(hap, read, rc, rlen, m, H, R, W):
    """hist-domain m1b: no 2-D moment passes, one unskew."""
    Kf = fused._hits_normal(hap, read, k_idx, m)
    Kr = fused._flip_to_dot_space(
        fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(K))
    f8 = Kf.astype(jnp.int8)
    r8 = Kr.astype(jnp.int8)
    hf_d = fused.skew_reduce(f8, W, -1, H, per_cell=1)
    hr_d = fused.skew_reduce(r8, W, -1, H, per_cell=1)
    hf_a = fused.skew_reduce(f8, W, +1, 0, per_cell=1)
    hr_a = fused.skew_reduce(r8, W, +1, 0, per_cell=1)
    h_d = hf_d + hr_d
    h_a = hf_a + hr_a
    kd = fused.kept_table_device(h_d, 10, 10, False)
    ka = fused.kept_table_device(h_a, 10, 10, False)
    KA = fused.unskew_broadcast(ka, H, +1, 0, R)
    g3f = fused.skew_reduce((Kf & KA).astype(jnp.int8), W, -1, H,
                            per_cell=1)
    g3r = fused.skew_reduce((Kr & KA).astype(jnp.int8), W, -1, H,
                            per_cell=1)
    hmf = jnp.where(kd, hf_d, g3f)
    hmr = jnp.where(kd, hr_d, g3r)
    idx = lax.broadcasted_iota(jnp.int32, (W,), 0)
    v = jnp.abs(idx - H + m)
    out = jnp.int32(0)
    for hm in (hmf, hmr):
        c = _split_sum(hm)
        p = hm * (v & 0xFFFF)
        s = _split_sum(p)
        out = out + c[0] + c[1] + s[0] + s[1]
    return out


def run_probe(one, H, R, W, width, args):
    per = functools.partial(one, H=H, R=R, W=W)

    @functools.partial(jax.jit, static_argnames=())
    def run(hap, reads, rcs, rlens, ms):
        def chunk(a):
            return jax.vmap(functools.partial(per, hap))(*a)
        n_chunks = B // width
        return lax.map(chunk, (reads.reshape(n_chunks, width, -1),
                               rcs.reshape(n_chunks, width, -1),
                               rlens.reshape(n_chunks, width),
                               ms.reshape(n_chunks, width)))

    np.asarray(run(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


for H in (2048, 3072, 4096):
    R = H
    W = fused.hist_width(H, R)
    width = fused._vmap_width(H, R)
    rng = np.random.default_rng(1)
    hapseq = rng.integers(0, 4, H, dtype=np.uint8)
    rd = np.tile(hapseq[:R], (B, 1))
    mut = rng.random((B, R)) < 0.08
    rd = np.where(mut, rng.integers(0, 4, (B, R)), rd).astype(np.uint8)
    hap = jnp.asarray(hapseq)
    reads = jnp.asarray(rd)
    rcs = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rlens = jnp.asarray(rng.integers(R // 2, R - 1, B).astype(np.int32))
    ms = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))
    args = (hap, reads, rcs, rlens, ms)
    out = []
    for name, fn in (("hits", v_hits), ("skew", v_skew),
                     ("unskew", v_unskew), ("full", v_full),
                     ("del", v_full_del), ("hist", v_hist)):
        dt = run_probe(fn, H, R, W, width, args)
        out.append(f"{name}={dt/B*1e3:5.2f}")
    print(f"H=R={H} (ms/row): " + "  ".join(out), flush=True)
