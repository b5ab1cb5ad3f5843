"""Prototype timing: hist-domain m1b moments + MXU one-hot hits.

Chained iterations inside one jit (carry-dependent inputs defeat CSE)
so the ~23ms relay fetch floor doesn't mask per-variant compute.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused
from vapor_tpu.engine.kernel import _split_sum

ITERS = 6
k_idx = jnp.int32(0)
K = 10


def one_current(hap, read, rc, rlen, m, H, R, W):
    return fused._fused_one(hap, read, rc, rlen, m, k_idx, H, R, "m1b")[2].sum()


def one_hist(hap, read, rc, rlen, m, H, R, W):
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
    g3f = fused.skew_reduce((Kf & KA).astype(jnp.int8), W, -1, H, per_cell=1)
    g3r = fused.skew_reduce((Kr & KA).astype(jnp.int8), W, -1, H, per_cell=1)
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


def one_hits_mxu(hap, read, rc, rlen, m, H, R, W):
    """MXU path for the hit matrices only (then same skews as current)."""
    def onehot(seq, L):
        sp = jnp.pad(seq, (0, K)).astype(jnp.int32)
        cols = []
        for t in range(K):
            s = lax.slice_in_dim(sp, t, t + L)
            for b in range(4):
                cols.append((s == b))
        return jnp.stack(cols, 1).astype(jnp.bfloat16)

    A = onehot(hap, H)
    Bm = onehot(read, R)
    Cm = onehot(rc, R)
    rows_m = lax.broadcasted_iota(jnp.int32, (H, 1), 0) >= m
    Mf = jax.lax.dot_general(A, Bm, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Kf = (Mf == K) & rows_m
    Mr = jax.lax.dot_general(A, Cm, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Kr0 = (Mr == K) & rows_m
    Kr = fused._flip_to_dot_space(Kr0, rlen, jnp.int32(K))
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = fused.skew_reduce(Ksum, W, -1, H)
    h_a = fused.skew_reduce(Ksum, W, +1, 0)
    return h_d.sum() + h_a.sum()


def one_hits_cur(hap, read, rc, rlen, m, H, R, W):
    Kf = fused._hits_normal(hap, read, k_idx, m)
    Kr = fused._flip_to_dot_space(
        fused._hits_normal(hap, rc, k_idx, m), rlen, jnp.int32(K))
    Ksum = Kf.astype(jnp.int8) + Kr.astype(jnp.int8)
    h_d = fused.skew_reduce(Ksum, W, -1, H)
    h_a = fused.skew_reduce(Ksum, W, +1, 0)
    return h_d.sum() + h_a.sum()


def make_runner(one, H, R, W, B, width):
    per = functools.partial(one, H=H, R=R, W=W)

    @jax.jit
    def run(hap, reads, rcs, rlens, ms):
        def body(carry, _):
            r2 = reads ^ (carry & 1).astype(jnp.uint8)
            def chunk(args):
                return jax.vmap(functools.partial(per, hap))(*args)
            n_chunks = B // width
            o = lax.map(chunk, (r2.reshape(n_chunks, width, -1),
                                rcs.reshape(n_chunks, width, -1),
                                rlens.reshape(n_chunks, width),
                                ms.reshape(n_chunks, width)))
            return o.reshape(-1)[0], ()
        out, _ = lax.scan(body, jnp.int32(0), None, length=ITERS)
        return out
    return run


def t(fn, args, n=3):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


for H in (2048, 3072, 4096):
    R = H
    W = fused.hist_width(H, R)
    B = 8
    width = {2048: 4, 3072: 2, 4096: 2}[H]
    rng = np.random.default_rng(0)
    hap = jnp.asarray(rng.integers(0, 4, H, dtype=np.uint8))
    reads = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rcs = jnp.asarray(rng.integers(0, 4, (B, R), dtype=np.uint8))
    rlens = jnp.full((B,), R - 1, jnp.int32)
    ms = jnp.zeros((B,), jnp.int32)
    args = (hap, reads, rcs, rlens, ms)
    res = {}
    for name, one in (("m1b_cur", one_current), ("m1b_hist", one_hist),
                      ("hits_cur", one_hits_cur),
                      ("hits_mxu", one_hits_mxu)):
        dt = t(make_runner(one, H, R, W, B, width), args)
        res[name] = dt / ITERS / B * 1e3
    print(f"H=R={H}: " + "  ".join(
        f"{k}={v:6.3f}ms/row" for k, v in res.items()), flush=True)
