"""Isolated TPU timing: skew_reduce and unskew_broadcast variants.

Timing: chain N dispatches, fetch tiny scalar — avoids the relay's
fetch-latency floor polluting per-op numbers.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused

H = R = 4096
W = fused.hist_width(H, R)


N_CHAIN = 8

def timeit(fn, arg, n=3):
    """Chain N_CHAIN variant evaluations in one jit; fetch one scalar."""
    @jax.jit
    def chained(x):
        tot = jnp.int32(0)
        for i in range(N_CHAIN):
            tot = tot + fn(jnp.roll(x, i, axis=-1))
        return tot
    np.asarray(chained(arg))
    t0 = time.perf_counter()
    outs = [chained(arg) for _ in range(n)]
    [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / n
    return (dt * 1e3 - 21.0) / N_CHAIN   # subtract fetch floor


# ---- skew variants ----------------------------------------------------

def skew_pairs(K):            # current implementation
    return fused.skew_reduce(K, W, -1, H).sum()


def skew_halves(K):
    X = K
    p = 0
    while X.shape[0] > 1:
        n2 = X.shape[0] // 2
        A, B = X[:n2], X[n2:]
        bound = 2 * (K.shape[0] // max(1, n2))
        dt = jnp.int8 if bound <= 127 else (
            jnp.int16 if bound <= 32767 else jnp.int32)
        A = A.astype(dt)
        B = B.astype(dt)
        X = jnp.pad(A, ((0, 0), (n2, 0))) + jnp.pad(B, ((0, 0), (0, n2)))
        p += n2
    return X[0].astype(jnp.int32).sum()


def skew_radix8_roll(K):
    """Fixed-width roll pyramid but int16 and W = H+R (no margin)."""
    Wr = W
    X = jnp.zeros((K.shape[0], Wr), jnp.int16).at[:, H:H + K.shape[1]].set(
        K.astype(jnp.int16))
    stride = 1
    while X.shape[0] > 1:
        rows = X.shape[0]
        g = min(8, rows)
        pad_rows = -rows % g
        if pad_rows:
            X = jnp.pad(X, ((0, pad_rows), (0, 0)))
        X = X.reshape(-1, g, Wr)
        sub = lax.broadcasted_iota(jnp.int32, (1, g, 1), 1)
        for bit in (1, 2, 4):
            if bit >= g:
                break
            rolled = jnp.roll(X, -bit * stride, axis=2)
            X = jnp.where((sub & bit) > 0, rolled, X)
        X = X.sum(axis=1, dtype=jnp.int16)
        stride *= g
    return X[0].astype(jnp.int32).sum()


# ---- unskew variants --------------------------------------------------

def mk_table():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.random(W) < 0.01)


def unskew_pairs(table):      # current implementation
    return fused.unskew_broadcast(table, H, -1, H, R).sum(dtype=jnp.int32)


def unskew_radix8(table):
    """Radix-8 broadcast + masked rolls, bool, width W."""
    X = table[None, :]
    S = 1
    while S < H:
        S *= 8
    stride = S // 8
    while X.shape[0] < H:
        rows = X.shape[0]
        X = jnp.broadcast_to(X[:, None, :], (rows, 8, W))
        sub = lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        for bit in (1, 2, 4):
            rolled = jnp.roll(X, bit * stride, axis=2)
            X = jnp.where((sub & bit) > 0, rolled, X)
        X = X.reshape(rows * 8, W)
        stride //= 8
    # c = col_offset + j - i: row i slice [col_offset - i ... ] hmm --
    # for timing purposes only take the aligned window
    return X[:H, H - 0: H - 0 + R].sum(dtype=jnp.int32)


rng = np.random.default_rng(0)
K = jnp.asarray((rng.random((H, R)) < 0.001).astype(np.int8))
print("devices:", jax.devices())
for name, fn in [("skew_pairs", skew_pairs),
                 ("skew_halves", skew_halves),
                 ("skew_radix8_i16", skew_radix8_roll)]:
    t = timeit(fn, K)
    print(f"{name:18s}: {t:7.2f} ms/op")
tab = mk_table()
for name, fn in [("unskew_pairs", unskew_pairs),
                 ("unskew_radix8", unskew_radix8)]:
    t = timeit(fn, tab)
    print(f"{name:18s}: {t:7.2f} ms/op")
