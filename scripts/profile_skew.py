"""Benchmark skew-histogram strategies on real TPU.

Strategies for h[c] = sum_{i,j : col_offset + j + sign*i = c} K[i,j]:
  A. roll pyramid radix-8 (current fused.skew_reduce), int32
  B. roll pyramid radix-8, int16 accumulator
  C. pad+reshape row-shift trick (one reshape, then column sum)
  D. reshape trick, int16
  E. matmul skew: shift via one-hot matrix per 128-row block (MXU)
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from vapor_tpu.engine import fused

RADIX = 8


def pyramid(K, W, sign, col_offset, dtype):
    H, R = K.shape
    X = jnp.zeros((H, W), dtype).at[:, col_offset:col_offset + R].set(
        K.astype(dtype))
    stride = 1
    while X.shape[0] > 1:
        rows = X.shape[0]
        g = min(RADIX, rows)
        pad_rows = -rows % g
        if pad_rows:
            X = jnp.pad(X, ((0, pad_rows), (0, 0)))
        X = X.reshape(-1, g, W)
        sub = lax.broadcasted_iota(jnp.int32, (1, g, 1), 1)
        for bit in (1, 2, 4):
            if bit >= g:
                break
            rolled = jnp.roll(X, sign * bit * stride, axis=2)
            X = jnp.where((sub & bit) > 0, rolled, X)
        X = X.sum(axis=1, dtype=dtype)
        stride *= g
    return X[0]


def reshape_trick(K, W, sign, col_offset, dtype):
    """Row i shifted by sign*i via the pad+reshape trick, then col-sum."""
    H, R = K.shape
    Kd = K.astype(dtype)
    if sign > 0:
        # shift row i right by i: pad each row to W+1 then flatten
        X = jnp.zeros((H, W + 1), dtype).at[:, col_offset:col_offset + R].set(Kd)
        flat = X.reshape(-1)[: H * W].reshape(H, W)
        return flat.sum(axis=0, dtype=dtype)  # row i ends shifted by -i? verify below
    else:
        X = jnp.zeros((H, W - 1), dtype).at[:, col_offset - (H - 1):
                                            col_offset - (H - 1) + R].set(Kd)
        flat = jnp.pad(X.reshape(-1), (0, H))[: H * W].reshape(H, W)
        return flat.sum(axis=0, dtype=dtype)


def matmul_skew(K, W, sign, col_offset):
    """Per-128-block: shift all rows by block offset (roll), then within
    block use f32 matmul with a shift-one-hot to finish: S @ X where
    S[r, i] selects... simpler: skew within block via small pyramid,
    cross-block via roll; MXU does the final (H/128) x 128 x W sum as
    ones-vector matmul."""
    H, R = K.shape
    T = 128
    nb = H // T
    X = jnp.zeros((H, W), jnp.float32).at[:, col_offset:col_offset + R].set(
        K.astype(jnp.float32))
    Xb = X.reshape(nb, T, W)
    # within-block shift by row r in [0,128): pyramid radix-8 on floats
    sub = lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    for bit in (1, 2, 4, 8, 16, 32, 64):
        rolled = jnp.roll(Xb, sign * bit, axis=2)
        Xb = jnp.where((sub & bit) > 0, rolled, Xb)
    # sum within block on MXU: (nb, T, W) -> (nb, W)
    ones = jnp.ones((T,), jnp.float32)
    Y = jnp.einsum("btw,t->bw", Xb, ones)
    # cross-block shift by sign*b*T then sum
    subb = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    out = jnp.zeros((W,), jnp.float32)
    bit = 1
    Yc = Y
    while bit < nb:
        rolled = jnp.roll(Yc, sign * bit * T, axis=1)
        Yc = jnp.where((subb & bit) > 0, rolled, Yc)
        bit *= 2
    return Yc.sum(axis=0)


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for H in (2048, 4096):
        R = H
        W = fused.hist_width(H, R)
        K = jnp.asarray((rng.random((H, R)) < 0.001).astype(np.int8))
        ref = np.asarray(fused.skew_reduce(K, W, -1, H))

        fA = jax.jit(functools.partial(pyramid, W=W, sign=-1,
                                       col_offset=H, dtype=jnp.int32))
        fB = jax.jit(functools.partial(pyramid, W=W, sign=-1,
                                       col_offset=H, dtype=jnp.int16))
        fC = jax.jit(functools.partial(reshape_trick, W=W, sign=-1,
                                       col_offset=H, dtype=jnp.int32))
        fE = jax.jit(functools.partial(matmul_skew, W=W, sign=-1,
                                       col_offset=H))
        tA, oA = timeit(fA, K)
        tB, oB = timeit(fB, K)
        tC, oC = timeit(fC, K)
        tE, oE = timeit(fE, K)
        okA = np.array_equal(np.asarray(oA), ref)
        okB = np.array_equal(np.asarray(oB).astype(np.int32), ref)
        okC = np.array_equal(np.asarray(oC), ref)
        okE = np.array_equal(np.asarray(oE).astype(np.int32), ref)
        print(f"H={H} W={W}: pyr_i32={tA*1e3:7.2f}ms({okA}) "
              f"pyr_i16={tB*1e3:7.2f}ms({okB}) "
              f"reshape_i32={tC*1e3:7.2f}ms({okC}) "
              f"matmul_f32={tE*1e3:7.2f}ms({okE})")


main()
