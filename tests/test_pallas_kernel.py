"""Pallas histogram kernel vs the fused-XLA engine (interpret mode)."""
import random

import numpy as np
import pytest

from vapor_tpu.engine import oracle
from vapor_tpu.engine.fused import FusedBackend
from vapor_tpu.engine.pallas_kernel import pallas_hist
from vapor_tpu.io.fasta import reverse_complement


def _mutate(seq, rng, err=0.08):
    out = []
    for ch in seq:
        r = rng.random()
        if r < err / 3:
            out.append(rng.choice([b for b in "ACGT" if b != ch]))
        elif r < 2 * err / 3:
            out.append(rng.choice("ACGT"))
            out.append(ch)
        elif r < err:
            continue
        else:
            out.append(ch)
    return "".join(out)


@pytest.mark.parametrize("k", [10, 20])
def test_pallas_hist_matches_fused(k):
    rng = random.Random(2024)
    H = R = 512
    body = "".join(rng.choice("ACGT") for _ in range(160))
    left = "".join(rng.choice("ACGT") for _ in range(140))
    right = "".join(rng.choice("ACGT") for _ in range(140))
    hap_s = left + body + right
    donors = [hap_s, left + reverse_complement(body) + right,
              left + right]
    reads = [[_mutate(donors[i % 3], rng), [0, 0, 17][i % 3], f"r{i}"]
             for i in range(4)]

    be = FusedBackend()
    enc = be._encode_reads(reads, R)
    hap_codes = be._encode_hap(hap_s, H)

    # fused-engine reference histograms via its public run
    from vapor_tpu.engine.fused import fused_batch
    import jax.numpy as jnp
    fw, rc, rlens, ms = enc
    haps = np.broadcast_to(hap_codes, (fw.shape[0], H))
    h_d, h_a, packed = fused_batch(
        jnp.asarray(haps), jnp.asarray(fw), jnp.asarray(rc),
        jnp.asarray(rlens), jnp.asarray(ms),
        jnp.int32(k // 10 - 1), H=H, R=R, scorer="m1b",
        want_hists=True)
    h_d = np.asarray(h_d)
    h_a = np.asarray(h_a)
    s = np.asarray(packed, dtype=np.int64)[:, :6]
    n_dots = (s[:, 0] << 16) + s[:, 1] + (s[:, 2] << 16) + s[:, 3]

    p_hd, p_ha, p_n = pallas_hist(hap_codes, fw, rc, rlens, ms, k,
                                  interpret=True)
    W = min(p_hd.shape[1], h_d.shape[1])
    assert np.array_equal(p_n, n_dots)
    assert np.array_equal(p_hd[:, :W], h_d[:, :W])
    assert np.array_equal(p_ha[:, :W], h_a[:, :W])
