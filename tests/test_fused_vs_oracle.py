"""Differential tests: FusedBackend (v2 fused engine) vs the oracle."""
import random

import pytest

from vapor_tpu.engine import oracle
from vapor_tpu.engine.fused import FusedBackend
from vapor_tpu.io.fasta import reverse_complement


@pytest.fixture(scope="module")
def backend():
    return FusedBackend()


def _mutate(seq, rng, err):
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


def _scenarios():
    rng = random.Random(314)
    cases = []
    for svtype in ("DEL", "INV", "DUP", "NONE"):
        for trial in range(2):
            flank = rng.choice([100, 170])
            body_len = rng.choice([130, 260])
            left = "".join(rng.choice("ACGT") for _ in range(flank))
            body = "".join(rng.choice("ACGT") for _ in range(body_len))
            right = "".join(rng.choice("ACGT") for _ in range(flank))
            ref_hap = left + body + right
            if svtype == "DEL":
                alt_hap = left + right
            elif svtype == "INV":
                alt_hap = left + reverse_complement(body) + right
            elif svtype == "DUP":
                alt_hap = left + body * 2 + right
            else:
                alt_hap = ref_hap
            reads = []
            for i in range(6):
                donor = alt_hap if i % 2 == 0 else ref_hap
                miss = rng.choice([0, 0, 23])
                reads.append([_mutate(donor, rng, 0.08), miss, f"r{i}"])
            window = rng.choice([10, 20, 30, 40])
            cases.append((ref_hap, alt_hap, reads, window))
    base = "".join(random.Random(15).choice("ACGT") for _ in range(340))
    odd = base[:40] + "NNNNNNRYSW" + base[40:150].lower() + base[150:]
    reads = [[_mutate(odd, random.Random(16), 0.1), 0, "rA"],
             ["ACGTACG", 0, "rB"],
             [_mutate(base, random.Random(17), 0.02), 5, "rC"]]
    cases.append((odd, odd[:120] + odd[180:], reads, 10))
    # palindromic content (multiplicity-2 dots)
    pal = "ACGTACGTAATTCCGGAATT" * 12
    cases.append((pal, pal, [[pal, 0, "p"]], 10))
    return cases


@pytest.mark.parametrize("scorer", ["abs_dis_m1b", "within_10perc_m1b",
                                    "redefine_diagonal"])
def test_fused_scorer_parity(backend, scorer):
    nontrivial = 0
    for ref_hap, alt_hap, reads, window in _scenarios():
        expect = [oracle.SCORERS[scorer](ref_hap, alt_hap, r[0], r[1],
                                         window) for r in reads]
        got = backend.score_batch(scorer, ref_hap, alt_hap, reads, window)
        for g, e, r in zip(got, expect, reads):
            assert [float(x) for x in g] == [float(x) for x in e], (
                f"{scorer} mismatch read={r[2]} w={window}: {g} != {e}")
        nontrivial += sum(1 for e in expect if e != [0, 0])
    assert nontrivial >= 5


def test_fused_large_bucket(backend):
    """Bench-sized haplotypes exercise the 2048 bucket."""
    rng = random.Random(2718)
    flank, body_len = 480, 700
    left = "".join(rng.choice("ACGT") for _ in range(flank))
    body = "".join(rng.choice("ACGT") for _ in range(body_len))
    right = "".join(rng.choice("ACGT") for _ in range(flank))
    ref_hap = left + body + right
    alt_hap = left + right
    reads = [[_mutate(alt_hap if i % 2 == 0 else ref_hap, rng, 0.08),
              0, f"r{i}"] for i in range(3)]
    for scorer in ("abs_dis_m1b", "within_10perc_m1b"):
        expect = [oracle.SCORERS[scorer](ref_hap, alt_hap, r[0], r[1], 10)
                  for r in reads]
        got = backend.score_batch(scorer, ref_hap, alt_hap, reads, 10)
        assert [[float(x) for x in g] for g in got] == \
            [[float(x) for x in e] for e in expect]
    assert any(e != [0, 0] for e in expect)


def test_hits_mxu_equals_hits_normal():
    """The MXU one-hot matmul hit detector (production path on TPU)
    is bit-identical to the shift-AND detector (CPU path) across the
    window sizes and alphabet edge cases."""
    import numpy as np
    import jax.numpy as jnp
    from vapor_tpu.engine import fused, oracle

    rng = np.random.default_rng(42)
    for k_idx, k in enumerate((10, 20, 30, 40)):
        H, R = 160, 192
        hap_s = "".join(rng.choice(list("ACGTNacgtn")) for _ in range(H - 7))
        read_s = hap_s[3:R - 20] + "NnXx="
        hap = np.full(H, fused.HAP_PAD, np.uint8)
        hap[:len(hap_s)] = oracle.encode(hap_s)
        read = np.full(R, fused.READ_PAD, np.uint8)
        codes = oracle.encode(read_s)
        read[:len(codes)] = codes
        for m in (0, 13):
            a = np.asarray(fused._hits_normal(
                jnp.asarray(hap), jnp.asarray(read), jnp.int32(k_idx),
                jnp.int32(m)))
            b = np.asarray(fused._hits_mxu(
                jnp.asarray(hap), jnp.asarray(read), jnp.int32(k_idx),
                jnp.int32(m)))
            assert np.array_equal(a, b), (k, m)
            c = np.asarray(fused._hits_packed(
                jnp.asarray(hap), jnp.asarray(read), jnp.int32(k_idx),
                jnp.int32(m)))
            assert np.array_equal(a, c), ("packed", k, m)
