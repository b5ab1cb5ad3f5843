"""Device window refiner vs host window_size_refine parity."""
import random

import pytest

from vapor_tpu.engine.window import window_size_refine
from vapor_tpu.engine.window_device import DeviceWindowRefiner


def _rand(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def cases():
    rng = random.Random(9)
    base = _rand(rng, 900)
    out = [
        base,                                      # clean random
        _rand(rng, 300),                           # short
        base[:300] + base[100:300] + base[300:],   # duplicated block
        (base[:80] * 6) + base[:200],              # heavy tandem repeat
        base[:400] + "N" * 150 + base[400:],       # too many Ns -> None
        base[:200] + "X" * 500 + base[200:500],    # X stripped
        base[:60].lower() + base[60:500],          # soft-masked
        _rand(rng, 30),                            # shorter than window*3
    ]
    # dup-alt-like: body repeated twice with flanks (the DUP alt shape
    # that drives the 0.1 < below-frac < 0.5 X-means path)
    body = _rand(rng, 260)
    out.append(_rand(rng, 300) + body + body + _rand(rng, 300))
    return out


def test_device_refiner_matches_host():
    refiner = DeviceWindowRefiner()
    for seq in cases():
        host_w, _ = window_size_refine(seq)
        dev_w = refiner.refine(seq)
        assert dev_w == host_w, f"len={len(seq)}: {dev_w} != {host_w}"


def test_band_qc_thread_path_matches_host():
    # tandem-array haplotypes drive the (0.1, 0.5) below-diagonal band,
    # whose X-means QC runs on a worker thread since r5
    # (REFINER_BAND_r5.json: ~88% hit rate on repeat-heavy inputs) —
    # the threaded leg must stay value-identical to the host oracle
    from vapor_tpu.engine.window_device import BAND_STATS
    rng = random.Random(5)

    def rep_hap(span, period, frac):
        unit = _rand(rng, period)
        n = max(2, int(span * frac / period))
        body = "".join(
            "".join(rng.choice("ACGT") if rng.random() < 0.05 else c
                    for c in unit) for _ in range(n))
        rest = span - len(body)
        return (_rand(rng, 500 + rest // 2) + body +
                _rand(rng, 500 + rest - rest // 2))

    refiner = DeviceWindowRefiner(region_qc_cff=0.4, seed=0)
    before = BAND_STATS["band_hits"]
    for period, frac in ((15, 0.8), (40, 0.8), (40, 0.4)):
        seq = rep_hap(1200, period, frac)
        host_w, _ = window_size_refine(seq, 0.4, 0)
        assert refiner.refine(seq) == host_w
    assert BAND_STATS["band_hits"] > before, \
        "fixture failed to reach the band-QC leg"


def test_refiner_integration_with_backend(tmp_path):
    # ValidatorContext with a jax backend should route refine through
    # the device path and still produce identical CLI output
    from vapor_tpu.sim.synth import build_test_case
    from vapor_tpu.cli import main
    case = build_test_case(str(tmp_path), genome_len=16000,
                           sv=("DUP", 7000, 7400), read_len=2400,
                           n_donor=6, n_ref=6, seed=33)
    bed = tmp_path / "svs.bed"
    bed.write_text("chrS\t7000\t7400\tSV1\tDUP\n")
    outs = {}
    for be in ("numpy", "jax"):
        out = str(tmp_path / f"o_{be}.vapor")
        assert main(["bed", "--sv-input", str(bed), "--reference",
                     case["fasta"], "--pacbio-input", case["bam"],
                     "--output-path", str(tmp_path / "figs"),
                     "--output-file", out, "--backend", be,
                     "--no-figures"]) == 0
        outs[be] = open(out).read()
    assert outs["numpy"] == outs["jax"]
