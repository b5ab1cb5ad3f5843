"""Multi-contig scatter e2e (SURVEY §2.4 WDL equivalent at small
scale): per-contig shard processes + version-sorted merge must produce
one complete, correctly ordered output, and the validator must separate
true SVs from false calls on every contig."""
import os
import subprocess
import sys

from vapor_tpu.sim.scale import build_scale_case


def test_scatter_multi_contig(tmp_path):
    case = build_scale_case(str(tmp_path), n_contigs=2,
                            contig_len=40000, events_per=3,
                            reads_per=8, n_false_per=1, seed=5)
    out = str(tmp_path / "merged.vapor")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = subprocess.call(
        [sys.executable, "-c", (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from vapor_tpu.orchestrate import run_scatter;"
            f"run_scatter('bed', {case['bed']!r}, {case['fasta']!r}, "
            f"{case['bam']!r}, {str(tmp_path / 'figs')!r}, {out!r}, "
            "jobs=2, backend='jax', "
            "extra_args=['--no-figures', '--pipeline', '2'])")],
        env=env, cwd="/root/repo")
    assert code == 0
    rows = [l.split("\t") for l in open(out) if not l.startswith("#")]
    svids = [r[4] for r in rows]
    assert len(rows) == case["n_events"]
    # merge order: chr1 block before chr2, positions ascending within
    chroms = [r[0] for r in rows]
    assert chroms == sorted(chroms, key=lambda c: int(c[3:]))
    for c in ("chr1", "chr2"):
        pos = [int(r[1]) for r in rows if r[0] == c]
        assert pos == sorted(pos)
    # accuracy: every truth label respected at QS 0.2
    for r in rows:
        svid, qs = r[4], r[5]
        called = qs not in ("NA", "") and float(qs) > 0.2
        assert called == case["truth"][svid], (svid, qs)
