"""Parity for junction/breakpoint fallback modes (SV span >= 10 kb) and
multi-BAM XXX patterns vs the reference CLI."""
import os
import random
import subprocess
import sys

import pytest

from conftest import has_reference
from test_cli_parity_vs_reference import harness  # noqa: F401
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta, reverse_complement

pytestmark = [pytest.mark.refcli,
              pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not mounted")]

GENOME_LEN = 70000
READ_LEN = 1700


def _noisy(t, rng):
    out = []
    for ch in t:
        x = rng.random()
        if x < 0.02:
            out.append(rng.choice("ACGT"))
        elif x < 0.04:
            out.append(rng.choice("ACGT"))
            out.append(ch)
        elif x < 0.06:
            continue
        else:
            out.append(ch)
    return "".join(out)


def _junction_reads(ref, donor_junction_seq, anchor0, rng, n=8):
    """Reads spanning a breakpoint: half read the novel junction
    sequence, half the reference."""
    out = []
    for i in range(n):
        start = rng.randint(anchor0 - 1400, anchor0 - 900)
        if i % 2 == 0:
            offset = start - (anchor0 - 1400)
            template = donor_junction_seq[offset:offset + READ_LEN]
        else:
            template = ref[start:start + READ_LEN]
        out.append((start, _noisy(template, rng)))
    return out


@pytest.fixture(scope="module")
def big_case(tmp_path_factory):
    rng = random.Random(404)
    d = tmp_path_factory.mktemp("bigsv")
    ref = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    reads = []

    # big DEL 15000-40000 (span 25k > 10k -> junction mode)
    del_s, del_e = 15000, 40000
    donor = ref[:del_s] + ref[del_e:]
    start_region = del_s - 1400
    donor_jn = donor[start_region:start_region + 6000]
    reads += _junction_reads(ref, donor_jn, del_s, rng)

    # big INV 48000-62000
    inv_s, inv_e = 48000, 62000
    donor2 = ref[:inv_s] + reverse_complement(ref[inv_s:inv_e]) + \
        ref[inv_e:]
    start_region = inv_s - 1400
    reads += _junction_reads(
        ref, donor2[start_region:start_region + 6000], inv_s, rng)

    reads.sort(key=lambda r: r[0])
    fa = str(d / "ref.fa")
    write_fasta(fa, {"chrS": ref})
    bam = str(d / "reads.bam")
    write_bam(bam, [("chrS", GENOME_LEN)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    bed = str(d / "svs.bed")
    with open(bed, "w") as fo:
        fo.write(f"chrS\t{del_s}\t{del_e}\tBIG1\tDEL\n")
        fo.write(f"chrS\t{inv_s}\t{inv_e}\tBIG2\tINV\n")
    return {"fasta": fa, "bam": bam, "bed": bed, "dir": d}


def test_junction_mode_parity(harness, big_case, tmp_path):
    env = dict(os.environ)
    env["PATH"] = f"{harness}/bin:" + env["PATH"]
    env["PYTHONPATH"] = str(harness)
    env.pop("JAX_PLATFORMS", None)
    ref_out = str(tmp_path / "ref.vapor")
    subprocess.run(
        [sys.executable, str(harness / "vapor"), "bed",
         "--sv-input", big_case["bed"], "--reference", big_case["fasta"],
         "--pacbio-input", big_case["bam"],
         "--output-path", str(tmp_path / "figs_ref"),
         "--output-file", ref_out],
        env=env, check=True, capture_output=True, timeout=1200)
    from vapor_tpu.cli import main
    my_out = str(tmp_path / "my.vapor")
    assert main(["bed", "--sv-input", big_case["bed"],
                 "--reference", big_case["fasta"],
                 "--pacbio-input", big_case["bam"],
                 "--output-path", str(tmp_path / "figs_my"),
                 "--output-file", my_out, "--backend", "numpy"]) == 0
    expect = open(ref_out).read()
    got = open(my_out).read()
    assert got == expect
    # make sure the junction path actually scored something
    assert any(c not in ("NA",) for c in
               [l.split("\t")[5] for l in got.splitlines()[1:]])


def test_multibam_xxx_pattern(big_case, tmp_path):
    """--pacbio-input with XXX wildcard resolves every matching BAM."""
    import shutil
    bam_dir = tmp_path / "bams"
    bam_dir.mkdir()
    shutil.copy(big_case["bam"], bam_dir / "sample.chrS.bam")
    from vapor_tpu.io.reads import resolve_bam_inputs
    pattern = str(bam_dir / "sample.XXX.bam")
    assert resolve_bam_inputs(pattern) == [str(bam_dir / "sample.chrS.bam")]
    from vapor_tpu.cli import main
    out = str(tmp_path / "o.vapor")
    assert main(["bed", "--sv-input", big_case["bed"],
                 "--reference", big_case["fasta"],
                 "--pacbio-input", pattern,
                 "--output-path", str(tmp_path / "figs"),
                 "--output-file", out, "--backend", "numpy",
                 "--no-figures"]) == 0
    assert len(open(out).read().splitlines()) == 3
