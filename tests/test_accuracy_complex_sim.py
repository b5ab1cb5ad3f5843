"""Simulation accuracy for the complex reference SV classes the
round-1 simulator lacked: del_dup, del_dup_inv, dup_inv_ins
(/root/reference/simulate/generateVariantChromosomes.py:242-263).

Truth VCFs use the reference truth-set encodings
(Structural_Variants_het/*.vcf): del_dup/del_dup_inv route through
`Other=` to the CANNOT_CLASSIFY validator; dup_inv_ins is SVTYPE=dup_inv
with an insert_point.  Het donor read mixes around every breakpoint —
the validator must support each true call.
"""
import random

from vapor_tpu.cli import main
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta
from vapor_tpu.sim.truthset import (SVSpec, apply_svs, place_svs,
                                    write_truth_vcf)

GENOME_LEN = 90000
READ_LEN = 2400


def _noisy(template, rng, err=0.05):
    out = []
    for ch in template:
        x = rng.random()
        if x < err / 3:
            out.append(rng.choice("ACGT"))
        elif x < 2 * err / 3:
            out.append(rng.choice("ACGT"))
            out.append(ch)
        elif x < err:
            continue
        else:
            out.append(ch)
    return "".join(out)


def test_complex_classes_validate(tmp_path):
    rng = random.Random(4242)
    ref = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    spec = [SVSpec("del_dup", (360, 540), 2),
            SVSpec("del_dup_inv", (360, 540), 2),
            SVSpec("dup_inv_ins", (150, 400), 2)]
    svs = place_svs(GENOME_LEN, "chrS", spec, rng, buffer=4000)
    assert len(svs) == 6, [sv.svtype for sv in svs]
    donor = apply_svs(ref, svs, rng, micro_indel_rate=0.0)

    all_edits = sorted(e for sv in svs for e in sv.info["edits"])

    def donor_pos(p):
        return p + sum(d for pos, d in all_edits if pos < p)

    reads = []
    for sv in svs:
        anchor = min([sv.start0] + ([sv.info["insert_point"]]
                                    if "insert_point" in sv.info
                                    else []))
        for i in range(12):
            if i % 2 == 0:
                start_d = donor_pos(anchor) - rng.randint(1000, 1500)
                template = donor[start_d:start_d + READ_LEN]
                pos0 = start_d - (donor_pos(anchor) - anchor)
            else:
                pos0 = anchor - rng.randint(1000, 1500)
                template = ref[pos0:pos0 + READ_LEN]
            reads.append((pos0, _noisy(template, rng)))
    reads.sort(key=lambda r: r[0])

    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chrS": ref})
    bam = str(tmp_path / "reads.bam")
    write_bam(bam, [("chrS", GENOME_LEN)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    vcf = str(tmp_path / "calls.vcf")
    write_truth_vcf(vcf, svs, {"chrS": GENOME_LEN})

    # routing: del_dup / del_dup_inv go through Other= to the
    # CANNOT_CLASSIFY validator; dup_inv_ins is SVTYPE=dup_inv ->
    # DUP_INV (exactly how the reference CLI consumes its own truth
    # sets, vapor:127-202)
    from vapor_tpu.io.parsers import vcf_list_readin
    groups, _rec = vcf_list_readin(vcf)
    assert len(groups.get("Other", [])) == 4, groups.keys()
    assert len(groups.get("DUP_INV", [])) == 2, groups.keys()

    assert main(["vcf", "--sv-input", vcf, "--reference", fa,
                 "--pacbio-input", bam, "--output-path",
                 str(tmp_path / "figs"), "--output-file", "",
                 "--backend", "numpy", "--no-figures"]) == 0

    # vcf mode rewrites <input>.vapor as the annotated VCF; read the
    # VaPor_* INFO annotations back per record
    gs = {}
    for line in open(vcf + ".vapor"):
        if line.startswith("#") or not line.strip():
            continue
        cols = line.split("\t")
        info = {f.split("=")[0]: f.split("=", 1)[1]
                for f in cols[7].split(";") if "=" in f}
        gs[cols[2]] = info.get("VaPor_GS")
    assert len(gs) == 6, gs
    assert all(v is not None for v in gs.values()), gs
    supported = [k for k, v in gs.items()
                 if v not in ("NA", "") and float(v) > 0.3]
    # het truth with donor support: most events validated
    assert len(supported) >= 4, gs
