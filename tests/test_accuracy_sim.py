"""Simulation-based accuracy harness (SURVEY §4.2): known-truth SVs plus
deliberate false calls -> the validator must separate them."""
import random

from vapor_tpu.cli import main
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta
from vapor_tpu.sim.truthset import (SVSpec, apply_svs, place_svs,
                                    write_truth_bed)

GENOME_LEN = 60000
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


def test_simulated_accuracy(tmp_path):
    rng = random.Random(1001)
    ref = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    spec = [SVSpec("del", (150, 600), 3), SVSpec("inv", (150, 600), 3)]
    svs = place_svs(GENOME_LEN, "chrS", spec, rng, buffer=3000)
    assert len(svs) == 6
    donor = apply_svs(ref, svs, rng, micro_indel_rate=0.0)

    # donor-coordinate map: edits shift downstream coordinates
    def donor_pos(p):
        shift = 0
        for sv in svs:
            if sv.end0 <= p and sv.svtype == "del":
                shift -= sv.end0 - sv.start0
        return p + shift

    reads = []
    for sv in svs:
        for i in range(10):
            if i % 2 == 0:
                anchor = donor_pos(sv.start0)
                start_d = rng.randint(anchor - 1600, anchor - 1000)
                template = donor[start_d:start_d + READ_LEN]
                # report the REF coordinate of the read start
                pos0 = start_d - (donor_pos(sv.start0) - sv.start0)
            else:
                pos0 = rng.randint(sv.start0 - 1600, sv.start0 - 1000)
                template = ref[pos0:pos0 + READ_LEN]
            reads.append((pos0, _noisy(template, rng)))
    # false calls in SV-free regions need spanning reads too
    false_calls = [(20000 + i * 4000) % (GENOME_LEN - 5000)
                   for i in range(3)]
    false_calls = []
    probe = 0
    while len(false_calls) < 3 and probe < GENOME_LEN - 5000:
        probe += 4000
        if all(abs(probe - sv.start0) > 2500 for sv in svs):
            false_calls.append(probe)
            for _ in range(8):
                pos0 = rng.randint(probe - 1600, probe - 1000)
                reads.append((pos0, _noisy(ref[pos0:pos0 + READ_LEN],
                                           rng)))
    reads.sort(key=lambda r: r[0])

    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chrS": ref})
    bam = str(tmp_path / "reads.bam")
    write_bam(bam, [("chrS", GENOME_LEN)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])

    bed = tmp_path / "calls.bed"
    with open(bed, "w") as fo:
        for i, sv in enumerate(svs):
            label = "DEL" if sv.svtype == "del" else "INV"
            fo.write(f"chrS\t{sv.start0}\t{sv.end0}\ttrue{i}\t{label}\n")
        for i, p in enumerate(false_calls):
            fo.write(f"chrS\t{p}\t{p + 300}\tfalse{i}\tDEL\n")
    write_truth_bed(str(tmp_path / "truth.bed"), svs)

    out = str(tmp_path / "acc.vapor")
    assert main(["bed", "--sv-input", str(bed), "--reference", fa,
                 "--pacbio-input", bam, "--output-path",
                 str(tmp_path / "figs"), "--output-file", out,
                 "--backend", "numpy", "--no-figures"]) == 0

    rows = {}
    with open(out) as fin:
        next(fin)
        for line in fin:
            cols = line.rstrip("\n").split("\t")
            rows[cols[4]] = cols
    true_support = [r for k, r in rows.items() if k.startswith("true")
                    and r[6] not in ("NA",) and float(r[6]) > 0.15]
    false_support = [r for k, r in rows.items() if k.startswith("false")
                     and r[6] not in ("NA",) and float(r[6]) > 0.15]
    # sensitivity: most true het SVs validated; specificity: no false
    # call gains support
    assert len(true_support) >= 4, rows
    assert not false_support, false_support

def test_del_inv_nonadjacent_blocks(tmp_path):
    """Non-adjacent DEL_INV blocks dispatch per-block (the reference
    crashes here on a stale call signature, pyx:1591-1592 — we fixed it;
    this locks in the working behavior)."""
    import random
    from vapor_tpu.io.bam import BamRecord, write_bam
    from vapor_tpu.io.fasta import write_fasta, reverse_complement
    from vapor_tpu.validators import ValidatorContext
    rng = random.Random(121)
    ref = "".join(rng.choice("ACGT") for _ in range(30000))
    # del block 8000-8300, inv block 12000-12300 (gap 3700 >= 100)
    donor = (ref[:8000] + ref[8300:12000]
             + reverse_complement(ref[12000:12300]) + ref[12300:])

    def donor_pos(p):
        return p - 300 if p >= 8300 else p

    reads = []
    for anchor in (8000, 12000):
        for i in range(8):
            if i % 2 == 0:
                start_d = rng.randint(donor_pos(anchor) - 1500,
                                      donor_pos(anchor) - 1000)
                seq = donor[start_d:start_d + 2000]
                pos0 = start_d + (300 if anchor == 12000 else 0)
            else:
                pos0 = rng.randint(anchor - 1500, anchor - 1000)
                seq = ref[pos0:pos0 + 2000]
            reads.append((pos0, seq))
    reads.sort(key=lambda r: r[0])
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, {"cD": ref})
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("cD", 30000)], [
        BamRecord(f"r{i}", 0, 0, p, 60, f"{len(s)}M", s, b"")
        for i, (p, s) in enumerate(reads)])
    ctx = ValidatorContext(fa, bam, backend="numpy", figures=False)
    sv_info = [["cD", 8000, 8300, "del"], ["cD", 12000, 12300, "inv"]]
    scores = ctx.validate_del_inv(3, sv_info)
    assert len(scores) >= 6          # both blocks contributed reads
    assert max(scores) > 0.3         # donor reads support
