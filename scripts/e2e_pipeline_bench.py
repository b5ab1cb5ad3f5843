"""End-to-end CLI pipeline benchmark: events/s at --pipeline 1 vs N.

Builds a multi-event synthetic worklist (DEL/INV/DUP loci spaced along
one contig, each with spanning donor+ref reads), then times the full
`vapor-tpu bed` flow — parsers, BAM gather, window refinement, device
scoring, genotyping, TSV writing — at several pipeline depths, checking
the outputs stay byte-identical.

Usage: python scripts/e2e_pipeline_bench.py [n_events] [backend]
"""
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vapor_tpu.cli import main
from vapor_tpu.io.bam import BamRecord, write_bam
from vapor_tpu.io.fasta import write_fasta
from vapor_tpu.sim.synth import apply_sv, random_genome, simulate_reads


def build_worklist(tmpdir: str, n_events: int, spacing: int = 15000,
                   span: int = 300, read_len: int = 2600, seed: int = 9):
    rng = random.Random(seed)
    contig = "chrE"
    genome_len = spacing * (n_events + 1)
    genome = random_genome(genome_len, seed=seed, name=contig)
    ref = genome[contig]
    reads = []
    bed_lines = []
    for i in range(n_events):
        svtype = ("DEL", "INV", "DUP")[i % 3]
        s0 = spacing * (i + 1)
        e0 = s0 + span
        hap = apply_sv(ref, svtype, s0, e0)
        window = (max(0, s0 - 2200), s0 - 600)
        reads += simulate_reads(ref, hap, 8, read_len, rng, 0.06,
                                region=window, from_donor=True)
        reads += simulate_reads(ref, ref, 8, read_len, rng, 0.06,
                                region=window, from_donor=False)
        bed_lines.append(f"{contig}\t{s0}\t{e0}\tSV{i}\t{svtype}")
    reads.sort(key=lambda r: r[0])
    records = [
        BamRecord(name=f"r{i}", flag=0, ref_id=0, pos0=pos, mapq=60,
                  cigar=cigar, seq=seq, qual=b"")
        for i, (pos, seq, cigar) in enumerate(reads)]
    fa = f"{tmpdir}/ref.fa"
    bam = f"{tmpdir}/reads.bam"
    bed = f"{tmpdir}/svs.bed"
    write_fasta(fa, genome)
    write_bam(bam, [(contig, genome_len)], records)
    with open(bed, "w") as fh:
        fh.write("\n".join(bed_lines) + "\n")
    return fa, bam, bed


def run(tmpdir, fa, bam, bed, backend, depth, tag):
    out = f"{tmpdir}/out_{tag}.vapor"
    t0 = time.perf_counter()
    rc = main(["bed", "--sv-input", bed, "--reference", fa,
               "--pacbio-input", bam, "--output-path",
               f"{tmpdir}/figs", "--output-file", out,
               "--backend", backend, "--no-figures",
               "--pipeline", str(depth)])
    dt = time.perf_counter() - t0
    assert rc == 0
    return dt, open(out).read()


def main_bench():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    backend = sys.argv[2] if len(sys.argv) > 2 else "jax"
    with tempfile.TemporaryDirectory() as tmpdir:
        fa, bam, bed = build_worklist(tmpdir, n_events)
        # warm compile caches (untimed)
        run(tmpdir, fa, bam, bed, backend, 8, "warm")
        base_dt, base_out = run(tmpdir, fa, bam, bed, backend, 1, "p1")
        print(f"pipeline=1  {n_events / base_dt:7.2f} events/s "
              f"({base_dt:6.2f}s)", flush=True)
        for depth in (4, 8, 16):
            dt, out = run(tmpdir, fa, bam, bed, backend, depth,
                          f"p{depth}")
            same = "identical" if out == base_out else "MISMATCH!"
            print(f"pipeline={depth:<2} {n_events / dt:7.2f} events/s "
                  f"({dt:6.2f}s, {base_dt / dt:4.2f}x) [{same}]",
                  flush=True)


if __name__ == "__main__":
    main_bench()
