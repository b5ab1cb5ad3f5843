"""End-to-end CLI pipeline benchmark: events/s at --pipeline 1 vs N.

Builds a multi-event synthetic worklist (DEL/INV/DUP loci spaced along
one contig, each with spanning donor+ref reads), then times the full
`vapor-tpu bed` flow — parsers, BAM gather, window refinement, device
scoring, genotyping, TSV writing — at several pipeline depths, checking
the outputs stay byte-identical.

Usage: python scripts/e2e_pipeline_bench.py [n_events] [backend] [depths]
  depths: comma-separated --pipeline values (default 4,8,16,24)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vapor_tpu.cli import main
from vapor_tpu.sim.scale import build_event_worklist as build_worklist


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
    depths = tuple(int(x) for x in sys.argv[3].split(",")) \
        if len(sys.argv) > 3 else (4, 8, 16, 24)
    with tempfile.TemporaryDirectory() as tmpdir:
        fa, bam, bed = build_worklist(tmpdir, n_events)
        # warm compile caches (untimed), then the full coalesced-shape
        # ladder for every bucket seen — deeper pipelines coalesce into
        # larger padded shapes that must not compile inside timed runs
        run(tmpdir, fa, bam, bed, backend, 8, "warm")
        if backend in ("jax", "auto"):
            try:
                from vapor_tpu.engine.scoring import get_backend
                be = get_backend(backend)
                if hasattr(be, "warm_ladder"):
                    t0 = time.perf_counter()
                    n = be.warm_ladder(max_rows=480)
                    print(f"warm_ladder: {n} shapes in "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)
            except Exception as e:
                print(f"warm_ladder failed: {e!r:.120}", flush=True)
        base_dt, base_out = run(tmpdir, fa, bam, bed, backend, 1, "p1")
        print(f"pipeline=1  {n_events / base_dt:7.2f} events/s "
              f"({base_dt:6.2f}s)", flush=True)
        for depth in depths:
            dt, out = run(tmpdir, fa, bam, bed, backend, depth,
                          f"p{depth}")
            same = "identical" if out == base_out else "MISMATCH!"
            print(f"pipeline={depth:<2} {n_events / dt:7.2f} events/s "
                  f"({dt:6.2f}s, {base_dt / dt:4.2f}x) [{same}]",
                  flush=True)


if __name__ == "__main__":
    main_bench()
