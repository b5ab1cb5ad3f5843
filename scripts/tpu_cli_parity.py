"""On-hardware CLI parity check: --backend jax (full-fusion Pallas on
TPU) vs --backend numpy must produce byte-identical .vapor output.

The pytest suites prove this on CPU (XLA + interpret-mode pallas);
this script is the real-chip leg, run manually after engine changes.

Run alone — never alongside another TPU process.  No timeout wrappers.

Usage: python scripts/tpu_cli_parity.py [n_events]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from vapor_tpu.cli import main as cli_main
    from vapor_tpu.sim.scale import build_event_worklist
    import jax
    print("devices:", jax.devices(), flush=True)

    tmpdir = tempfile.mkdtemp(prefix="vapor_tpu_parity_")
    fa, bam, bed = build_event_worklist(tmpdir, n)
    outs = {}
    for backend in ("numpy", "jax"):
        out = os.path.join(tmpdir, f"out_{backend}.vapor")
        rc = cli_main(["bed", "--sv-input", bed, "--reference", fa,
                       "--pacbio-input", bam, "--output-path",
                       os.path.join(tmpdir, "figs_" + backend),
                       "--output-file", out, "--backend", backend,
                       "--no-figures", "--pipeline", "4"])
        assert rc == 0, (backend, rc)
        outs[backend] = open(out, "rb").read()
    if outs["numpy"] == outs["jax"]:
        print(f"PARITY OK: {n} events byte-identical "
              f"({len(outs['jax'].splitlines()) - 1} rows)")
        return 0
    import itertools
    la, lb = (outs["numpy"].splitlines(), outs["jax"].splitlines())
    if len(la) != len(lb):
        print(f"row-count mismatch: numpy={len(la)} jax={len(lb)}")
    for a, b in itertools.zip_longest(la, lb, fillvalue=b"<missing>"):
        if a != b:
            print("numpy:", a.decode())
            print("jax:  ", b.decode())
    print("PARITY MISMATCH")
    return 1


if __name__ == "__main__":
    sys.exit(main())
