"""On-hardware CLI parity artifact: every committed golden fixture,
re-run with the device backend on the REAL chip, diffed byte-for-byte
against the CPU-pinned goldens (fixtures/golden/*.vapor, themselves
pinned from a green refcli differential run — scripts/pin_goldens.py).

Covers bed + vcf + svelter + ins fixtures under both engine variants:
  rc_dot  VAPOR_TPU_RCDOT=1  reverse-strand hits in dot space
                             (production, round 5)
  flip    VAPOR_TPU_RCDOT=0  the flip-based rc mapping (fallback)

The flag is read at trace time, so each variant runs in its own
subprocess (a shared process would reuse the first variant's compiled
code).  (The pallas/table routes this script covered through round 4
were demoted to experiments/ after AB_r4 + PROFILE_r5.)

Writes TPU_PARITY_r5.json (pass/fail per fixture x variant) at the
repo root — the correctness contract (BASELINE.md: bitwise-equal
output) on the hardware that matters, not just CPU.

Run alone — never alongside another TPU process.  No timeout wrappers.

Usage: python scripts/tpu_cli_parity.py [variant ...] [--out FILE]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

VARIANTS = {"rc_dot": "1", "flip": "0"}


def run_variant():
    """Child-process body: run every golden fixture on the device
    backend, print one JSON result line."""
    import golden_cases as gc
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    orig_run = gc._run_cli

    def run_device(args):
        orig_run(["jax" if a == "numpy" else a for a in args])

    gc._run_cli = run_device
    results = {}
    for name in sorted(gc.GOLDEN_CASES):
        golden = os.path.join(gc.GOLDEN_DIR, f"{name}.vapor")
        if not os.path.exists(golden):
            results[name] = "no-golden"
            continue
        want = open(golden).read()
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory(
                prefix=f"tpu_parity_{name}_") as d:
            got = gc.GOLDEN_CASES[name](d)
        dt = time.perf_counter() - t0
        ok = got == want
        results[name] = "pass" if ok else "FAIL"
        print(f"  {name}: {'pass' if ok else 'FAIL'} ({dt:.1f}s)",
              flush=True)
    print("VARIANTRESULT " + json.dumps(
        {"device": str(dev.device_kind), "platform": str(dev.platform),
         "results": results}), flush=True)


def main():
    argv = [a for a in sys.argv[1:]]
    if "--child" in argv:
        run_variant()
        return 0
    out_path = os.path.join(REPO, "TPU_PARITY_r5.json")
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    variants = argv or list(VARIANTS)

    routes = {}
    device = platform = None
    n_fail = 0
    for v in variants:
        env = dict(os.environ, VAPOR_TPU_RCDOT=VARIANTS[v])
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, capture_output=True, text=True)
        payload = None
        for line in p.stdout.splitlines():
            if line.startswith("VARIANTRESULT "):
                payload = json.loads(line[len("VARIANTRESULT "):])
            else:
                print(f"[{v}] {line}", flush=True)
        if payload is None:
            routes[v] = {"error": (p.stderr or p.stdout)[-1500:]}
            n_fail += 1
            continue
        device = payload["device"]
        platform = payload["platform"]
        routes[v] = payload["results"]
        n_fail += sum(1 for s in payload["results"].values()
                      if s == "FAIL")

    artifact = {
        "what": "CLI outputs recomputed with --backend jax on the "
                "real chip, diffed byte-for-byte against the "
                "CPU-pinned goldens (fixtures/golden, pinned from a "
                "green refcli differential run); one subprocess per "
                "engine variant (trace-time flag)",
        "device": device,
        "platform": platform,
        "routes": routes,
        "all_pass": n_fail == 0,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: "
          f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}",
          flush=True)
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
