"""Regenerate and commit the golden expected outputs.

Runs every registered golden case (tests/golden_cases.py) through OUR
CLI (numpy backend, CPU) and writes the outputs to fixtures/golden/.
Pin only from a tree whose refcli differential suites are green — the
goldens certify reference parity without the reference mounted
(VERDICT r2 missing #2; reference precedent:
/root/reference/vapor_test/vapor_test.bed.vapor).

Usage: python scripts/pin_goldens.py [case ...]
"""
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from golden_cases import GOLDEN_CASES, GOLDEN_DIR
    names = sys.argv[1:] or sorted(GOLDEN_CASES)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        with tempfile.TemporaryDirectory(prefix=f"pin_{name}_") as d:
            text = GOLDEN_CASES[name](d)
        out = os.path.join(GOLDEN_DIR, f"{name}.vapor")
        with open(out, "w") as f:
            f.write(text)
        print(f"pinned {name}: {len(text.splitlines())} lines "
              f"-> {os.path.relpath(out, REPO)}")


if __name__ == "__main__":
    main()
