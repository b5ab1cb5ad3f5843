"""Reference-free golden regression suite.

Regenerates every deterministic parity fixture (tests/golden_cases.py),
runs our CLI on it, and compares byte-for-byte against the expected
outputs committed under fixtures/golden/ (pinned by
scripts/pin_goldens.py from a tree whose refcli differential suites
were green).  This is the always-running leg of the parity contract:
the refcli suites skip wherever /root/reference is not mounted, so
without these goldens a scoring regression would be invisible there
(reference precedent for in-tree goldens:
/root/reference/vapor_test/vapor_test.bed.vapor:2-20).
"""
import os

import pytest

from golden_cases import GOLDEN_CASES, GOLDEN_DIR


@pytest.mark.parametrize("name", sorted(GOLDEN_CASES))
def test_golden(name, tmp_path):
    golden = os.path.join(GOLDEN_DIR, f"{name}.vapor")
    assert os.path.exists(golden), \
        f"golden missing — run scripts/pin_goldens.py {name}"
    got = GOLDEN_CASES[name](str(tmp_path))
    expect = open(golden).read()
    assert got == expect
