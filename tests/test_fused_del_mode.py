"""Combined DEL mode must equal the separate m1b + within-10% calls."""
import random

from vapor_tpu.engine import oracle
from vapor_tpu.engine.fused import FusedBackend
from test_fused_vs_oracle import _mutate


def test_del_mode_matches_separate():
    rng = random.Random(77)
    be = FusedBackend()
    checked = 0
    for trial in range(4):
        flank = rng.choice([120, 200])
        body = "".join(rng.choice("ACGT") for _ in range(200))
        left = "".join(rng.choice("ACGT") for _ in range(flank))
        right = "".join(rng.choice("ACGT") for _ in range(flank))
        ref_hap = (left + body + right)
        if trial == 3:
            ref_hap = ref_hap[:50].lower() + ref_hap[50:]
        alt_hap = left + right
        reads = [[_mutate(alt_hap if i % 2 == 0 else ref_hap, rng, 0.08),
                  rng.choice([0, 11]), f"r{i}"] for i in range(6)]
        m1b, w10 = be.score_del_batch(ref_hap, alt_hap, reads, 10)
        for r, g1, g2 in zip(reads, m1b, w10):
            e1 = oracle.score_abs_dis_m1b(ref_hap, alt_hap, r[0], r[1], 10)
            e2 = oracle.score_within_10perc_m1b(ref_hap, alt_hap, r[0],
                                                r[1], 10)
            assert [float(x) for x in g1] == [float(x) for x in e1]
            assert [float(x) for x in g2] == [float(x) for x in e2]
            checked += (e1 != [0, 0]) + (e2 != [0, 0])
    assert checked >= 6
