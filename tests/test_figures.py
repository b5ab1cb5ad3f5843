"""Figure rendering: tick-ladder parity with the reference's subplot
function (inspected through matplotlib state) + output smoke."""
import importlib.machinery
import importlib.util
import random

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pytest  # noqa: E402

from conftest import REFERENCE_DIR, has_reference  # noqa: E402
from vapor_tpu.figures import _tick_ladder, make_event_figure  # noqa: E402


@pytest.mark.skipif(not has_reference(), reason="reference absent")
def test_tick_ladder_matches_reference():
    import numpy as np
    import scipy
    scipy.std = np.std
    loader = importlib.machinery.SourceFileLoader(
        "ref_sf_fig", f"{REFERENCE_DIR}/vapor_vali/Simple_function.pyx")
    spec = importlib.util.spec_from_loader("ref_sf_fig", loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    rng = random.Random(1)
    for max_x in (7, 73, 260, 480, 999, 1200, 2400, 5200, 9999, 10450):
        hits = [(rng.randint(0, max_x - 1), rng.randint(0, max_x))
                for _ in range(30)] + [(max_x, max_x)]
        fig = plt.figure()
        mod.makeDotplot_subfigure(hits, "t", 111)
        ref_ticks = [t for t in plt.gca().get_xticks()]
        plt.close(fig)
        assert [float(t) for t in _tick_ladder(max_x)] == ref_ticks, \
            f"max_x={max_x}"


def test_figure_written(tmp_path):
    rng = random.Random(2)
    seq = "".join(rng.choice("ACGT") for _ in range(400))
    out = str(tmp_path / "fig.png")
    make_event_figure([seq, 0, "r"], 10, seq, seq[:150] + seq[250:], out)
    import os
    assert os.path.getsize(out) > 5000
