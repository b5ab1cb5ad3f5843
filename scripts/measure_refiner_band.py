"""Measure the window-refiner X-means fallback band frequency.

The device refiner decides window size from two scalars (diag /
below-diagonal fractions of the self-dotplot histogram); only when the
below-diagonal fraction lands in (0.1, 0.5) does it fall back to the
exact host path (numpy self-dots + seeded X-means,
engine/window_device.py refine_gen) — a per-event host stall the
event pipeline cannot hide.  VERDICT r4 weak #6 asked how often
realistic inputs actually hit the band.  Two legs:

1. **corpus** — the full accuracy corpus (all ten SV classes, het +
   homo, scripts/accuracy_corpus.build_corpus) through the production
   CLI with the jax backend (CPU platform — identical control flow to
   TPU), counting band hits via window_device.BAND_STATS.
2. **repeat-heavy** — synthetic haplotypes with embedded tandem-repeat
   arrays (periods 15/40/100, repeat fraction 0.2-0.8 of the span,
   plus 5% point noise between copies) driven straight through
   DeviceWindowRefiner; repeats put mass below the diagonal, so this
   is the adversarial census the corpus's random sequence cannot give.
   Each band hit also times the host X-means leg so the artifact
   carries the cost of a stall, not just its frequency.

Reference gate analog: window_size_refine,
/root/reference/vapor_vali/Simple_function.pyx:2030-2046.

Writes REFINER_BAND_r5.json at the repo root.
"""
import contextlib
import json
import os
import random
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def snapshot():
    from vapor_tpu.engine.window_device import BAND_STATS
    return dict(BAND_STATS)


def delta(before, after):
    return {k: after[k] - before[k] for k in after}


def corpus_leg():
    from accuracy_corpus import build_corpus
    from vapor_tpu.cli import main as cli_main
    out = {}
    for zygosity in ("het", "homo"):
        d = tempfile.mkdtemp(prefix=f"vapor_band_{zygosity}_")
        fa, bam, vcf, truth = build_corpus(
            d, zygosity, n_contigs=3, contig_len=60000, seed=77)
        before = snapshot()
        t0 = time.perf_counter()
        with open(os.devnull, "w") as devnull, \
                contextlib.redirect_stdout(devnull):
            rc = cli_main(["vcf", "--sv-input", vcf, "--reference", fa,
                           "--pacbio-input", bam, "--output-path",
                           os.path.join(d, "figs"), "--output-file",
                           os.path.join(d, "out.vapor"),
                           "--backend", "jax", "--no-figures"])
        assert rc == 0
        stats = delta(before, snapshot())
        stats["wall_s"] = round(time.perf_counter() - t0, 1)
        stats["calls"] = len(truth)
        out[zygosity] = stats
    return out


def repeat_leg():
    from vapor_tpu.engine.window_device import DeviceWindowRefiner
    rng = random.Random(99)
    refiner = DeviceWindowRefiner(region_qc_cff=0.4, seed=0)

    def repeat_hap(span, period, rep_frac, noise=0.05):
        """flank + (noisy tandem array | random) + flank, like a DUP/
        DEL haplotype whose body overlaps a repeat family."""
        unit = "".join(rng.choice("ACGT") for _ in range(period))
        n_rep = max(2, int(span * rep_frac / period))
        arr = []
        for _ in range(n_rep):
            arr.append("".join(
                rng.choice("ACGT") if rng.random() < noise else ch
                for ch in unit))
        body = "".join(arr)
        rest = span - len(body)
        left = "".join(rng.choice("ACGT") for _ in range(500 + rest // 2))
        right = "".join(rng.choice("ACGT")
                        for _ in range(500 + rest - rest // 2))
        return left + body + right

    cases = []
    for period in (15, 40, 100):
        for rep_frac in (0.2, 0.4, 0.6, 0.8):
            for span in (600, 1200, 2400):
                for rep in range(3):
                    cases.append((period, rep_frac, span,
                                  repeat_hap(span, period, rep_frac)))
    results = {}
    stall_s = []
    for period, rep_frac, span, hap in cases:
        before = snapshot()
        t0 = time.perf_counter()
        w = refiner.refine(hap)
        dt = time.perf_counter() - t0
        d = delta(before, snapshot())
        key = f"p{period}_f{rep_frac}"
        ent = results.setdefault(
            key, {"n": 0, "band_hits": 0, "windows": []})
        ent["n"] += 1
        ent["band_hits"] += d["band_hits"]
        ent["windows"].append(w)
        if d["band_hits"]:
            stall_s.append(dt)
    total = sum(e["n"] for e in results.values())
    hits = sum(e["band_hits"] for e in results.values())
    return {
        "cases": total,
        "band_hits": hits,
        "hit_rate": round(hits / total, 4),
        "host_stall_s_when_hit": {
            "n": len(stall_s),
            "mean": round(sum(stall_s) / len(stall_s), 3)
            if stall_s else None,
            "max": round(max(stall_s), 3) if stall_s else None},
        "by_config": {k: {"n": v["n"], "band_hits": v["band_hits"],
                          "windows": sorted(set(v["windows"]),
                                            key=lambda x: (x is None, x))}
                      for k, v in sorted(results.items())},
    }


def main():
    report = {"corpus": corpus_leg(), "repeat_heavy": repeat_leg()}
    corpus_calls = sum(v["refine_calls"]
                       for v in report["corpus"].values())
    corpus_hits = sum(v["band_hits"] for v in report["corpus"].values())
    report["summary"] = {
        "corpus_refine_calls": corpus_calls,
        "corpus_band_hits": corpus_hits,
        "corpus_hit_rate": round(corpus_hits / corpus_calls, 4)
        if corpus_calls else None,
        "repeat_heavy_hit_rate": report["repeat_heavy"]["hit_rate"],
    }
    with open(os.path.join(REPO, "REFINER_BAND_r5.json"), "w") as fo:
        json.dump(report, fo, indent=1)
    print(json.dumps(report["summary"]))


if __name__ == "__main__":
    main()
