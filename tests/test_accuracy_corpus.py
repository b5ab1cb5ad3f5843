"""Per-class accuracy floors on a compact truth corpus.

Small sibling of scripts/accuracy_corpus.py (the committed
ACCURACY_r3.json artifact): one contig, all ten reference SV classes,
het donor reads + deliberate false calls, full vcf-mode CLI.  Asserts
sensitivity floors per class and a false-validation ceiling, so a
scoring regression that shifts GS distributions fails CI even though
the byte-level golden suites still pass (goldens only cover the exact
pinned inputs).
"""
import tempfile

from scripts_path import add_scripts_path

add_scripts_path()

from accuracy_corpus import GS_CFF, build_corpus, evaluate, \
    parse_annotated  # noqa: E402


def test_corpus_floors():
    import vapor_tpu.cli as cli
    d = tempfile.mkdtemp(prefix="corpus_floor_")
    fa, bam, vcf, truth = build_corpus(d, "het", n_contigs=1,
                                       contig_len=400000, seed=977)
    n_true = sum(1 for v in truth.values()
                 if not v.startswith("FALSE"))
    assert n_true >= 30, n_true
    rc = cli.main(["vcf", "--sv-input", vcf, "--reference", fa,
                   "--pacbio-input", bam, "--output-path", d + "/figs",
                   "--backend", "numpy", "--no-figures",
                   "--validate-vcf-tandup"])
    assert rc == 0
    summary = evaluate(parse_annotated(vcf + ".vapor"), truth)

    for klass, stats in summary.items():
        if klass.startswith("FALSE"):
            assert stats["false_validation_rate"] <= 0.34, \
                (klass, stats)
        elif klass in ("dup_inv", "dup_inv_ins"):
            # structurally low evaluability (reference run_flag quirk,
            # see accuracy_corpus note); every EVALUATED event must
            # still validate
            evaluated = len(stats["gs_values"])
            validated = sum(1 for g in stats["gs_values"]
                            if g >= GS_CFF)
            assert evaluated == 0 or validated / evaluated >= 0.5, \
                (klass, stats)
        else:
            assert stats["sensitivity"] >= 0.6, (klass, stats)
