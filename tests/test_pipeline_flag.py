"""--pipeline N must produce byte-identical output to sequential runs."""
from vapor_tpu.cli import main
from vapor_tpu.sim.synth import build_test_case


def test_pipeline_identical(tmp_path):
    case = build_test_case(str(tmp_path), genome_len=26000,
                           sv=("DEL", 8000, 8300), read_len=2200,
                           n_donor=6, n_ref=6, seed=51)
    bed = tmp_path / "svs.bed"
    bed.write_text("chrS\t8000\t8300\tSV1\tDEL\n"
                   "chrS\t15000\t15200\tSV2\tINV\n"
                   "chrS\t20000\t20250\tSV3\tDEL\n")
    outs = {}
    for jobs in (1, 3):
        out = str(tmp_path / f"o{jobs}.vapor")
        assert main(["bed", "--sv-input", str(bed), "--reference",
                     case["fasta"], "--pacbio-input", case["bam"],
                     "--output-path", str(tmp_path / "figs"),
                     "--output-file", out, "--backend", "numpy",
                     "--no-figures", "--pipeline", str(jobs)]) == 0
        outs[jobs] = open(out).read()
    assert outs[1] == outs[3]
    assert len(outs[1].splitlines()) == 4
