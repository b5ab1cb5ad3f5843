"""--pipeline N must produce byte-identical output to sequential runs."""
import shutil

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


def test_vcf_pipeline_identical(tmp_path):
    case = build_test_case(str(tmp_path), genome_len=26000,
                           sv=("DEL", 8000, 8300), read_len=2200,
                           n_donor=6, n_ref=6, seed=52)
    lines = ["##fileformat=VCFv4.2",
             "##contig=<ID=chrS,length=26000>",
             '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
             '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
             "chrS\t8001\tSV1\tN\t<DEL>\t99\tPASS\tSVTYPE=DEL;END=8300",
             "chrS\t15001\tSV2\tN\t<INV>\t99\tPASS\tSVTYPE=INV;END=15200",
             "chrS\t20001\tSV3\tN\t<DEL>\t99\tPASS\tSVTYPE=DEL;END=20020"]
    outs = {}
    for jobs in (1, 3):
        vcf = str(tmp_path / f"svs{jobs}.vcf")
        with open(vcf, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        assert main(["vcf", "--sv-input", vcf, "--reference",
                     case["fasta"], "--pacbio-input", case["bam"],
                     "--output-path", str(tmp_path / "figs"),
                     "--output-file", "unused", "--backend", "numpy",
                     "--no-figures", "--pipeline", str(jobs)]) == 0
        outs[jobs] = open(vcf + ".vapor").read()
    # output is the annotated VCF (vapor:466): all 3 records carry
    # VaPor_ INFO fields, in input row order
    assert outs[1] == outs[3]
    body = [l for l in outs[1].splitlines() if not l.startswith("#")]
    assert len(body) == 3
    assert all("VaPor_GS=" in l for l in body)
