"""prep module + --version parity (reference prep.pyx:1-52)."""
import pytest

from vapor_tpu import prep


def test_version_string():
    from vapor_tpu import __version__
    assert prep.vapor_version == f"vapor-tpu V{__version__}"


def test_readmes_print(capsys):
    prep.print_read_me()
    out = capsys.readouterr().out
    assert prep.vapor_version in out
    for mode in ("svelter", "vcf", "bed"):
        assert mode in out
    for mode, fn in prep.READMES.items():
        fn()
        out = capsys.readouterr().out
        assert f"vapor-tpu {mode}" in out
        assert "--pacbio-input" in out


def test_cli_version_flag(capsys):
    from vapor_tpu.cli import build_parser
    with pytest.raises(SystemExit) as exc:
        build_parser().parse_args(["--version"])
    assert exc.value.code == 0
    assert prep.vapor_version in capsys.readouterr().out
