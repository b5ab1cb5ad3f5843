"""Engine-routing policy tests (no device timing involved).

choose_engine must never time-probe inline: verdicts come from the
in-process memo, the on-disk warmup cache, or the committed per-device
table; unknown buckets default to 'xla'.  blacklist_bucket persists
only genuine compile/VMEM failures.  All consultations are keyed by
ENGINE_VERSION so stale verdicts die with kernel changes.
"""
import json

import pytest

import pallas_fused as pf


@pytest.fixture(autouse=True)
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VAPOR_TPU_CACHE", str(tmp_path))
    monkeypatch.setattr(pf, "_CHOICE", {})
    monkeypatch.setattr(pf, "_device_kind", lambda: "testkind")
    pf._packaged_table.cache_clear()
    yield
    pf._packaged_table.cache_clear()


def test_unknown_bucket_defaults_to_xla_and_records_miss(tmp_path):
    assert pf.choose_engine(512, 512, 10, "m1b") == "xla"
    miss = open(pf._tune_cache_path() + ".miss").read()
    assert pf._bucket_skey("testkind", 512, 512, 10, "m1b") in miss


def test_disk_cache_verdict_wins(tmp_path):
    skey = pf._bucket_skey("testkind", 768, 768, 10, "w10")
    pf._save_tune_cache({skey: "pallas"})
    assert pf.choose_engine(768, 768, 10, "w10") == "pallas"


def test_packaged_table_consulted(monkeypatch, tmp_path):
    table_dir = tmp_path / "tables"
    table_dir.mkdir()
    skey = pf._bucket_skey("testkind", 1024, 1024, 10, "del")
    (table_dir / "testkind.json").write_text(json.dumps(
        {skey: "pallas"}))
    real_join = pf.os.path.join

    def fake_join(*parts):
        if parts[-2:] == ("autotune_tables", "testkind.json"):
            return str(table_dir / "testkind.json")
        return real_join(*parts)

    monkeypatch.setattr(pf.os.path, "join", fake_join)
    assert pf.choose_engine(1024, 1024, 10, "del") == "pallas"


def test_version_bump_invalidates_disk_verdicts(monkeypatch):
    skey_old = pf._bucket_skey("testkind", 768, 768, 10, "m1b")
    pf._save_tune_cache({skey_old: "pallas"})
    monkeypatch.setattr(pf, "ENGINE_VERSION", pf.ENGINE_VERSION + 1)
    assert pf.choose_engine(768, 768, 10, "m1b") == "xla"


def test_blacklist_persists_only_compile_failures():
    pf.blacklist_bucket(512, 512, 10, "m1b",
                        RuntimeError("Mosaic lowering failed"))
    skey = pf._bucket_skey("testkind", 512, 512, 10, "m1b")
    assert pf._load_tune_cache().get(skey) == "xla"

    pf._CHOICE.clear()
    pf._save_tune_cache({})
    pf.blacklist_bucket(640, 640, 10, "m1b",
                        ConnectionError("relay reset by peer"))
    skey2 = pf._bucket_skey("testkind", 640, 640, 10, "m1b")
    assert skey2 not in pf._load_tune_cache()       # in-memory only
    assert pf.choose_engine(640, 640, 10, "m1b") == "xla"


def test_no_packaged_v5e_table():
    """The r3 per-bucket v5e table was RETIRED in r4: the interleaved
    worklist-level A/B (AB_r4.json) measured all-XLA faster than
    table-routed pallas on every pass (~600 vs ~385 reads/s) — the
    B=24/96 micro-probes behind the table did not transfer to
    production call mixes.  With no table, every bucket falls to the
    XLA default; pallas remains available via VAPOR_TPU_PALLAS=1 and
    a future table must be validated by scripts/ab_engines.py before
    being committed."""
    assert pf._packaged_table("TPU_v5_lite") == {}
