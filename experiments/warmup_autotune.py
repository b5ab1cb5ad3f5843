"""Offline pallas-vs-XLA autotune: probe production buckets, save the
verdict table, optionally emit the committed per-device-kind table.

Production runs never time-probe inline (pallas_fused.choose_engine
defaults unknown buckets to 'xla' — conservative, no compile-failure
risk — and records the miss for this tool); timing happens here, at
the LADDER batch sizes the batching layer actually emits (VERDICT r2
weak #4: the old inline probe timed at a fixed B=24).

Usage:
  python scripts/warmup_autotune.py                 # default bucket set
  python scripts/warmup_autotune.py --miss          # + recorded misses
  python scripts/warmup_autotune.py --emit-table    # write the in-tree
        vapor_tpu/engine/autotune_tables/<kind>.json for committing

Run alone — never alongside another TPU process.  No timeout wrappers.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# (H, R) pairs the CLI actually emits: flank<=500 whole-event haps
# (<=11 kb) x read buckets (PacBio reads clipped to <=12 kb), plus the
# fixed-shape junction mode (2x500 flanks -> 1024/1536)
DEFAULT_HR = [
    (1024, 1024), (1024, 1536), (1536, 1536), (1024, 2560),
    (1536, 2560), (2048, 2560), (2560, 2560), (3072, 2560),
    (1024, 3072), (2048, 3072), (2560, 3072), (3072, 3072),
]
SCORERS = ("m1b", "w10", "del", "rdd")
KS = (10, 20, 30, 40)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--miss", action="store_true",
                    help="also probe buckets recorded as cold-start "
                         "misses by previous runs")
    ap.add_argument("--emit-table", action="store_true",
                    help="write vapor_tpu/engine/autotune_tables/"
                         "<kind>.json from the full disk cache")
    ap.add_argument("--ks", default="10",
                    help="comma-separated k values (default 10 — the "
                         "dominant window; pass 10,20,30,40 for all)")
    ap.add_argument("--batch-sizes", default="24,96",
                    help="LADDER batch sizes to time at (B=8 pallas "
                         "compiles have hung the relay — stick to "
                         ">=24)")
    ap.add_argument("--hr", default="",
                    help="extra H:R pairs, comma-separated "
                         "(e.g. 768:768,1024:768)")
    args = ap.parse_args()

    import pallas_fused as pf
    kind = pf._device_kind()
    print(f"device kind: {kind}", flush=True)
    bs = tuple(int(x) for x in args.batch_sizes.split(","))
    ks = tuple(int(x) for x in args.ks.split(","))

    hr = list(DEFAULT_HR)
    for pair in args.hr.split(","):
        if pair:
            h, r = pair.split(":")
            hr.append((int(h), int(r)))
    want = [(H, R, k, s) for (H, R) in hr for k in ks
            for s in SCORERS]
    if args.miss:
        try:
            with open(pf._tune_cache_path() + ".miss") as f:
                for line in f:
                    parts = line.strip().split("|")
                    if len(parts) != 6:
                        if line.strip():
                            print(f"warmup: malformed miss line "
                                  f"skipped: {line.strip()!r:.100}",
                                  file=sys.stderr)
                        continue
                    if parts[1] == kind:
                        want.append((int(parts[2][1:]),
                                     int(parts[3][1:]),
                                     int(parts[4][1:]), parts[5]))
        except OSError:
            pass

    disk = pf._load_tune_cache()
    seen = set()
    for H, R, k, s in want:
        skey = pf._bucket_skey(kind, H, R, k, s)
        if skey in seen or skey in disk:
            continue
        seen.add(skey)
        try:
            m = pf.measure_bucket(H, R, k, s, batch_sizes=bs)
            print(f"{skey}: pallas={m['pallas'] * 1e3:.1f}ms "
                  f"xla={m['xla'] * 1e3:.1f}ms -> {m['choice']}",
                  flush=True)
            disk = pf._load_tune_cache()
            disk[skey] = m["choice"]
            pf._save_tune_cache(disk)
        except Exception as e:
            print(f"{skey}: FAILED ({e!r:.150}) -> xla", flush=True)
            pf.blacklist_bucket(H, R, k, s, e)
            disk = pf._load_tune_cache()

    if args.emit_table:
        table = {k: v for k, v in pf._load_tune_cache().items()
                 if k.startswith(f"v{pf.ENGINE_VERSION}|{kind}|")}
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "vapor_tpu", "engine",
                           "autotune_tables", f"{kind}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        print(f"wrote {os.path.normpath(out)} ({len(table)} buckets)")


if __name__ == "__main__":
    main()
