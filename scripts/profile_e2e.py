"""Profile the host side of the e2e CLI pipeline on the live device.

Runs the bench.py e2e fixture under cProfile and prints the top
cumulative entries, separating device-wait (np.asarray / relay RPC)
from genuine host work — the 'host_ms_per_read_est' in the bench JSON
is the target this script decomposes.

Run alone — never alongside another TPU process.  No timeout wrappers.

Usage: python scripts/profile_e2e.py [n_events] [sort]
"""
import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sort = sys.argv[2] if len(sys.argv) > 2 else "cumulative"
    os.environ.setdefault("BENCH_E2E_EVENTS", str(n))
    import bench
    # warm pass outside the profile (compiles, file caches)
    bench.bench_e2e(backend="jax", n_events=n)
    prof = cProfile.Profile()
    prof.enable()
    reads_s, events_s = bench.bench_e2e(backend="jax", n_events=n)
    prof.disable()
    out = io.StringIO()
    stats = pstats.Stats(prof, stream=out)
    stats.sort_stats(sort).print_stats(45)
    print(out.getvalue())
    print(f"e2e: {reads_s:.1f} reads/s  {events_s:.2f} events/s",
          flush=True)


if __name__ == "__main__":
    main()
