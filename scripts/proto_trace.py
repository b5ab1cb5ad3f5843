"""Timeline telemetry of the batched path on the bench worklist."""
import sys, os, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import bench
from vapor_tpu.engine import batching

EV = []
LOCK = threading.Lock()


def mark(kind, **kw):
    with LOCK:
        EV.append((time.perf_counter(), kind, kw))


orig_launch = batching.BatchingBackend._launch
orig_collect_get = None


def traced_launch(self, key, sub):
    t0 = time.perf_counter()
    out = orig_launch(self, key, sub)
    mark("launch", key=key[:2] + (key[2],), rows=sum(r.B for r in sub),
         dt=time.perf_counter() - t0)
    return out


batching.BatchingBackend._launch = traced_launch

orig_collect = batching.BatchingBackend._collect


def traced_collect(self):
    while True:
        sub, out = self._launched.get()
        t0 = time.perf_counter()
        h_d, h_a, packed = out
        pk = np.asarray(packed)
        mark("fetch", rows=sum(r.B for r in sub),
             dt=time.perf_counter() - t0)
        o = 0
        for r in sub:
            r.fut.set_result((None, None, pk[o:o + r.B]))
            o += r.B


batching.BatchingBackend._collect = traced_collect

events = bench.make_worklist()
t0 = time.perf_counter()
rate, be = bench.bench_ours(events, repeats=2, backend="jax", jobs=0)
total = time.perf_counter() - t0
print(f"rate={rate:.1f} reads/s  (bench wall {total:.2f}s)")

base = EV[0][0]
n_launch = sum(1 for e in EV if e[1] == "launch")
n_fetch = sum(1 for e in EV if e[1] == "fetch")
rows_l = [e[2]["rows"] for e in EV if e[1] == "launch"]
t_launch = sum(e[2]["dt"] for e in EV if e[1] == "launch")
t_fetch = sum(e[2]["dt"] for e in EV if e[1] == "fetch")
print(f"launches={n_launch} rows/launch={np.mean(rows_l):.1f} "
      f"launch_time_total={t_launch:.2f}s fetch_time_total={t_fetch:.2f}s "
      f"fetches={n_fetch}")
print("timeline (last repeat):")
for ts, kind, kw in EV[-40:]:
    print(f"  {ts-base:8.3f} {kind:7s} rows={kw.get('rows'):4d} "
          f"dt={kw['dt']*1e3:7.1f}ms " +
          (f"key={kw['key']}" if 'key' in kw else ""))
