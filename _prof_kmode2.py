import os, time
import numpy as np, jax
from smafa_tpu.parallel.sharded import ScanRunner, build_mesh

L, W, B, K = 60, 1 << 20, 16384, 99
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
r = ScanRunner(db, L, mesh=build_mesh(1, 1))
r.kmode_flat(q, K, None)
r.kmode_flat(q, K, None)
times = {}
def wrap(obj, name, label):
    f = getattr(obj, name)
    def g(*a, **k):
        t0 = time.perf_counter()
        out = f(*a, **k)
        times[label] = times.get(label, 0) + time.perf_counter() - t0
        return out
    setattr(obj, name, g)
wrap(r, "kmode_stats_async", "kstats dispatch")
wrap(r, "_compactd_dispatch_async", "compactd dispatch")
wrap(r, "_compactd_collect", "compactd collect(wait+fetch)")
h = r.kmode_stats_async(q, K, None)
t0 = time.perf_counter()
eff = np.asarray(h[1]); hits = np.asarray(h[2])
times["kstats wait+fetch"] = time.perf_counter() - t0
t0 = time.perf_counter()
res = r.kmode_flat(q, K, None, stats_handle=("kstats", eff, hits, h[3], h[4], h[5]))
times["kmode_flat total"] = time.perf_counter() - t0
print("hits", int(res[0].sum()))
for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"  {k}: {v*1e3:.0f} ms")
