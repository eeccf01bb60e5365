import os, time
import numpy as np, jax
from smafa_tpu.parallel.sharded import ScanRunner, build_mesh

L, W, B, K = 60, 1 << 20, 16384, 99
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
r = ScanRunner(db, L, mesh=build_mesh(1, 1))
r.kmode_flat(q, K, None)  # warm
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
wrap(r, "_compact_grouped", "compact total")
wrap(r, "_compact_dispatch_async", "compact dispatch")
wrap(r, "_compact_collect", "compact collect(fetch)")
wrap(r, "_host_distances", "hit distances")
t0 = time.perf_counter()
res = r.kmode_flat(q, K, None)
total = time.perf_counter() - t0
counts = res[0]
print(f"total {total*1e3:.0f} ms, hits {int(counts.sum())}")
for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"  {k}: {v*1e3:.0f} ms")
