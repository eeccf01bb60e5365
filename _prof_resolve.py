import os, time
os.environ["SMAFA_TPU_ONEWAVE"] = "0"
import numpy as np, jax
from smafa_tpu.parallel.sharded import ScanRunner, build_mesh
from smafa_tpu.parallel import hitops

L, W, B = 60, 1 << 20, 32768
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
r = ScanRunner(db, L, mesh=build_mesh(1, 1))

# instrument stage timings by wrapping methods
times = {}
def wrap(name, f):
    def g(*a, **k):
        t0 = time.perf_counter()
        out = f(*a, **k)
        times[name] = times.get(name, 0) + time.perf_counter() - t0
        return out
    return g

r.best_hit(q)  # warm everything incl adaptive count program
r.best_hit(q)  # second warm so min2c path is compiled+warm
times.clear()

orig_unpack = r._min2_unpack
orig_tc = r._tie_counts
orig_mid_a = r._iter_middles_async
orig_mid_c = r._iter_middles_collect
orig_cgr = r._compact_grouped_rows
r._min2_unpack = wrap("unpack(fetch)", orig_unpack)
r._tie_counts = wrap("tcount", orig_tc)
r._iter_middles_async = wrap("miditer_dispatch", orig_mid_a)
r._iter_middles_collect = wrap("miditer_collect", orig_mid_c)
r._compact_grouped_rows = wrap("compact", orig_cgr)

t0 = time.perf_counter()
h = r.min_count_async(q)
times["dispatchA"] = time.perf_counter() - t0
t0 = time.perf_counter()
res = r.best_hit(q, None, handle=h)
times["best_hit total"] = time.perf_counter() - t0
print("tie ema:", r._tie_ema, "fused cnt in handle:", h[6] is not None)
d, counts, rows, idx = res
cnt = counts[counts > 1]
print(f"tied rows {int((counts>1).sum())}, mean ties {cnt.mean():.1f}, few(3..6) {int(((cnt>2)&(cnt<=6)).sum())}, heavy(>6) {int((cnt>6).sum())}, hits {rows.size}")
for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"  {k}: {v*1e3:.0f} ms")
