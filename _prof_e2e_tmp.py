import time, numpy as np, os
os.environ.setdefault("SMAFA_TPU_PALLAS_MIN2", "1")
os.environ.setdefault("SMAFA_TPU_PALLAS_COUNT", "1")
from smafa_tpu.parallel import select

rng = np.random.default_rng(0)
rows, L, B = 1 << 20, 60, 16384
codes = rng.integers(0, 5, size=(rows, L), dtype=np.uint8)
runner = select.make_runner(codes, L)
q = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
q[:8] = codes[rng.integers(0, rows, 8)]

# warm
runner.best_hit(q)
runner.best_hit(q)

t0 = time.perf_counter()
handle = runner.min_count_async(q)
lo = np.asarray(handle[1]); t1 = time.perf_counter()
dist, idx_lo, idx_hi, keep = runner._min2_unpack(handle)
cnt = np.asarray(handle[6])[:handle[3]]
t2 = time.perf_counter()
tied = keep & (idx_lo != idx_hi)
tie_cnt = cnt[tied]
import collections
print("tied rows:", tied.sum(), "of", B, " tie histogram:", dict(sorted(collections.Counter(np.minimum(tie_cnt, 12)).items())))
t3 = time.perf_counter()
res = runner.best_hit(q, None, handle=("min2",)+tuple(handle[1:]))
t4 = time.perf_counter()
print(f"phaseA+fetch {t1-t0:.3f}s  unpack {t2-t1:.3f}s  resolve(best_hit full) {t4-t3:.3f}s")

# and where inside best_hit: time iter_middles and compaction separately
q_padded, nq = runner._pad(q)
tied_ids = np.nonzero(tied)[0].astype(np.int32)
few = tied & False
multi = np.zeros_like(tied)
multi[tied_ids[cnt[tied_ids] > 2]] = True
few_ids = tied_ids[(cnt[tied_ids] > 2) & (cnt[tied_ids] <= 10)]
t5 = time.perf_counter()
it_rows, it_idx = runner._iter_middles(q_padded, few_ids, dist[few_ids], idx_lo[few_ids], cnt[few_ids])
t6 = time.perf_counter()
heavy_ids = tied_ids[cnt[tied_ids] > 10]
if heavy_ids.size:
    m_rows, m_idx = runner._compact_grouped_rows(q_padded, heavy_ids, dist[heavy_ids], cnt[heavy_ids].astype(np.int64))
t7 = time.perf_counter()
print(f"iter_middles({few_ids.size} rows, max {cnt[few_ids].max(initial=0)} ties) {t6-t5:.3f}s  compact({heavy_ids.size} rows) {t7-t6:.3f}s")
