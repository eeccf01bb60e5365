import time, numpy as np, jax.numpy as jnp
from smafa_tpu.parallel import sharded
from smafa_tpu.ops import distance as D

rng = np.random.default_rng(0)
rows, L, B, K = 1 << 20, 60, 16384, 99
codes = rng.integers(0, 5, size=(rows, L), dtype=np.uint8)
r = sharded.ScanRunner(codes, L, mesh=sharded.build_mesh(1, 1))
q = rng.integers(0, 5, size=(B, L), dtype=np.uint8)

r.kmode_flat(q, K, None)  # warm
t0 = time.perf_counter()
h = r.kmode_stats_async(q, K, None)
eff = np.asarray(h[1]); hits = np.asarray(h[2])
t1 = time.perf_counter()
nq, q_padded = h[3], h[5]
counts = hits[:nq].astype(np.int64)
thresh = np.where(counts > 0, eff[:nq], -1).astype(np.int32)
print("total hits:", counts.sum(), " rows:", nq, " mask_row_cap:", r._mask_row_cap())
t2 = time.perf_counter()
rows_f, idx_f = r._compact_grouped(q_padded, np.pad(thresh, (0, q_padded.shape[0]-nq), constant_values=-1), np.pad(counts, (0, q_padded.shape[0]-nq)))
t3 = time.perf_counter()
dv = r._host_distances(q_padded, rows_f, idx_f)
t4 = time.perf_counter()
order = np.lexsort((idx_f, dv, rows_f))
out = (counts.astype(np.int32), rows_f[order], idx_f[order], dv[order])
t5 = time.perf_counter()
print(f"phaseA(kstats)+fetch {t1-t0:.2f}s  compaction(grouped) {t3-t2:.2f}s  host_dist {t4-t3:.2f}s  lexsort+gather {t5-t4:.2f}s")

# inner compaction anatomy: one dispatch at the production shape
ids = np.nonzero(counts > 0)[0].astype(np.int32)[:8192]
t6 = time.perf_counter()
g_rows, g_idx, rc, valid = r._compact_dispatch(q_padded, ids, thresh[ids], 1 << 21)
t7 = time.perf_counter()
print(f"one compact dispatch (8192 rows, t_cap 2^21): {t7-t6:.2f}s valid={valid}")
