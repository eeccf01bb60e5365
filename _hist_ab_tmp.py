import time, numpy as np, jax.numpy as jnp
from smafa_tpu.parallel import sharded

rng = np.random.default_rng(0)
rows, L, B = 1 << 20, 60, 16384
codes = rng.integers(0, 5, size=(rows, L), dtype=np.uint8)
r = sharded.ScanRunner(codes, L, mesh=sharded.build_mesh(1, 1))
q = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
qp, nq = r._pad(q)
shift = r._key_shift()

fn_h = r._program("hist", qp.shape[0])
fn_s = r._program("kstats", qp.shape[0], shift=shift)

def t(f):
    f(); best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); f(); best = min(best, time.perf_counter() - t0)
    return best

th = t(lambda: np.asarray(fn_h(qp, r.db_oh, r.n_windows_dev)))
ts = t(lambda: [np.asarray(x) for x in fn_s(qp, r.db_oh, r.n_windows_dev, jnp.int32(99), jnp.int32(L + 1))])
print(f"hist:  {th*1e3:.0f} ms")
print(f"kstats(binary search, k=99): {ts*1e3:.0f} ms")

# parity check: cutoffs + hit counts identical
from smafa_tpu.ops import distance as D
hist = np.asarray(fn_h(qp, r.db_oh, r.n_windows_dev))[:nq]
eff_h, hits_h = D.kmode_cutoffs_from_hist(hist, 99, None, rows)
eff_s, hits_s = fn_s(qp, r.db_oh, r.n_windows_dev, jnp.int32(99), jnp.int32(L + 1))
assert np.array_equal(eff_h, np.asarray(eff_s)[:nq])
assert np.array_equal(hits_h, np.asarray(hits_s)[:nq])
print("cutoff/hits parity OK")
