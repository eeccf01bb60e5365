import os, time
os.environ["SMAFA_TPU_ONEWAVE"] = "1"
import numpy as np, jax, jax.numpy as jnp
from smafa_tpu.parallel.sharded import ScanRunner, build_mesh

L, W, B = 60, 1 << 20, 32768
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
r = ScanRunner(db, L, mesh=build_mesh(1, 1))
shift = r._key_shift()
r._db_emb()  # build twin up front

def timeit(name, fn):
    for _ in range(2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0]).ravel()[:1]
    best = 9e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)

qp, _ = r._pad(q)
md = jnp.int32(L + 1)
for scap in (1024, 4096):
    fn = r._program("bestfull", qp.shape[0], shift=shift, t_cap=scap)
    timeit(f"bestfull program s_cap={scap}", lambda fn=fn: fn(qp, r.db_oh, r.n_windows_dev, md))
os.environ["SMAFA_TPU_PALLAS_COUNT"] = "1"
fn2 = r._program("min2", qp.shape[0], shift=shift)
timeit("min2 mosaic WITH count (runner program)", lambda: fn2(qp, r.db_oh, r.n_windows_dev))
os.environ["SMAFA_TPU_PALLAS_COUNT"] = "0"
fn3 = r._program("min2", qp.shape[0], shift=shift)
timeit("min2 mosaic no-count (runner program)", lambda: fn3(qp, r.db_oh, r.n_windows_dev))
