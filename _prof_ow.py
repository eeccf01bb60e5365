import time, os
import numpy as np, jax, jax.numpy as jnp
from smafa_tpu.ops import distance as D
from smafa_tpu.ops import pallas_scan as PS

L, W, B = 60, 1 << 20, 32768
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
shift = D.packing_shift(L, W)
db_emb = jax.jit(PS.embed_db_with_zc, static_argnames="seq_len")(db, L, W)
db_emb.block_until_ready()
q_emb = jax.jit(PS.embed_query_with_one, static_argnames="seq_len")(jnp.asarray(q), L)
q_emb.block_until_ready()
db_dev = jax.device_put(db); db_dev.block_until_ready()
q_oh = jax.jit(D.expand_embed_query, static_argnames="seq_len")(jnp.asarray(q), L)
q_oh.block_until_ready()
nw = jnp.int32(W)

def timeit(name, fn):
    for _ in range(2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0]).ravel()[:1]
    best = 9e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms = {B*W/best/1e9:.1f} e9", flush=True)

timeit("mosaic min2 no-count", lambda: PS.min2_scan_pallas(q_emb, db_emb, L, shift, 1024, 4096, 2, False, False))
timeit("mosaic min2 WITH count", lambda: PS.min2_scan_pallas(q_emb, db_emb, L, shift, 1024, 4096, 2, False, True))
timeit("xla min2 (codes db)", lambda: D.min2_scan(q_oh, db_dev, nw, jnp.int32(0), L, shift, 16384, W))
timeit("xla min2c (fused count)", lambda: D.min2c_scan(q_oh, db_dev, nw, jnp.int32(0), L, shift, 16384, W))
# miditer over a 4096-row sub-batch, 4 passes
sub = q_oh[:4096]
fl = jnp.zeros(4096, jnp.int32); cl = jnp.full(4096, W - 1, jnp.int32); ds = jnp.full(4096, 5, jnp.int32)
timeit("miditer 4096 rows x4 passes", lambda: D.miditer_scan(sub, db_dev, nw, fl, cl, ds, L, shift, 16384, 4))
sub1 = q_oh[:1024]
timeit("miditer 1024 rows x2 passes", lambda: D.miditer_scan(sub1, db_dev, nw, fl[:1024], cl[:1024], ds[:1024], L, shift, 16384, 2))
