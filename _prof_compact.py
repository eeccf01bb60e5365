import time, numpy as np, jax, jax.numpy as jnp
from smafa_tpu.ops import distance as D
from smafa_tpu.ops import pallas_scan as PS

L = 60
W = 1 << 22
B = 2048
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)

db_emb = jax.jit(PS.embed_db_with_zc, static_argnames="seq_len")(db, L, W)
db_emb.block_until_ready()
q_emb = jax.jit(PS.embed_query_with_one, static_argnames="seq_len")(jnp.asarray(q), L)
q_emb.block_until_ready()
th = jnp.full((B,), L // 8, jnp.int32)

def timeit(name, fn, *a):
    for _ in range(2):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms = {B*W/best/1e9:.1f} e9 cmp/s")
    return out

# (a) Mosaic mask alone
mask = timeit("mosaic mask", lambda: PS.compact_mask_pallas(q_emb, db_emb, th, L, 512, 4096, False))
# (b) extraction alone on that mask
ext = jax.jit(lambda m: D.extract_mask_hits(m, jnp.int32(0), W, 4096))
timeit("extract only", ext, mask)
# (c) full pallas compact
timeit("mosaic mask+extract", lambda: PS.compact_scan_pallas(q_emb, db_emb, th, jnp.int32(0), L, 4096, 512, 4096, False))
