import time, numpy as np, jax, jax.numpy as jnp
from smafa_tpu.utils.platform import apply_platform_env, enable_compilation_cache
apply_platform_env(); enable_compilation_cache()
from smafa_tpu.ops import distance as D
from smafa_tpu.ops import pallas_scan as PS

L = 60
nw, B = 1 << 22, 65536
rng = np.random.default_rng(42)
db = rng.integers(0, 5, size=(nw, L), dtype=np.uint8)
q = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
shift = D.packing_shift(L, nw)
de = jax.jit(PS.embed_db_with_zc, static_argnames="seq_len")(db, L, nw)
de.block_until_ready()
qd = jax.device_put(q)

configs = [(1024, 4096, 2), (1024, 4096, 4), (1024, 8192, 2),
           (1024, 8192, 4), (2048, 4096, 2), (512, 4096, 2),
           (2048, 8192, 4)]
for tb, tw, sub in configs:
    @jax.jit
    def run(qc):
        return PS.min2_scan_pallas(
            PS.embed_query_with_one(qc, L), de, L, shift,
            tile_b=tb, tile_w=tw, sub=sub)
    try:
        for _ in range(2):
            lo, hi = run(qd); np.asarray(lo)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            lo, hi = run(qd); np.asarray(lo)
            best = min(best, time.perf_counter() - t0)
        print(f"TB={tb} TW={tw} sub={sub}: {B*nw/best/1e9:.1f}e9", flush=True)
    except Exception as e:
        print(f"TB={tb} TW={tw} sub={sub}: FAIL {str(e)[:100]}", flush=True)
