import time, numpy as np, jax, jax.numpy as jnp
from smafa_tpu.ops import distance as D
from smafa_tpu.ops import pallas_scan as PS

L = 60
n_windows, batch = 1 << 22, 65536
rng = np.random.default_rng(42)
db = rng.integers(0, 5, size=(n_windows, L), dtype=np.uint8)
q = rng.integers(0, 5, size=(batch, L), dtype=np.uint8)
shift = D.packing_shift(L, n_windows)

db_dev = jax.device_put(db)
emb = jax.jit(PS.embed_db_with_zc, static_argnames="seq_len")(db_dev, L, jnp.int32(n_windows))
emb.block_until_ready()
qe = jax.jit(PS.embed_query_with_one, static_argnames="seq_len")(jax.device_put(q), L)
qe.block_until_ready()

def bench(wc, tb, tw, sub):
    try:
        def f():
            return PS.min2_scan_pallas(qe, emb, L, shift, tile_b=tb, tile_w=tw, sub=sub, with_count=wc)
        out = f(); np.asarray(out[0])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); out = f(); np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        cps = batch * n_windows / best
        print(f"wc={wc} tiles=({tb},{tw},{sub}): {best*1e3:.1f} ms  {cps/1e9:.1f} e9", flush=True)
    except Exception as e:
        print(f"wc={wc} tiles=({tb},{tw},{sub}): FAIL {str(e)[:120]}", flush=True)

bench(True, 1024, 4096, 2)
bench(True, 512, 4096, 2)
bench(True, 1024, 4096, 4)
bench(True, 1024, 8192, 4)
bench(False, 1024, 4096, 2)
bench(True, 1024, 4096, 2)
