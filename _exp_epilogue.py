"""Round-5 bounded experiment (VERDICT #8): claw back part of the ~25%
VPU epilogue tax on the Mosaic phase A via wider sub-tiles / different
tile aspect ratios. Keep only on a measured win."""
import time
import numpy as np, jax, jax.numpy as jnp
from smafa_tpu.ops import distance as D
from smafa_tpu.ops import pallas_scan as PS

L, W, B = 60, 1 << 22, 65536
rng = np.random.default_rng(0)
db = rng.integers(0, 5, (W, L), dtype=np.uint8)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
shift = D.packing_shift(L, W)
db_emb = jax.jit(PS.embed_db_with_zc, static_argnames="seq_len")(db, L, W)
db_emb.block_until_ready()
q_emb = jax.jit(PS.embed_query_with_one, static_argnames="seq_len")(jnp.asarray(q), L)
q_emb.block_until_ready()

ref = None
for tb, tw, sub in ((1024, 4096, 2), (512, 8192, 2), (512, 8192, 4),
                    (1024, 8192, 4), (2048, 4096, 2), (1024, 2048, 1)):
    try:
        fn = lambda: PS.min2_scan_pallas(q_emb, db_emb, L, shift, tb, tw, sub, False, False)
        for _ in range(2):
            out = fn(); np.asarray(out[0])[:1]
        best = 9e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(); lo = np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        if ref is None:
            ref = lo
        else:
            assert np.array_equal(lo, ref), (tb, tw, sub, "MISMATCH")
        print(f"tiles ({tb},{tw},sub={sub}): {best*1e3:.1f} ms = {B*W/best/1e9:.1f} e9", flush=True)
    except Exception as e:
        print(f"tiles ({tb},{tw},sub={sub}): FAILED {str(e)[:120]}", flush=True)
