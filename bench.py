"""Throughput benchmark: query x db sequence comparisons/sec on one chip.

Measures the hot kernel — the fused packed-key Hamming scan (min distance +
lowest-index argmin + unique-min detection per query row), the TPU replacement for
the reference's serial popcount loop (reference lib.rs:80-88, 232-238) —
on the BASELINE.json single-chip config shape: 60 bp windows, 1M-row db,
streamed query batches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e9 (the north-star >= 1e9 comparisons/sec/chip).

Timing fetches a result to host each iteration: on the axon-tunneled TPU
platform, block_until_ready alone does not reliably synchronize.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from smafa_tpu.core.alphabet import N_CHANNELS
from smafa_tpu.ops import distance as D

NORTH_STAR = 1.0e9  # comparisons/sec/chip (BASELINE.json north_star)


def main() -> None:
    from smafa_tpu.utils.platform import apply_platform_env, enable_compilation_cache

    apply_platform_env()  # honor an explicit JAX_PLATFORMS=cpu (CI smoke)
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    seq_len = 60
    if on_accel:
        n_windows, batch, chunk = 1 << 20, 16384, 8192
        iters, warmup = 5, 2
    else:  # CPU smoke sizing — keeps CI runs short
        n_windows, batch, chunk = 1 << 14, 512, 2048
        iters, warmup = 3, 1

    rng = np.random.default_rng(42)
    db_codes = rng.integers(0, N_CHANNELS, size=(n_windows, seq_len), dtype=np.uint8)
    q_codes = rng.integers(0, N_CHANNELS, size=(batch, seq_len), dtype=np.uint8)

    shift = D.packing_shift(seq_len, n_windows)
    nw = jnp.int32(n_windows)
    zero = jnp.int32(0)

    db_oh = jax.jit(lambda c: D.expand_onehot(c, seq_len))(db_codes)
    db_oh.block_until_ready()

    @jax.jit
    def scan(q, db):
        lo_b = jnp.full((q.shape[0],), -1, jnp.int32)
        hi_b = jnp.full((q.shape[0],), n_windows, jnp.int32)
        return D.min2_scan(
            D.expand_onehot(q, seq_len), db, nw, zero, lo_b, hi_b,
            seq_len, shift, chunk, n_windows,
        )

    q_dev = jax.device_put(q_codes)
    for _ in range(warmup):
        lo, hi = scan(q_dev, db_oh)
        np.asarray(lo)

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        lo, hi = scan(q_dev, db_oh)
        np.asarray(lo)  # host fetch = real synchronization barrier
        best = min(best, time.perf_counter() - t0)

    comparisons = batch * n_windows
    cps = comparisons / best
    print(
        json.dumps(
            {
                "metric": "query_db_comparisons_per_sec_per_chip",
                "value": cps,
                "unit": "comparisons/sec (60bp windows)",
                "vs_baseline": cps / NORTH_STAR,
            }
        )
    )


if __name__ == "__main__":
    main()
