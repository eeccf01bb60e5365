"""Throughput benchmark: query x db sequence comparisons/sec on one chip.

Measures the SHIPPED best-hit phase-A program — the dual packed-key
Hamming min scan (ops.distance.min2_scan) over the codes-resident db
form, i.e. exactly what `smafa_tpu query` dispatches per batch in its
default mode — the TPU replacement for the reference's serial popcount
loop (reference lib.rs:80-88, 232-238): 60 bp windows, 4M-row db,
streamed query batches. (Round 2 made phase A the pure min2 pass —
uniqueness of the minimum rides along in the dual keys, and tie
enumeration moved to the one-pass bitmask compaction — so the headline
IS the shipped path. The db stays resident as uint8 channel codes,
expanded one chunk at a time inside the scan: measured FASTER than the
one-hot-resident form — 6.4x fewer HBM db bytes per scan — as well as
6.4x more rows per chip, so it is the production default.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e9 (the north-star >= 1e9 comparisons/sec/chip).

Timing fetches a result to host each iteration: on the axon-tunneled TPU
platform, block_until_ready alone does not reliably synchronize.

``--kernel {min2,compact,hist}`` benches a specific pass (used by
tools/perf_suite.py to fill docs/PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from smafa_tpu.core.alphabet import N_CHANNELS
from smafa_tpu.ops import distance as D

NORTH_STAR = 1.0e9  # comparisons/sec/chip (BASELINE.json north_star)


def build_kernel(name: str, seq_len: int, n_windows: int, chunk: int,
                 db_codes=None, batch: int | None = None):
    shift = D.packing_shift(seq_len, n_windows)
    nw = jnp.int32(n_windows)
    zero = jnp.int32(0)

    if name == "min2":
        # The SHIPPED phase-A program, built exactly as `smafa_tpu query`
        # builds it (ScanRunner._build_min2): the Mosaic dual-key kernel
        # over the embedded db twin where eligible (big single-device
        # dbs on TPU — measured 430 vs 408 e9 for the XLA lowering),
        # the XLA min2_scan elsewhere (CPU smoke included). The runner
        # holds the db; the scan's db argument is ignored.
        from smafa_tpu.parallel import sharded

        runner = sharded.ScanRunner(
            db_codes, seq_len, mesh=sharded.build_mesh(1, 1), chunk=chunk,
        )
        fn = runner._program("min2", batch, shift=runner._key_shift())

        def scan(q, _db=None):
            return fn(q, runner.db_oh, runner.n_windows_dev)
    elif name == "compact":
        # The SHIPPED compact program, built as the runner builds it:
        # the Mosaic in-VMEM mask kernel where eligible (big dbs on
        # TPU, round 5), else the XLA mask scan with the SMAFA_TPU_PACK
        # lowering. A/B the two with SMAFA_TPU_PALLAS_COMPACT={0,1}.
        from smafa_tpu.parallel import sharded

        runner = sharded.ScanRunner(
            db_codes, seq_len, mesh=sharded.build_mesh(1, 1), chunk=chunk,
        )
        fn = runner._program("compact", batch, t_cap=4096)
        thresh = np.full((batch,), seq_len // 8, np.int32)

        def scan(q, _db=None):
            return fn(q, runner.db_oh, runner.n_windows_dev, thresh)
    elif name == "hist":
        @jax.jit
        def scan(q, db):
            return D.hist_scan(
                D.expand_query(q, seq_len, db.shape[1]), db, nw, seq_len, chunk
            )
    else:
        raise SystemExit(f"unknown kernel {name}")
    return scan


def main() -> None:
    from smafa_tpu.utils.platform import apply_platform_env, enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="min2",
                    choices=["min2", "compact", "hist"])
    args = ap.parse_args()

    apply_platform_env()  # honor an explicit JAX_PLATFORMS=cpu (CI smoke)
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    seq_len = 60
    if on_accel:
        # chunk matches D.default_chunk at this shape (the measured knee:
        # 276/293/300/297 e9 cmp/s at chunk 4096/8192/16384/32768) and
        # batch matches engine._auto_batch for a >=4M-row resident db
        # (throughput rises with B as db HBM reads amortize; with the
        # rank-4 embedding the 32k->64k step measured 355->381 e9).
        n_windows, batch, chunk = 1 << 22, 65536, 16384
        iters, warmup = 5, 2
    else:  # CPU smoke sizing — keeps CI runs short
        n_windows, batch, chunk = 1 << 14, 512, 2048
        iters, warmup = 3, 1
    if args.kernel == "compact":
        # Compaction dispatches are row-sliced in production so the hit
        # mask's rank cumsum stays exact (hitops.mask_row_cap); bench the
        # shipped dispatch shape, not one the engine never runs.
        from smafa_tpu.parallel.hitops import mask_row_cap

        batch = min(batch, mask_row_cap(n_windows))

    rng = np.random.default_rng(42)
    db_codes = rng.integers(0, N_CHANNELS, size=(n_windows, seq_len), dtype=np.uint8)
    q_codes = rng.integers(0, N_CHANNELS, size=(batch, seq_len), dtype=np.uint8)

    # Shipped resident form: uint8 channel codes (seq_len bytes/row);
    # every kernel's chunk loop expands one chunk at a time on device
    # (distance.block_distances dispatches on the db's width).
    db_dev = jax.device_put(db_codes)
    db_dev.block_until_ready()
    scan = build_kernel(args.kernel, seq_len, n_windows, chunk,
                        db_codes=db_codes, batch=batch)

    q_dev = jax.device_put(q_codes)
    for _ in range(warmup):
        out = scan(q_dev, db_dev)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = scan(q_dev, db_dev)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # host fetch = real barrier
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
