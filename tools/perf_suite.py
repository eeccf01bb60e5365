#!/usr/bin/env python3
"""Single-chip perf matrix on the real TPU (fills docs/PERFORMANCE.md).

Measures, back-to-back in one session (tunnel latency varies across
sessions, so only within-run comparisons are meaningful):

- phase-A kernels at the production shapes: min2 (shipped best-hit
  phase A), hist (K-mode phase A), binary-search stats pass
  (long-window phase A), compact (the one-pass bitmask phase B);
- the shipped ScanRunner.best_hit end-to-end on a tie-heavy db
  (VERDICT round-1 item 1: was 153 ms/batch at 2048 x 200k; target
  <= 2 scan-equivalents);
- ScanRunner.kmode_flat end-to-end at K=99.

Prints one JSON line per measurement. Run with nothing else touching the
TPU (compiles queue server-side).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smafa_tpu.core.alphabet import N_CHANNELS
from smafa_tpu.ops import distance as D


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(fn, *args, iters=4, warmup=2):
    for _ in range(warmup):
        fetch(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def emit(name, seconds, comparisons=None, **extra):
    rec = {"bench": name, "seconds": round(seconds, 6), **extra}
    if comparisons:
        rec["cps"] = round(comparisons / seconds / 1e9, 2)  # 1e9 cmp/s
    print(json.dumps(rec), flush=True)


def main() -> None:
    from smafa_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    seq_len = 60
    rng = np.random.default_rng(42)

    # ---- shape A: the VERDICT criterion shape (2048 x ~200k) ----
    chunk = 2048
    W_a = 2048 * 98  # ~200k
    B_a = 2048
    db_a = rng.integers(0, N_CHANNELS, size=(W_a, seq_len), dtype=np.uint8)
    q_a = rng.integers(0, N_CHANNELS, size=(B_a, seq_len), dtype=np.uint8)
    shift_a = D.packing_shift(seq_len, W_a)
    # shipped resident form: uint8 codes (expand per chunk in-loop; the
    # query side picks the rank-4 embedding when active)
    db_oh_a = jax.device_put(db_a)
    fetch(db_oh_a)
    nw_a = jnp.int32(W_a)
    zero = jnp.int32(0)

    @jax.jit
    def min2_a(q, db):
        return D.min2_scan(D.expand_query(q, seq_len, db.shape[1]), db, nw_a, zero,
                           seq_len, shift_a, chunk, W_a)

    @jax.jit
    def hist_a(q, db):
        return D.hist_scan(D.expand_query(q, seq_len, db.shape[1]), db, nw_a, seq_len, chunk)

    @jax.jit
    def stats_a(q, db):
        t = jnp.full((q.shape[0],), seq_len // 2, jnp.int32)
        return D._stats_pass(D.expand_query(q, seq_len, db.shape[1]), db, nw_a, t,
                             seq_len, chunk)

    @jax.jit
    def compact_a(q, db, thresh):
        return D.compact_scan(D.expand_query(q, seq_len, db.shape[1]), db, nw_a, thresh,
                              zero, seq_len, chunk, 1 << 14, D._pack_mode())

    cmp_a = B_a * W_a
    emit("min2@2048x200k", timeit(min2_a, q_a, db_oh_a), cmp_a)
    emit("hist@2048x200k", timeit(hist_a, q_a, db_oh_a), cmp_a)
    emit("stats@2048x200k", timeit(stats_a, q_a, db_oh_a), cmp_a)
    thresh_med = np.full(B_a, 20, np.int32)  # some hits per row
    emit("compact@2048x200k", timeit(compact_a, q_a, db_oh_a, thresh_med), cmp_a)

    # ---- shipped end-to-end best-hit ----
    from smafa_tpu.parallel import sharded

    # Realistic tie density: random db/queries (at 200k windows ~46% of
    # rows tie at the min, mean 2-3 ties) — the production-typical batch.
    runner_r = sharded.ScanRunner(db_a, seq_len, mesh=sharded.build_mesh(1, 1),
                                  chunk=chunk)

    def best_hit_rand():
        h = runner_r.min_count_async(q_a)
        return runner_r.best_hit(q_a, None, handle=h)

    for _ in range(2):
        res = best_hit_rand()
    counts = res[1]
    t0 = time.perf_counter()
    for _ in range(3):
        best_hit_rand()
    bh = (time.perf_counter() - t0) / 3
    emit("best_hit_rand@2048x200k", bh, cmp_a,
         mean_ties=float(counts.mean()), total=int(counts.sum()))

    # Adversarial tie density: db of 50x-duplicated pool rows, queries
    # drawn from the pool -> every row has ~50 exact-hit ties.
    pool = rng.integers(0, N_CHANNELS, size=(W_a // 50, seq_len), dtype=np.uint8)
    db_ties = pool[rng.integers(0, len(pool), W_a)]
    q_ties = pool[rng.integers(0, len(pool), B_a)]  # exact hits -> max ties
    runner = sharded.ScanRunner(db_ties, seq_len, mesh=sharded.build_mesh(1, 1),
                                chunk=chunk)

    def best_hit_batch():
        h = runner.min_count_async(q_ties)
        return runner.best_hit(q_ties, None, handle=h)

    for _ in range(2):
        res = best_hit_batch()
    counts = res[1]
    t0 = time.perf_counter()
    for _ in range(3):
        best_hit_batch()
    bh = (time.perf_counter() - t0) / 3
    emit("best_hit_ties@2048x200k", bh, cmp_a,
         mean_ties=float(counts.mean()), total=int(counts.sum()))

    def kmode_batch():
        h = runner.kmode_stats_async(q_ties, 99, None)
        return runner.kmode_flat(q_ties, 99, None, stats_handle=h)

    for _ in range(2):
        kr = kmode_batch()
    t0 = time.perf_counter()
    for _ in range(3):
        kmode_batch()
    km = (time.perf_counter() - t0) / 3
    emit("kmode99@2048x200k", km, cmp_a, total=int(kr[0].sum()))

    # ---- shape B: bench.py headline shape (16384 x 1M) ----
    chunk_b = 8192
    W_b, B_b = 1 << 20, 16384
    db_b = rng.integers(0, N_CHANNELS, size=(W_b, seq_len), dtype=np.uint8)
    q_b = rng.integers(0, N_CHANNELS, size=(B_b, seq_len), dtype=np.uint8)
    shift_b = D.packing_shift(seq_len, W_b)
    db_oh_b = jax.device_put(db_b)  # shipped codes-resident form
    fetch(db_oh_b)
    nw_b = jnp.int32(W_b)

    @jax.jit
    def min2_b(q, db):
        return D.min2_scan(D.expand_query(q, seq_len, db.shape[1]), db, nw_b, zero,
                           seq_len, shift_b, chunk_b, W_b)

    @jax.jit
    def compact_b(q, db, thresh):
        return D.compact_scan(D.expand_query(q, seq_len, db.shape[1]), db, nw_b, thresh,
                              zero, seq_len, chunk_b, 1 << 14, D._pack_mode())

    cmp_b = B_b * W_b
    emit("min2@16384x1M", timeit(min2_b, q_b, db_oh_b), cmp_b)
    # Compaction dispatches are row-sliced in production so one program's
    # hit mask stays under the mask-memory budget (hitops.mask_row_cap;
    # the saturating rank cumsum keeps extraction exact at any density).
    # Bench the shipped dispatch shape.
    from smafa_tpu.parallel.hitops import mask_row_cap

    B_c = min(B_b, mask_row_cap(W_b))
    thresh_c = np.full(B_c, 20, np.int32)
    emit(f"compact@{B_c}x1M", timeit(compact_b, q_b[:B_c], db_oh_b, thresh_c),
         B_c * W_b)

    # ---- out-of-core streaming tax: resident vs slab-streamed min2 ----
    # Same db scanned by the resident single-device runner and by the
    # stream layout (several 512 MB slabs re-uploaded every batch); the
    # gap is the whole cost of going out-of-core at production batch.
    del db_oh_b
    from smafa_tpu.parallel import slab

    W_s = 1 << 22  # 4M rows = 1.5 GB one-hot: still fits, so A/B is fair
    db_s = rng.integers(0, N_CHANNELS, size=(W_s, seq_len), dtype=np.uint8)
    cmp_s = B_b * W_s

    def bench_runner(r):
        for _ in range(2):
            r.min2(q_b)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r.min2(q_b)  # min2_result fetches to host = real barrier
            best = min(best, time.perf_counter() - t0)
        return best

    # One-hot-resident baseline (codes-resident is the production
    # default since the A/B below settled it: 244 vs 230 e9 cmp/s).
    os.environ["SMAFA_TPU_DB_CODES"] = "0"
    try:
        res_runner = sharded.ScanRunner(db_s, seq_len,
                                        mesh=sharded.build_mesh(1, 1),
                                        chunk=chunk_b)
        emit("min2_onehot_resident@16384x4M", bench_runner(res_runner), cmp_s)
        del res_runner
    finally:
        os.environ.pop("SMAFA_TPU_DB_CODES", None)
    # Codes-resident form (the default): same scan with per-chunk
    # one-hot expansion.
    codes_runner = sharded.ScanRunner(db_s, seq_len,
                                      mesh=sharded.build_mesh(1, 1),
                                      chunk=chunk_b)
    emit("min2_codes_resident@16384x4M", bench_runner(codes_runner),
         cmp_s)
    del codes_runner
    # Stream layout, both tiers: the slab cache auto-activates when the
    # codes fit on device (zero per-batch PCIe after sweep 1); forcing
    # it off measures the true re-streaming tax (tunnel-H2D-bound in
    # this environment; PCIe-trivial on a real TPU VM).
    st_runner = slab.SlabStreamRunner(db_s, seq_len)
    emit("min2_stream@16384x4M", bench_runner(st_runner), cmp_s,
         n_slabs=st_runner.n_slabs,
         slab_cache=st_runner._slab_cache is not None)
    del st_runner
    os.environ["SMAFA_TPU_SLAB_RESIDENT"] = "0"
    try:
        st_cold = slab.SlabStreamRunner(db_s, seq_len)
        emit("min2_stream_nocache@16384x4M", bench_runner(st_cold), cmp_s,
             n_slabs=st_cold.n_slabs)
    finally:
        os.environ.pop("SMAFA_TPU_SLAB_RESIDENT", None)


if __name__ == "__main__":
    main()
