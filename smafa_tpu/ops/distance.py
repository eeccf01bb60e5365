"""Device-side Hamming distance engine.

The reference computes per-pair distance as ``popcount(a ^ b) / 2`` over
packed u64 words (reference lib.rs:80-88) — a CPU bit-trick. For one-hot
encodings this identity holds::

    popcount(a ^ b) / 2  ==  L - <onehot(a), onehot(b)>

(each aligned column contributes 1 to the dot product iff both sides carry
the same single one-hot code, else 0), so the whole query-vs-db scan is one
int8 matmul on the MXU::

    distance[b, w] = L - Q[b, L*5] @ D[w, L*5]^T

Selection is sort-free. Distances are bounded by the window length, so a
packed key ``(dist << shift) | subject_index`` orders pairs exactly as
the reference's ``(distance, subject_index)`` ascending sort
(lib.rs:243-250), and every selection mode reduces to fused integer-min
scans over those keys:

- ``min2_scan``: dual keys (index ascending + descending) over a per-row
  open index interval — one pass gives the best hit (lowest-index tie,
  lib.rs:306-313) and the highest tied index.
- ``min2_count_scan``: the dual-key pass fused with an exact count of
  windows at the min — best-hit phase A. Rows with <= 2 ties are fully
  resolved; the rest are enumerated by ONE ``compact_scan`` pass.
- ``compact_scan``: one pass emitting EVERY (row, window) pair with
  dist <= thresh[row] into a flat buffer in (row, index) order, via a
  cumulative-rank + searchsorted gather (no sort, no scatter). Serves
  best-hit tie enumeration (thresh = row min, lib.rs:306-313) and the
  K-mode print set (thresh = effective cutoff, lib.rs:261-265).
- ``hist_scan`` / ``kmode_cutoffs_from_hist``: one pass computing the
  exact [B, L+1] distance histogram; the host reads the Kth-smallest
  distance, row max, and hit counts off its cumulative sum — the K-mode
  cutoff rule (lib.rs:253-265). ``kmode_phase1`` (binary-search count
  scans) remains for very long windows.
- ``topm_scan``: the exact chunked (distance, index) top-M sort-merge,
  retained as the fallback when key packing overflows 31 bits.

Everything here is shape-static and jit-cached; callers pad B/W/L to the
canonical grid (see ``pad_*`` helpers). Shard-map wrappers in
smafa_tpu.parallel reuse these primitives with pmin/psum merges (packed
keys carry global indices, so elementwise pmin IS the cross-shard merge).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smafa_tpu.core.alphabet import N_CHANNELS

BIG = np.int32(2**30)  # sentinel distance for padded / masked-out windows
LANE = 128  # TPU lane width: pad the contraction axis to a multiple of this


def padded_feature_dim(seq_len: int) -> int:
    l5 = seq_len * N_CHANNELS
    return ((l5 + LANE - 1) // LANE) * LANE


def expand_onehot(codes: np.ndarray | jax.Array, seq_len: int) -> jax.Array:
    """Channel indices uint8 [..., L] -> one-hot int8 [..., LP] (lane-padded).

    Pad columns are all-zero on both query and db sides, so they contribute
    nothing to the dot product — the same trick as the reference's
    zero-padded trailing u64 chunk (lib.rs:32-46).
    """
    codes = jnp.asarray(codes)
    oh = (codes[..., :, None] == jnp.arange(N_CHANNELS, dtype=codes.dtype)).astype(jnp.int8)
    flat = oh.reshape(codes.shape[:-1] + (seq_len * N_CHANNELS,))
    lp = padded_feature_dim(seq_len)
    if lp != seq_len * N_CHANNELS:
        pad = [(0, 0)] * (flat.ndim - 1) + [(0, lp - seq_len * N_CHANNELS)]
        flat = jnp.pad(flat, pad)
    return flat


def _match_dots(q_oh: jax.Array, d_oh: jax.Array) -> jax.Array:
    """int32 [B, W] count of matching columns — the MXU contraction."""
    return jax.lax.dot_general(
        q_oh, d_oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@partial(jax.jit, static_argnames=("seq_len",))
def pairwise_distances(q_oh: jax.Array, d_oh: jax.Array, seq_len: int) -> jax.Array:
    """Full [B, W] distance matrix (small-problem path and test oracle)."""
    return seq_len - _match_dots(q_oh, d_oh)


def _merge_topm(
    d_carry: jax.Array, i_carry: jax.Array, dist: jax.Array, gidx: jax.Array, m: int
) -> tuple[jax.Array, jax.Array]:
    """Merge a new distance block into the running top-M.

    Correct (distance, index)-ascending tie order requires every column of
    the concatenation to be ordered by global index within equal distance:
    the carry is already (d, idx)-sorted and holds indices lower than any
    in the new block, and the block's columns ascend in index.
    """
    cat_d = jnp.concatenate([d_carry, dist], axis=1)
    cat_i = jnp.concatenate([i_carry, gidx], axis=1)
    neg, pos = jax.lax.top_k(-cat_d, m)
    return -neg, jnp.take_along_axis(cat_i, pos, axis=1)


@partial(jax.jit, static_argnames=("seq_len", "m", "chunk"))
def topm_scan(
    q_oh: jax.Array,       # int8 [B, LP]
    db_oh: jax.Array,      # int8 [Wp, LP], Wp a multiple of chunk
    n_windows: jax.Array,  # int32 scalar: number of real (unpadded) windows
    seq_len: int,
    m: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact smallest-M (distance, index) pairs per query row.

    Returns (dist [B, M] int32 ascending, idx [B, M] int32, max_dist [B]
    int32 — the per-query maximum over all real windows, needed for the
    reference's K > num_windows rule, lib.rs:253-256).
    """
    b = q_oh.shape[0]
    wp = db_oh.shape[0]
    n_chunks = wp // chunk
    m = min(m, wp)

    init = (
        jnp.full((b, m), BIG, dtype=jnp.int32),
        jnp.full((b, m), jnp.int32(2**31 - 1), dtype=jnp.int32),
        jnp.full((b,), -1, dtype=jnp.int32),
    )

    def step(carry, off):
        d_carry, i_carry, max_carry = carry
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        gidx = off + jnp.arange(chunk, dtype=jnp.int32)
        valid = gidx < n_windows
        dist_m = jnp.where(valid[None, :], dist, BIG)
        max_carry = jnp.maximum(
            max_carry, jnp.max(jnp.where(valid[None, :], dist, -1), axis=1)
        )
        gidx_b = jnp.broadcast_to(gidx[None, :], (b, chunk))

        # The top_k merge is the expensive part (VPU sort); skip it when
        # this chunk cannot change any row's top-M. Strict <: an incoming
        # pair equal to a row's current worst sorts after the carry's
        # entries (which hold lower subject indices), so equality never
        # alters the result. After the first few chunks tighten the
        # cutoffs, most chunks take the cheap branch and the scan runs at
        # matmul+min speed.
        improves = jnp.any(jnp.min(dist_m, axis=1) < d_carry[:, m - 1])
        d_new, i_new = jax.lax.cond(
            improves,
            lambda dc, ic: _merge_topm(dc, ic, dist_m, gidx_b, m),
            lambda dc, ic: (dc, ic),
            d_carry, i_carry,
        )
        return (d_new, i_new, max_carry), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (d, i, mx), _ = jax.lax.scan(step, init, offsets)
    return d, i, mx


def packing_shift(seq_len: int, wp: int) -> int | None:
    """Bits for (dist << shift) | index packing; None if > 31 bits total.

    Distances are bounded by seq_len, so for 60 bp windows even a 10M-row
    db packs into one int32 — a single integer ``min`` then yields the
    minimum distance AND its lowest subject index (the reference tie rule,
    lib.rs:306-313 / cluster.rs:62-68) in one reduction.
    """
    bits_idx = max(1, math.ceil(math.log2(max(2, wp))))
    bits_dist = max(1, math.ceil(math.log2(seq_len + 2)))
    if bits_idx + bits_dist > 31:
        return None
    return bits_idx


@partial(jax.jit, static_argnames=("seq_len", "chunk", "shift", "index_span"))
def min2_scan(
    q_oh: jax.Array,       # int8 [B, LP]
    db_oh: jax.Array,      # int8 [Wp, LP]
    n_windows: jax.Array,  # int32 scalar: valid rows of this db block
    index_offset: jax.Array,  # int32 scalar: global index of db row 0
    lo_bound: jax.Array,   # int32 [B]: only windows with index > lo_bound count
    hi_bound: jax.Array,   # int32 [B]: only windows with index < hi_bound count
    seq_len: int,
    shift: int,
    chunk: int,
    index_span: int,       # static: global index domain size (for reversal)
) -> tuple[jax.Array, jax.Array]:
    """Per query row: packed min keys with index ascending AND descending,
    over the per-row open index interval (lo_bound, hi_bound).

    key_lo = min over windows of (dist << shift) | global_index
    key_hi = min over windows of (dist << shift) | (span-1 - global_index)

    Both reduce in the same fused pass over the distance block (no
    sequential dependency, so XLA keeps the block in registers — unlike a
    tie-count, which needs the min first). key_lo yields the reference's
    lowest-index best hit (lib.rs:306-313 tie rule); key_hi the highest.
    With full bounds (-1, span) this is the plain scan; narrowing the
    bounds to the innermost indices found so far turns repeated calls of
    the SAME compiled program into an exact enumerator of every
    minimum-distance window, two ties per pass, without any sort (the
    best-hit tie rule at matmul speed). BIG_KEY marks rows with no valid
    window in range.
    """
    n_chunks = db_oh.shape[0] // chunk
    b = q_oh.shape[0]
    big_key = jnp.int32(2**31 - 1)

    init = (
        jnp.full((b,), big_key, dtype=jnp.int32),
        jnp.full((b,), big_key, dtype=jnp.int32),
    )

    def step(carry, off):
        lo_carry, hi_carry = carry
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
        gidx = index_offset + lidx
        valid = (
            (lidx < n_windows)[None, :]
            & (gidx[None, :] > lo_bound[:, None])
            & (gidx[None, :] < hi_bound[:, None])
        )
        shifted = dist << shift
        key_lo = jnp.where(valid, shifted | gidx[None, :], big_key)
        key_hi = jnp.where(valid, shifted | (index_span - 1 - gidx)[None, :], big_key)
        return (
            jnp.minimum(lo_carry, jnp.min(key_lo, axis=1)),
            jnp.minimum(hi_carry, jnp.min(key_hi, axis=1)),
        ), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (lo, hi), _ = jax.lax.scan(step, init, offsets)
    return lo, hi


# ---------------------------------------------------------------------------
# Fused min + tie count, and one-pass hit-set compaction.
#
# Best-hit mode must print EVERY window at the minimum distance in index
# order (reference lib.rs:306-313); K-mode must print every window at
# <= min(Kth-smallest, max_divergence) in (distance, index) order
# (lib.rs:241-295). Both output sets are enumerated by ONE extra pass over
# the db — ``compact_scan`` — instead of the round-1 while_loop of
# range-masked rescans (two ties per full rescan):
#
#   phase A (dispatch): ``min2_count_scan`` — the dual packed-key min scan
#            fused with an exact count of windows at the min. Rows with
#            count <= 2 are fully resolved by phase A alone (the dual keys
#            carry the lowest AND highest tied index).
#   phase B (only when some row has >= 3 ties, or in K-mode): one
#            compaction pass. Per chunk, the hits (dist <= thresh[row])
#            are ranked by a row-major cumulative sum and gathered into a
#            flat [t_cap] buffer via ``searchsorted`` on the cumulative
#            ranks — an all-gather formulation (no scatter, which XLA
#            serializes on TPU; no sort). The buffer comes back in
#            (row, index) order; hosts lexsort the few thousand entries
#            when a merge across shards or a (distance, index) K-mode
#            order is needed.
#
# t_cap is chosen by the host from phase A's exact counts (or the
# histogram), so phase B never overflows.


def min_count_chunk_update(carry, dist, lidx, n_windows, gidx, shift,
                           index_span):
    """Fold one distance chunk into the running (lo key, hi key, count at
    min, min dist) state. Shared by the single-device/row-sharded scans
    and the ring/column-sharded loops."""
    lo_c, hi_c, cnt_c, d_c = carry
    big_key = jnp.int32(2**31 - 1)
    valid = (lidx < n_windows)[None, :]
    dist_m = jnp.where(valid, dist, BIG)
    blk_d = jnp.min(dist_m, axis=1)
    blk_cnt = jnp.sum(valid & (dist == blk_d[:, None]), axis=1,
                      dtype=jnp.int32)
    shifted = dist << shift
    key_lo = jnp.where(valid, shifted | gidx[None, :], big_key)
    key_hi = jnp.where(valid, shifted | (index_span - 1 - gidx)[None, :],
                       big_key)
    cnt_n = jnp.where(
        blk_d < d_c, blk_cnt,
        jnp.where(blk_d == d_c, cnt_c + blk_cnt, cnt_c),
    )
    return (
        jnp.minimum(lo_c, jnp.min(key_lo, axis=1)),
        jnp.minimum(hi_c, jnp.min(key_hi, axis=1)),
        cnt_n,
        jnp.minimum(d_c, blk_d),
    )


@partial(jax.jit, static_argnames=("seq_len", "shift", "chunk", "index_span"))
def min2_count_scan(
    q_oh: jax.Array,       # int8 [B, LP]
    db_oh: jax.Array,      # int8 [Wp, LP]
    n_windows: jax.Array,  # int32 scalar: valid rows of this db block
    index_offset: jax.Array,  # int32 scalar: global index of db row 0
    seq_len: int,
    shift: int,
    chunk: int,
    index_span: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per row: (lo key, hi key, exact count of windows at the min dist).

    One fused pass: the best-hit phase-A program. lo/hi are the dual
    packed keys of min2_scan (lowest- and highest-index window at the
    min); count is exact, so the caller knows up front whether phase B
    (compaction) is needed and how big its buffer must be. Empty rows
    (n_windows == 0) return BIG keys and count 0.
    """
    n_chunks = db_oh.shape[0] // chunk
    b = q_oh.shape[0]
    big_key = jnp.int32(2**31 - 1)
    init = (
        jnp.full((b,), big_key, jnp.int32),
        jnp.full((b,), big_key, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.full((b,), BIG, jnp.int32),
    )

    def step(carry, off):
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
        gidx = index_offset + lidx
        return min_count_chunk_update(
            carry, dist, lidx, n_windows, gidx, shift, index_span
        ), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (lo, hi, cnt, _), _ = jax.lax.scan(step, init, offsets)
    return lo, hi, cnt


def compact_chunk_update(carry, dist, lidx, n_windows, thresh, index_offset,
                         t_cap):
    """Fold one distance chunk into the flat compaction buffer.

    carry = (rows [t_cap], idx [t_cap], dvals [t_cap], total scalar).
    Hits are entries with dist <= thresh[row] (thresh = -1 disables a
    row); they are appended to the buffer in (row, window index) order.
    The append is gather-based: a row-major cumulative count ranks every
    hit, and ``searchsorted`` over the (sorted) flat ranks finds, for each
    destination slot, the source element — no scatter, no sort.
    Entries past t_cap are dropped but still counted, so the caller can
    detect (and with exact phase-A/histogram counts, prevent) overflow.
    """
    rows_b, idx_b, dist_b, total = carry
    b, chunk = dist.shape
    valid = (lidx < n_windows)[None, :]
    mask = valid & (dist <= thresh[:, None])
    inc = mask.astype(jnp.int32)
    within = jnp.cumsum(inc, axis=1)              # 1-based rank within row
    row_counts = within[:, -1]
    row_start = jnp.cumsum(row_counts) - row_counts
    flat_cum = (row_start[:, None] + within).reshape(-1)  # nondecreasing
    chunk_total = row_start[-1] + row_counts[-1]
    slots = jnp.arange(t_cap, dtype=jnp.int32)
    s_rel = slots - total
    take = (s_rel >= 0) & (s_rel < chunk_total)
    # First flat element whose cumulative rank reaches s_rel+1 IS the
    # (s_rel+1)-th hit of this chunk (ranks only increment at hits).
    src = jnp.searchsorted(flat_cum, s_rel + 1, side="left")
    src = jnp.clip(src, 0, b * chunk - 1).astype(jnp.int32)
    b_src = src // chunk
    w_src = src % chunk
    g = (index_offset + lidx[w_src]).astype(jnp.int32)
    dval = jnp.take(dist.reshape(-1), src)
    return (
        jnp.where(take, b_src, rows_b),
        jnp.where(take, g, idx_b),
        jnp.where(take, dval, dist_b),
        total + chunk_total,
    )


@partial(jax.jit, static_argnames=("seq_len", "chunk", "t_cap"))
def compact_scan(
    q_oh: jax.Array,       # int8 [B, LP]
    db_oh: jax.Array,      # int8 [Wp, LP]
    n_windows: jax.Array,  # int32 scalar
    thresh: jax.Array,     # int32 [B]: per-row inclusive cutoff (-1 = skip row)
    index_offset: jax.Array,  # int32 scalar
    seq_len: int,
    chunk: int,
    t_cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One pass: every (row, window) with dist <= thresh[row], flattened.

    Returns (rows [t_cap], idx [t_cap], dvals [t_cap], total) with unused
    slots at rows == -1. Output is ordered by (row, window index) — the
    best-hit emission order; K-mode re-orders per row by (dist, index) on
    the host.
    """
    n_chunks = db_oh.shape[0] // chunk
    init = (
        jnp.full((t_cap,), -1, jnp.int32),
        jnp.full((t_cap,), -1, jnp.int32),
        jnp.full((t_cap,), BIG, jnp.int32),
        jnp.int32(0),
    )

    def step(carry, off):
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
        return compact_chunk_update(
            carry, dist, lidx, n_windows, thresh, index_offset, t_cap
        ), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (rows, idx, dvals, total), _ = jax.lax.scan(step, init, offsets)
    return rows, idx, dvals, total


HIST_MAX = 1024  # histogram path only for seq_len < HIST_MAX (else binary search)


def hist_chunk_update(carry, dist, lidx, n_windows, seq_len):
    """Fold one distance chunk into the running [B, seq_len+1] histogram."""
    valid = (lidx < n_windows)[None, :, None]
    bins = jnp.arange(seq_len + 1, dtype=jnp.int32)[None, None, :]
    return carry + jnp.sum(
        (dist[:, :, None] == bins) & valid, axis=1, dtype=jnp.int32
    )


@partial(jax.jit, static_argnames=("seq_len", "chunk"))
def hist_scan(
    q_oh: jax.Array, db_oh: jax.Array, n_windows: jax.Array,
    seq_len: int, chunk: int,
) -> jax.Array:
    """[B, seq_len+1] exact distance histogram — the K-mode phase-A program.

    One pass yields everything the reference's cutoff rule needs
    (lib.rs:253-256): the Kth-smallest distance, the per-row max, and the
    exact hit count at any cutoff all read off the host-side cumulative
    sum of a [B, L+1] table, replacing round 1's ~log2(L) binary-search
    count scans.
    """
    b = q_oh.shape[0]
    n_chunks = db_oh.shape[0] // chunk

    def step(carry, off):
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
        return hist_chunk_update(carry, dist, lidx, n_windows, seq_len), None

    init = jnp.zeros((b, seq_len + 1), jnp.int32)
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    hist, _ = jax.lax.scan(step, init, offsets)
    return hist


def kmode_cutoffs_from_hist(hist: np.ndarray, k: int,
                            max_divergence: int | None,
                            n_windows: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side K-mode cutoff rule from the distance histogram.

    Returns (eff [B] effective cutoff, hits [B] exact hit count), with the
    reference semantics: cutoff = Kth-smallest distance, or the per-row
    max when K > number of db windows (lib.rs:253-256); eff = min(cutoff,
    max_divergence); hits = count of windows at <= eff (cutoff ties
    included, lib.rs:261-265).
    """
    seq_len = hist.shape[1] - 1
    cum = hist.cumsum(axis=1)
    kth = (cum < k).sum(axis=1)  # first t with cum[t] >= k; L+1 if none
    nz = hist > 0
    maxd = seq_len - np.argmax(nz[:, ::-1], axis=1)  # last nonzero bin
    cutoff = np.where(k > n_windows, maxd, kth).astype(np.int64)
    if max_divergence is not None:
        cutoff = np.minimum(cutoff, max_divergence)
    eff = np.clip(cutoff, 0, seq_len)
    hits = cum[np.arange(hist.shape[0]), eff]
    return eff.astype(np.int32), hits.astype(np.int32)


# ---------------------------------------------------------------------------
# K-mode (top-K with cutoff ties) without any sort.
#
# The packed key (dist << shift) | index orders pairs exactly by
# (distance, subject_index) — the reference's K-mode output order
# (lib.rs:243-250). The reference cutoff is the Kth smallest distance (or
# the row max when K > W, lib.rs:253-256), and every pair with
# d <= min(cutoff, max_divergence) prints. So K-mode reduces to:
#
#   phase 1: per row, find max distance + binary-search the Kth smallest
#            distance with fused <=-count scans (7 passes), then the exact
#            hit count at the effective cutoff;
#   phase 2: enumerate the hit set in key order from BOTH ends — the min
#            remaining key and the max remaining key per pass (the max via
#            a reverse key ((L - dist) << shift) | (span-1 - index), whose
#            min is the (dist, idx)-max) — writing a front cursor forward
#            and a back cursor backward into a [B, cap] buffer that is
#            therefore already sorted when the cursors meet.
#
# Every pass is matmul + elementwise mask + min/sum reductions — the same
# fused shape as min2_scan; no top_k, no sort, no HBM intermediates.


def kmode_phase1(scan_stats, k, maxdiv, n_windows, seq_len):
    """cutoff search. scan_stats(t) -> (count of dist <= t per row, max dist
    per row); k, maxdiv traced int32 scalars (maxdiv = seq_len+1 if unused).

    Returns (eff [B] effective cutoff, hits [B] exact hit count).
    """
    steps = max(1, math.ceil(math.log2(seq_len + 2)))
    # Binary search smallest t in [0, seq_len] with count(<= t) >= k.
    _, maxd = scan_stats(jnp.full((1,), seq_len, jnp.int32))
    b = maxd.shape[0]
    t_lo = jnp.zeros((b,), jnp.int32)
    t_hi = jnp.full((b,), seq_len, jnp.int32)

    def body(_, carry):
        t_lo, t_hi = carry
        mid = (t_lo + t_hi) // 2
        cnt, _ = scan_stats(mid)
        ge = cnt >= k
        return jnp.where(ge, t_lo, mid + 1), jnp.where(ge, mid, t_hi)

    t_lo, t_hi = jax.lax.fori_loop(0, steps, body, (t_lo, t_hi))
    kth = t_hi  # smallest t with count(<= t) >= k (== row max if k > count)
    cutoff = jnp.where(k > n_windows, maxd, kth)
    eff = jnp.minimum(cutoff, maxdiv)
    hits, _ = scan_stats(eff)
    return eff, hits


@partial(jax.jit, static_argnames=("seq_len", "shift", "chunk", "index_span"))
def kmode_stats_scan(
    q_oh, db_oh, n_windows, k, maxdiv, seq_len, shift, chunk, index_span
):
    """Phase-A program for long windows (single device): (eff cutoff,
    exact hit count) via binary-search count scans. Short windows use
    ``hist_scan`` instead (one pass)."""
    def scan_stats(t):
        t = jnp.broadcast_to(t, (q_oh.shape[0],))
        return _stats_pass(q_oh, db_oh, n_windows, t, seq_len, chunk)

    return kmode_phase1(scan_stats, k, maxdiv, n_windows, seq_len)


def stats_chunk_update(carry, dist, lidx, n_windows, t):
    """Fold one distance chunk into the running (count <= t, max) stats.

    Shared by the single-device/row-sharded passes (dist from the plain
    matmul) and the column-sharded pass (dist from a psum of partial
    matmuls) — the selection semantics live in exactly one place.
    """
    cnt, mx = carry
    valid = (lidx < n_windows)[None, :]
    cnt = cnt + jnp.sum(valid & (dist <= t[:, None]), axis=1, dtype=jnp.int32)
    mx = jnp.maximum(mx, jnp.max(jnp.where(valid, dist, -1), axis=1))
    return cnt, mx


def _stats_pass(q_oh, db_oh, n_windows, t, seq_len, chunk):
    """One fused pass: (count of dist <= t[row], max dist) per row."""
    b = q_oh.shape[0]
    n_chunks = db_oh.shape[0] // chunk

    def step(carry, off):
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
        return stats_chunk_update(carry, dist, lidx, n_windows, t), None

    init = (jnp.zeros((b,), jnp.int32), jnp.full((b,), -1, jnp.int32))
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (cnt, mx), _ = jax.lax.scan(step, init, offsets)
    return cnt, mx


def unpack_key(key: np.ndarray, shift: int) -> tuple[np.ndarray, np.ndarray]:
    """Packed keys -> (distance, index); BIG/int32-max for empty rows."""
    big = key == np.int32(2**31 - 1)
    dist = np.where(big, np.int32(2**30), key >> shift).astype(np.int32)
    idx = np.where(big, np.int32(2**31 - 1), key & ((1 << shift) - 1)).astype(np.int32)
    return dist, idx


def unpack_min2(lo: np.ndarray, hi: np.ndarray, shift: int, span: int):
    """Dual packed keys -> (dist, lowest idx, unique-min flag).

    The single decode rule for every runner (sharded/ring/seqpar/
    multihost): the hi key carries span-1-idx, so equal low/high indices
    <=> exactly one window at the min; empty rows (BIG keys) count as
    unique (nothing to enumerate).
    """
    dist, idx = unpack_key(lo, shift)
    _, idx_rev = unpack_key(hi, shift)
    unique = (idx == (span - 1 - idx_rev)) | (lo == np.int32(2**31 - 1))
    return dist, idx, unique


@partial(jax.jit, static_argnames=("seq_len", "chunk"))
def min_scan(
    q_oh: jax.Array,
    db_oh: jax.Array,
    n_windows: jax.Array,
    seq_len: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """(min distance, first argmin) per query row — the cluster-op kernel
    (reference cluster.rs:51-68 semantics: lowest index among ties).

    Uses the packed-key reduction when the (seq_len, Wp) pair fits 31 bits
    (always, for this domain); falls back to a (dist, idx) pair carry.
    """
    b = q_oh.shape[0]
    wp = db_oh.shape[0]
    shift = packing_shift(seq_len, wp)
    if shift is not None:
        key, _ = min2_scan(
            q_oh, db_oh, n_windows, jnp.int32(0),
            jnp.full((b,), -1, jnp.int32), jnp.full((b,), wp, jnp.int32),
            seq_len, shift, chunk, wp,
        )
        big = key == jnp.int32(2**31 - 1)
        return (
            jnp.where(big, BIG, key >> shift),
            jnp.where(big, jnp.int32(2**31 - 1), key & ((1 << shift) - 1)),
        )

    n_chunks = wp // chunk
    init = (
        jnp.full((b,), BIG, dtype=jnp.int32),
        jnp.full((b,), jnp.int32(2**31 - 1), dtype=jnp.int32),
    )

    def step(carry, off):
        d_carry, i_carry = carry
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        gidx = off + jnp.arange(chunk, dtype=jnp.int32)
        dist = jnp.where((gidx < n_windows)[None, :], dist, BIG)
        blk_min = jnp.min(dist, axis=1)
        blk_arg = jnp.argmin(dist, axis=1).astype(jnp.int32) + off
        better = blk_min < d_carry  # strict: earlier chunks keep ties (lower idx)
        return (
            jnp.where(better, blk_min, d_carry),
            jnp.where(better, blk_arg, i_carry),
        ), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (d, i), _ = jax.lax.scan(step, init, offsets)
    return d, i


def bucket(n: int, minimum: int = 16) -> int:
    """Power-of-two size bucketing — the single shape-bucketing policy
    (jit program shapes, top-M widths, capacity growth)."""
    return max(minimum, 1 << math.ceil(math.log2(max(1, n))))


def pad_batch(
    q_codes: np.ndarray, multiple: int = 1, minimum: int = 16
) -> tuple[np.ndarray, int, int]:
    """Pad a query batch to a power-of-two bucket rounded up to a multiple
    of the mesh axis size. Returns (padded, nq, b).

    The single batch-padding rule for every runner: power-of-two
    bucketing caps the number of distinct jit program shapes; rounding to
    ``multiple`` keeps shard_map splits even. Padded rows produce garbage
    results that callers trim with nq.
    """
    nq = q_codes.shape[0]
    b = ((bucket(nq, minimum) + multiple - 1) // multiple) * multiple
    if nq < b:
        q_codes = np.pad(q_codes, [(0, b - nq), (0, 0)])
    return q_codes, nq, b
