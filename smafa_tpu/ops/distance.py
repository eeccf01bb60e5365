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
  lib.rs:306-313), the highest tied index, and range-narrowing bounds.
- ``collect_scan`` / ``collect_loop``: a while_loop of range-masked
  min2 passes enumerating EVERY minimum-distance window (best-hit mode's
  full output set), two ties per iteration, on device.
- ``kmode_phase1`` / ``kmode_enumerate``: binary-search the Kth-smallest
  distance with ``<=``-count scans, then enumerate all hits at
  ``<= min(cutoff, max_divergence)`` from both ends of key order into a
  buffer that is sorted when the cursors meet — the reference's K-mode
  print set, cutoff ties included (lib.rs:241-295).
- ``topm_scan``: the exact chunked (distance, index) top-M sort-merge,
  retained as the fallback for degenerate cases (key-packing overflow,
  >4096 hits per row).

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


TIE_CAP = 64  # device-side tie buffer width; overflow rows resolve on host


@partial(jax.jit, static_argnames=("seq_len", "shift", "chunk", "index_span", "cap"))
def collect_scan(
    q_oh: jax.Array,       # int8 [B, LP]
    db_oh: jax.Array,      # int8 [Wp, LP]
    n_windows: jax.Array,  # int32 scalar
    seq_len: int,
    shift: int,
    chunk: int,
    index_span: int,
    cap: int = TIE_CAP,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per row: (min distance, ALL minimum-distance indices, count, overflow).

    The full best-hit resolution — reference lib.rs:306-313 "print every
    window at the min" — as ONE device program: a ``lax.while_loop`` of
    range-masked dual-key scans, narrowing each row's open interval to the
    innermost indices found so far (two new ties per iteration for rows
    still active). Device iterations cost ~a scan each; doing this
    on-device removes the per-pass host round trip that dominates the
    host-driven variant. Ties land unsorted in a [B, cap] buffer (-1
    padded); rows with more than ``cap`` ties set overflow and must be
    finished on the host (never at 60 bp scale: cap=64).
    """
    def scan_bounds(lo_b, hi_b):
        return min2_scan(
            q_oh, db_oh, n_windows, jnp.int32(0), lo_b, hi_b,
            seq_len, shift, chunk, index_span,
        )

    return collect_loop(scan_bounds, q_oh.shape[0], index_span, shift, cap)


def collect_loop(scan_bounds, b: int, index_span: int, shift: int, cap: int,
                 cond_reduce=None):
    """The tie-enumeration while_loop, parameterized by the bounded dual-key
    scan (single-device min2 or a shard_map pmin-merged variant).

    ``cond_reduce``: maps the local any-active bool to a globally agreed
    value. REQUIRED when the loop body contains collectives spanning
    devices that hold different query rows (e.g. the ring schedule's
    ppermute): every participant must run the same number of iterations,
    so the condition must be reduced across them (pmax). Devices whose
    rows all finished keep iterating with empty ranges (no-ops)."""
    big_key = jnp.int32(2**31 - 1)
    mask = jnp.int32((1 << shift) - 1)

    lo1, hi1 = scan_bounds(
        jnp.full((b,), -1, jnp.int32), jnp.full((b,), index_span, jnp.int32)
    )
    empty = lo1 == big_key
    dist = jnp.where(empty, jnp.int32(2**30), lo1 >> shift)
    i_lo = jnp.where(empty, jnp.int32(-1), lo1 & mask)
    i_hi = jnp.where(empty, jnp.int32(-1), index_span - 1 - (hi1 & mask))

    ties = jnp.full((b, cap), -1, jnp.int32)
    cols = jnp.arange(cap, dtype=jnp.int32)[None, :]
    ties = jnp.where((cols == 0) & ~empty[:, None], i_lo[:, None], ties)
    two = (~empty) & (i_hi != i_lo)
    ties = jnp.where((cols == 1) & two[:, None], i_hi[:, None], ties)
    count = jnp.where(empty, 0, 1) + two.astype(jnp.int32)
    active = (~empty) & (i_hi > i_lo + 1)

    def cond(state):
        local_any = jnp.any(state[0])
        return cond_reduce(local_any) if cond_reduce is not None else local_any

    def body(state):
        active, ties, count, lo_b, hi_b = state
        # Inactive rows get an empty interval, so their scan work is
        # masked to BIG_KEY (the matmul still runs; device FLOPs are
        # cheap, host round trips were not).
        lo2, hi2 = scan_bounds(
            jnp.where(active, lo_b, jnp.int32(0)),
            jnp.where(active, hi_b, jnp.int32(0)),
        )
        d2 = jnp.where(lo2 == big_key, jnp.int32(2**30), lo2 >> shift)
        found = active & (d2 == dist)
        f_lo = lo2 & mask
        f_hi = index_span - 1 - (hi2 & mask)
        pair = found & (f_hi != f_lo)
        c1 = jnp.where(found & (count < cap), count, cap)  # clamp writes
        ties = jnp.where(
            (cols == c1[:, None]) & found[:, None] & (count < cap)[:, None],
            f_lo[:, None], ties,
        )
        c2 = jnp.where(pair & (count + 1 < cap), count + 1, cap)
        ties = jnp.where(
            (cols == c2[:, None]) & pair[:, None] & (count + 1 < cap)[:, None],
            f_hi[:, None], ties,
        )
        count = count + found.astype(jnp.int32) + pair.astype(jnp.int32)
        lo_b = jnp.where(found, f_lo, lo_b)
        hi_b = jnp.where(found, f_hi, hi_b)
        active = found & (f_hi > f_lo + 1) & (count <= cap)
        return active, ties, count, lo_b, hi_b

    active, ties, count, _, _ = jax.lax.while_loop(
        cond, body, (active, ties, count, i_lo, i_hi)
    )
    overflow = count > cap
    return dist, ties, count, overflow


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


def kmode_enumerate(region_scan, b, eff, hits, shift, seq_len, span, cap,
                    cond_reduce=None):
    """Dual-ended key-order enumeration into a sorted [b, cap] buffer.

    region_scan(eff, lo_key, hi_key) -> (min key1, min rkey) over windows
    with dist <= eff[row] and lo_key[row] < key1 < hi_key[row].
    ``cond_reduce``: see collect_loop — required when region_scan contains
    collectives spanning devices with different query rows (ring).
    """
    big = jnp.int32(2**31 - 1)
    cols = jnp.arange(cap, dtype=jnp.int32)[None, :]

    def rkey_to_key1(rk):
        d = seq_len - (rk >> shift)
        i = span - 1 - (rk & ((1 << shift) - 1))
        return (d << shift) | i

    state = (
        jnp.full((b, cap), big, jnp.int32),      # buf
        jnp.zeros((b,), jnp.int32),               # front cursor
        jnp.minimum(hits, cap) - 1,               # back cursor
        jnp.full((b,), -1, jnp.int32),            # cur_lo key (exclusive)
        jnp.full((b,), big, jnp.int32),           # cur_hi key (exclusive)
        hits > 0,                                 # active
    )

    def cond(s):
        local_any = jnp.any(s[5])
        return cond_reduce(local_any) if cond_reduce is not None else local_any

    def body(s):
        buf, front, back, cur_lo, cur_hi, active = s
        k1, rk = region_scan(
            jnp.where(active, eff, jnp.int32(-1)),
            jnp.where(active, cur_lo, big),
            jnp.where(active, cur_hi, jnp.int32(-1)),
        )
        k_top = jnp.where(rk == big, big, rkey_to_key1(rk))
        found = active & (k1 != big)
        # write the low end at front, the high end at back (skip the high
        # write when both cursors point at the same remaining element)
        buf = jnp.where(
            (cols == front[:, None]) & found[:, None], k1[:, None], buf
        )
        pair = found & (k_top != k1) & (back > front)
        buf = jnp.where(
            (cols == back[:, None]) & pair[:, None], k_top[:, None], buf
        )
        front2 = front + found.astype(jnp.int32)
        back2 = back - pair.astype(jnp.int32)
        active2 = found & (front2 <= back2)
        return (buf, front2, back2, jnp.where(found, k1, cur_lo),
                jnp.where(pair, k_top, cur_hi), active2)

    buf, front, back, _, _, _ = jax.lax.while_loop(cond, body, state)
    return buf


@partial(jax.jit, static_argnames=("seq_len", "shift", "chunk", "index_span"))
def kmode_stats_scan(
    q_oh, db_oh, n_windows, k, maxdiv, seq_len, shift, chunk, index_span
):
    """Phase-1 program (single device): (eff cutoff, exact hit count)."""
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


def region_chunk_update(carry, dist, lidx, n_windows, eff, lo_key, hi_key,
                        seq_len, shift, index_span, index_offset=0):
    """Fold one distance chunk into the running (min key1, min rkey) over
    the per-row key region (see _region_pass). Shared like
    stats_chunk_update."""
    m1, mr = carry
    big = jnp.int32(2**31 - 1)
    valid = (lidx < n_windows)[None, :]
    gidx = index_offset + lidx
    key1 = (dist << shift) | gidx[None, :]
    sel = (
        valid
        & (dist <= eff[:, None])
        & (key1 > lo_key[:, None])
        & (key1 < hi_key[:, None])
    )
    rkey = ((seq_len - dist) << shift) | (index_span - 1 - gidx)[None, :]
    m1 = jnp.minimum(m1, jnp.min(jnp.where(sel, key1, big), axis=1))
    mr = jnp.minimum(mr, jnp.min(jnp.where(sel, rkey, big), axis=1))
    return m1, mr


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


def _region_pass(q_oh, db_oh, n_windows, eff, lo_key, hi_key,
                 seq_len, shift, chunk, index_span, index_offset=0):
    """One fused pass: (min key1, min rkey) over the per-row key region.

    ``index_offset`` is the global index of db_oh row 0 (nonzero for db
    shards), so packed keys compare globally and shard merges are pmin.
    """
    b = q_oh.shape[0]
    n_chunks = db_oh.shape[0] // chunk
    big = jnp.int32(2**31 - 1)

    def step(carry, off):
        block = jax.lax.dynamic_slice_in_dim(db_oh, off, chunk, axis=0)
        dist = seq_len - _match_dots(q_oh, block)
        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
        return region_chunk_update(
            carry, dist, lidx, n_windows, eff, lo_key, hi_key,
            seq_len, shift, index_span, index_offset,
        ), None

    init = (jnp.full((b,), big, jnp.int32), jnp.full((b,), big, jnp.int32))
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (m1, mr), _ = jax.lax.scan(step, init, offsets)
    return m1, mr


@partial(
    jax.jit, static_argnames=("seq_len", "shift", "chunk", "index_span", "cap")
)
def kmode_enum_scan(
    q_oh, db_oh, n_windows, eff, hits, seq_len, shift, chunk, index_span, cap
):
    """Phase-2 program (single device): sorted key buffer [B, cap]."""
    def region_scan(e, lo_k, hi_k):
        return _region_pass(
            q_oh, db_oh, n_windows, e, lo_k, hi_k,
            seq_len, shift, chunk, index_span,
        )

    return kmode_enumerate(
        region_scan, q_oh.shape[0], eff, hits, shift, seq_len, index_span, cap
    )


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
