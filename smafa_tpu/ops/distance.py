"""Device-side Hamming distance engine.

The reference computes per-pair distance as ``popcount(a ^ b) / 2`` over
packed u64 words (reference lib.rs:80-88) — a CPU bit-trick. For one-hot
encodings this identity holds::

    popcount(a ^ b) / 2  ==  L - <onehot(a), onehot(b)>

(each aligned column contributes 1 to the dot product iff both sides carry
the same single one-hot code, else 0), so the whole query-vs-db scan is one
int8 matmul on the MXU::

    distance[b, w] = L - Q[b, L*5] @ D[w, L*5]^T

Selection (best-hit / top-K including ties at the cutoff) runs as an exact
chunked top-M merge: the db is scanned in W-chunks, each chunk's distances
fused by XLA into the matmul, and a running (distance, index) top-M carried
through a ``lax.scan``. Tie order is pinned to the reference's
``(distance, subject_index)`` ascending sort (lib.rs:243-250) by relying on
``lax.top_k``'s lower-index-first tie-breaking over a concatenation that
always places lower global indices first.

Everything here is shape-static and jit-cached; callers pad B/W/L to the
canonical grid (see ``pad_*`` helpers).
"""

from __future__ import annotations

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
        d_new, i_new = _merge_topm(d_carry, i_carry, dist_m, gidx_b, m)
        return (d_new, i_new, max_carry), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (d, i, mx), _ = jax.lax.scan(step, init, offsets)
    return d, i, mx


@partial(jax.jit, static_argnames=("seq_len", "chunk"))
def min_scan(
    q_oh: jax.Array,
    db_oh: jax.Array,
    n_windows: jax.Array,
    seq_len: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """(min distance, first argmin) per query row — the cluster-op kernel
    (reference cluster.rs:51-68 semantics: lowest index among ties)."""
    b = q_oh.shape[0]
    wp = db_oh.shape[0]
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


def pad_rows(arr: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    n = arr.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)
