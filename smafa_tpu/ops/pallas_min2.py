"""Pallas fused min2 kernel: matmul + dual packed-key lane-partial minima.

Mosaic twin of ops.distance.min2_scan. Differences from the first-cut
kernel (ops.pallas_scan): accumulators are lane-partial [TB, 128] minima
— no cross-lane reduction and no narrow [TB, 1] stores inside the chunk
loop — and there is no tie-count (uniqueness comes from the dual-key
trick), so every per-chunk op is either the MXU contraction or a cheap
elementwise VPU op. The 128-lane partials are min-reduced by XLA outside
the kernel (one tiny op).

Grid (B/TB, W/TW), db-chunk axis innermost; the db block never leaves
VMEM between the matmul and the reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_KEY = 2**31 - 1
LANES = 128


def _kernel(nw_ref, q_ref, db_ref, lo_ref, hi_ref, lo_acc, hi_acc, *,
            seq_len: int, shift: int, tile_w: int, span: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        lo_acc[...] = jnp.full(lo_acc.shape, BIG_KEY, jnp.int32)
        hi_acc[...] = jnp.full(hi_acc.shape, BIG_KEY, jnp.int32)

    match = jax.lax.dot_general(
        q_ref[...], db_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dist = seq_len - match
    gidx = j * tile_w + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    valid = gidx < nw_ref[0]
    shifted = dist << shift
    key_lo = jnp.where(valid, shifted | gidx, BIG_KEY)
    key_hi = jnp.where(valid, shifted | (span - 1 - gidx), BIG_KEY)

    tb = dist.shape[0]
    groups = tile_w // LANES
    lo_part = jnp.min(key_lo.reshape(tb, groups, LANES), axis=1)
    hi_part = jnp.min(key_hi.reshape(tb, groups, LANES), axis=1)
    lo_acc[...] = jnp.minimum(lo_acc[...], lo_part)
    hi_acc[...] = jnp.minimum(hi_acc[...], hi_part)

    @pl.when(j == nj - 1)
    def _():
        lo_ref[...] = lo_acc[...]
        hi_ref[...] = hi_acc[...]


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "shift", "span", "tile_b", "tile_w", "interpret"),
)
def min2_pallas(
    q_oh: jax.Array,       # int8 [Bp, LP], Bp % tile_b == 0
    db_oh: jax.Array,      # int8 [Wp, LP], Wp % tile_w == 0
    n_windows: jax.Array,  # int32 [1]
    seq_len: int,
    shift: int,
    span: int,
    tile_b: int = 512,
    tile_w: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(key_lo, key_hi) per query row — same contract as distance.min2_scan."""
    bp, lp = q_oh.shape
    wp = db_oh.shape[0]
    grid = (bp // tile_b, wp // tile_w)

    kernel = functools.partial(
        _kernel, seq_len=seq_len, shift=shift, tile_w=tile_w, span=span
    )
    lo, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, lp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, lp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, LANES), jnp.int32),
            jax.ShapeDtypeStruct((bp, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, LANES), jnp.int32),
            pltpu.VMEM((tile_b, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * wp * lp,
            bytes_accessed=bp * lp + wp * lp * grid[0] + 8 * bp * LANES,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_windows, q_oh, db_oh)

    return jnp.min(lo, axis=1), jnp.min(hi, axis=1)
