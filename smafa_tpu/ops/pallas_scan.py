"""Fused Pallas (Mosaic) scan kernel: matmul + packed-key min + tie count.

The pure-XLA path (ops.distance) materializes each [B, chunk] distance
block in HBM between the matmul and the reduction — at large W that HBM
round-trip, not the MXU, bounds throughput. This kernel fuses the whole
per-block pipeline in VMEM:

    dist  = L - Q_tile @ D_chunk^T          (MXU, int8 -> int32)
    key   = (dist << SHIFT) | global_index  (VPU)
    carry = min(carry, row_min(key))        (VPU, scratch-resident)
    ties  = running count of dist == row-min distance

so the distance block never leaves VMEM. The packed key gives the exact
reference tie rule — lowest subject index among minimum-distance windows
(reference cluster.rs:62-68, lib.rs:306-313) — with a single integer min.
The tie count lets best-hit mode (reference lib.rs:296-314: print ALL
windows at the min distance) detect multi-hit rows without a second scan:
rows with count == 1 are fully resolved here; the rare count > 1 rows are
re-scanned with the exact top-M path at m = max count.

Key packing needs ceil_log2(L+1) + ceil_log2(Wp) <= 31; callers fall back
to the XLA path beyond that (10M x 60 bp is 24 + 6 bits — comfortably in).

Grid: (B/TB, W/TW), db-chunk axis innermost so the per-row carry lives in
VMEM scratch across chunks; outputs are written at the last chunk step.

STATUS: two generations live here.

- ``min_count_scan`` (round 1, below) — measured 88-143e9 vs XLA's
  ~210e9 and retired from the hot path: it streams the ONE-HOT db per
  query tile (1.6 GB re-read B/TB times). Kept parity-tested as the
  historical Mosaic reference.
- ``min2_scan_pallas`` (round 3, bottom of file; round 4 added the
  fused tie count and multi-device shipping) — the SHIPPED phase-A
  program for big dbs: fixed data movement (pre-embedded rank-4 db
  streamed once per query tile at 256 B/row, zc folded into a spare
  int8 column; two in-kernel sub-dots per grid step) measured 453.9e9
  vs the XLA lowering's 408e9 at 65536 x 4M without the count
  (docs/PERFORMANCE.md round-3 anatomy). Round 4 fuses the exact
  per-row tie count into the same pass (with_count, default on), so
  best-hit needs NO separate tcount dispatch, and runs the kernel per
  'w' shard inside shard_map on multi-device meshes (sharded + ring
  layouts — keys globalize by offset adds, counts merge with one
  conditional psum). Gated by min2_eligible below;
  SMAFA_TPU_PALLAS_MIN2 overrides (=interpret for CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smafa_tpu.ops.distance import packing_shift  # single packing rule  # noqa: F401

BIG_KEY = 2**31 - 1  # plain int: jnp constants can't be captured by the kernel

DEFAULT_TILE_B = 256
DEFAULT_TILE_W = 2048

# Measured-best min2 tiles (docs/PERFORMANCE.md round-5 sweep at
# 65536 x 4M, same session: (512,8192,2) 507.3e9 / (2048,4096,2) 481.9
# / (1024,4096,2) 474.6 / (1024,8192,4) 471.2 / (512,8192,4) 462.4 /
# (1024,2048,1) 451.8) — narrower query tiles against wider db tiles
# win: the db-side VMEM stream amortizes over more MXU work per grid
# step while the per-sub-tile epilogue stays on [512, 4096] blocks.
MIN2_TILE_B = 512
MIN2_TILE_PREFS = ((8192, 2), (4096, 2), (2048, 2), (1024, 2), (512, 1))


def pick_min2_tiles(b_loc: int, shard_wp: int,
                    interpret: bool) -> tuple[int, int, int] | None:
    """(tile_b, tile_w, sub) for min2_scan_pallas over one device's
    [b_loc] query rows x [shard_wp] db rows, or None when no supported
    tiling divides. Interpret mode (CPU tests) additionally accepts
    tiny whole-shard tiles."""
    tile_b = min(MIN2_TILE_B, b_loc)
    if tile_b <= 0 or b_loc % tile_b:
        return None
    for tw, sub in MIN2_TILE_PREFS:
        if tw <= shard_wp and shard_wp % tw == 0:
            return tile_b, tw, sub
    if interpret and shard_wp > 0:
        return tile_b, shard_wp, 2 if shard_wp % 2 == 0 else 1
    return None


def min2_count_enabled() -> bool:
    """Whether the shipped Mosaic phase A fuses the tie count
    (SMAFA_TPU_PALLAS_COUNT=0/1 overrides). Measured trade on the v5e
    chip: the fused count costs ~38% of the pass on EVERY batch
    (476.6 -> 297-309 e9 cmp/s at 65536 x 4M — the compare+add epilogue
    on every distance element), and saves the separate tcount dispatch
    for tied rows (~0.45 scan-equivalents at random-data tie rates)
    plus one serial dispatch+fetch round trip. End-to-end best-hit at
    16384 x 1M through the remote-dispatch tunnel: 0.328 s/batch fused
    vs 0.355 s/batch tcount — an ~8% win that is entirely round-trip
    latency. On a locally-attached TPU (~1 ms dispatch) the tcount
    path's extra dispatch is cheaper than taxing every phase-A element,
    so the default is OFF; set SMAFA_TPU_PALLAS_COUNT=1 on high-latency
    links. Round 5: the latency-probed ONE-WAVE program (bestfull,
    hitops.bestfull_async) supersedes this trade for best-hit — it
    forces the fused count inside its own single dispatch on
    high-latency links — so the standalone flag now matters only for
    layouts without bestfull (ring) and for the cluster hot path, where
    the count is unused and OFF remains right on every link."""
    import os

    return os.environ.get("SMAFA_TPU_PALLAS_COUNT", "") == "1"


def min2_eligible(seq_len: int, db_width: int, b_loc: int,
                  shard_rows: int, n_windows: int, b_total: int) -> bool:
    """Shared auto/override gate for shipping min2_scan_pallas, used by
    every layout (row-sharded, ring): the kernel must beat the XLA path
    (auto: >= 2^20 rows, batch >= one tile) AND the per-shard
    [shard_rows, EP] int8 embed twin must be affordable (a quarter of
    per-device HBM). SMAFA_TPU_PALLAS_MIN2=0/1 overrides the auto gate;
    =interpret runs the kernel in Mosaic interpret mode (any backend)
    so CPU tests cover the integration end to end."""
    import os

    from smafa_tpu.ops import distance as D

    v = os.environ.get("SMAFA_TPU_PALLAS_MIN2", "")
    if v == "0":
        return False
    if not ((v == "interpret"
             or jax.devices()[0].platform not in ("cpu",))
            and db_width == seq_len  # codes-resident
            and D.embed_active(seq_len) and seq_len <= 127
            # the zc column needs a spare padded slot (not at seq_len
            # 32/64/96 where 4L is already a lane multiple)
            and D.padded_embed_dim(seq_len) > 4 * seq_len
            and pick_min2_tiles(b_loc, shard_rows,
                                v == "interpret") is not None):
        return False
    if v in ("1", "interpret"):
        return True
    if n_windows < (1 << 20) or b_total < MIN2_TILE_B:
        return False
    from smafa_tpu.parallel import select

    cap = select._hbm_capacity(per_device=True)
    return (cap is not None
            and shard_rows * D.padded_embed_dim(seq_len) <= cap // 4)


def _min_kernel(nw_ref, q_ref, db_ref, key_ref, cnt_ref, key_acc, cnt_acc, *,
                seq_len: int, shift: int, tile_w: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    match = jax.lax.dot_general(
        q_ref[...], db_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dist = seq_len - match

    gidx = j * tile_w + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    valid = gidx < nw_ref[0]
    key = jnp.where(valid, (dist << shift) | gidx, BIG_KEY)

    bkey = jnp.min(key, axis=1, keepdims=True)            # [TB, 1]
    bdist = jnp.where(bkey == BIG_KEY, jnp.int32(2**30), bkey >> shift)
    bcnt = jnp.sum(
        jnp.where(valid & (dist == bdist), jnp.int32(1), jnp.int32(0)),
        axis=1, keepdims=True,
    )

    @pl.when(j == 0)
    def _():
        key_acc[...] = bkey
        cnt_acc[...] = bcnt

    @pl.when(j > 0)
    def _():
        old_key = key_acc[...]
        old_cnt = cnt_acc[...]
        old_dist = jnp.where(old_key == BIG_KEY, jnp.int32(2**30), old_key >> shift)
        new_cnt = jnp.where(
            bdist < old_dist, bcnt,
            jnp.where(bdist == old_dist, old_cnt + bcnt, old_cnt),
        )
        key_acc[...] = jnp.minimum(old_key, bkey)
        cnt_acc[...] = new_cnt

    @pl.when(j == nj - 1)
    def _():
        key_ref[...] = key_acc[...]
        cnt_ref[...] = cnt_acc[...]


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "shift", "tile_b", "tile_w", "interpret"),
)
def min_count_scan(
    q_oh: jax.Array,       # int8 [Bp, LP], Bp % tile_b == 0
    db_oh: jax.Array,      # int8 [Wp, LP], Wp % tile_w == 0
    n_windows: jax.Array,  # int32 [1]: number of real windows
    seq_len: int,
    shift: int,
    tile_b: int = DEFAULT_TILE_B,
    tile_w: int = DEFAULT_TILE_W,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per row: (min distance, first argmin, count of windows at min distance).

    Exact over the real (unpadded) windows; padded rows of ``q_oh`` return
    garbage and must be trimmed by the caller.
    """
    bp, lp = q_oh.shape
    wp = db_oh.shape[0]
    grid = (bp // tile_b, wp // tile_w)

    kernel = functools.partial(
        _min_kernel, seq_len=seq_len, shift=shift, tile_w=tile_w
    )
    key, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, lp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, lp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, 1), jnp.int32),
            pltpu.VMEM((tile_b, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * wp * lp,
            bytes_accessed=bp * lp + wp * lp * grid[0] + 8 * bp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_windows, q_oh, db_oh)

    key = key[:, 0]
    cnt = cnt[:, 0]
    dist = jnp.where(key == BIG_KEY, jnp.int32(2**30), key >> shift)
    idx = jnp.where(key == BIG_KEY, jnp.int32(2**31 - 1), key & ((1 << shift) - 1))
    return dist, idx, cnt


# ---------------------------------------------------------------------------
# Round-3 dual-key kernel over the rank-4 embedding.
#
# The round-1 kernel above streamed the ONE-HOT db per query tile —
# 1.6 GB re-read B/TB times, which is why it measured 88-143e9. This
# variant fixes the data movement: the db is pre-expanded ONCE per batch
# into the rank-4 embedding with the per-row channel-0 count folded into
# a spare int8 column (K = 240 -> 241 pads to 256 anyway, so the column
# is free and dist = L - dot exactly — no epilogue correction), and the
# kernel streams it per query tile at 256 int8 bytes/row (4x less than
# one-hot). The dual packed-key min then runs entirely in VMEM on each
# [TB, TW] distance tile — the pipeline XLA runs at 408e9 with the
# epilogue ~40% of the pass (docs/PERFORMANCE.md round-3 anatomy); the
# experiment is whether Mosaic overlaps that epilogue with the MXU
# better than XLA's fused emitters.


def embed_db_with_zc(codes: jax.Array, seq_len: int,
                     n_windows: jax.Array | int) -> jax.Array:
    """uint8 [Wp, L] -> int8 [Wp, EP] rank-4 db embedding with the
    channel-0 count in column 4L (requires 4L+1 <= padded width and
    count <= 127, i.e. seq_len <= 127); dist = seq_len - q_emb @ this.

    Padding rows (>= n_windows) are POISONED: all-zero except -1 in the
    zc column. Every query row carries a constant 1 there
    (embed_query_with_one), so a poisoned row's dot is exactly -1 and
    its distance is exactly seq_len + 1 — the same sentinel the masked
    epilogue used (distance.min2_chunk_update; packing_shift budgets
    seq_len + 2). That moves validity out of the kernel's hot loop:
    min2's epilogue needs no compare/select at all."""
    from smafa_tpu.ops import distance as D

    emb, zc = D.expand_embed_db(codes, seq_len)
    assert emb.shape[1] > 4 * seq_len and seq_len <= 127
    emb = emb.at[:, 4 * seq_len].set(zc.astype(jnp.int8))
    rows = jnp.arange(emb.shape[0], dtype=jnp.int32)[:, None]
    pad_row = jnp.zeros((emb.shape[1],), jnp.int8).at[4 * seq_len].set(-1)
    return jnp.where(rows < jnp.asarray(n_windows, jnp.int32).reshape(()),
                     emb, pad_row[None, :])


def embed_query_with_one(codes: jax.Array, seq_len: int) -> jax.Array:
    """uint8 [B, L] -> int8 [B, EP] rank-4 query embedding with a
    constant 1 in column 4L (pairs with embed_db_with_zc's zc column so
    dot = matches exactly)."""
    from smafa_tpu.ops import distance as D

    emb = D.expand_embed_query(codes, seq_len)
    assert emb.shape[1] > 4 * seq_len
    return emb.at[:, 4 * seq_len].set(jnp.int8(1))


def _min2_kernel(q_ref, db_ref, *refs, seq_len: int, shift: int,
                 tile_w: int, span: int, sub: int, with_count: bool):
    if with_count:
        lo_ref, hi_ref, cnt_ref, lo_acc, hi_acc, cnt_acc = refs
    else:
        lo_ref, hi_ref, lo_acc, hi_acc = refs
        cnt_ref = cnt_acc = None
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    blo = None
    bhi = None
    bcnt = None
    bdist = None
    sw = tile_w // sub
    for s in range(sub):  # unrolled sub-tiles keep the dist buffer at
        dot = jax.lax.dot_general(  # [TB, tile_w/sub] while halving the
            q_ref[...],             # grid-step count
            db_ref[pl.ds(s * sw, sw), :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dist = seq_len - dot  # zc column folded into the contraction

        # No validity mask: padding rows of the embed twin are poisoned
        # to dot == -1 (embed_db_with_zc), so their distance is already
        # the losing sentinel seq_len + 1. Keys are packed with SUB-TILE
        # local indices (grid-invariant iota — no per-step offset adds
        # in the hot loop); the winner's global offset is added after
        # the reduction, on [TB, 1], which is exact because the index
        # field never carries into the distance bits (gidx < 2**shift).
        shifted = dist << shift
        lidx = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        off = j * tile_w + s * sw
        mlo = jnp.min(shifted | lidx, axis=1, keepdims=True)
        slo = mlo + off
        shi = jnp.min(shifted | (sw - 1 - lidx), axis=1, keepdims=True) \
            + (span - sw - off)
        if not with_count:
            blo = slo if blo is None else jnp.minimum(blo, slo)
            bhi = shi if bhi is None else jnp.minimum(bhi, shi)
            continue
        # Fused tie count: windows at this sub-tile's min distance.
        # Padding rows sit at the sentinel distance seq_len + 1, which
        # never equals a real row minimum (n_windows >= 1 implies the
        # true min <= seq_len), so counts over poisoned rows are
        # discarded by the conditional merge below — except for shards
        # that are ENTIRELY padding, whose sentinel-distance count the
        # cross-shard merge drops the same way.
        sdist = mlo >> shift                       # [TB, 1]
        scnt = jnp.sum(
            (dist == sdist).astype(jnp.int32), axis=1, keepdims=True
        )
        if blo is None:
            blo, bhi, bcnt, bdist = slo, shi, scnt, sdist
        else:
            bcnt = jnp.where(
                sdist < bdist, scnt,
                jnp.where(sdist == bdist, bcnt + scnt, bcnt),
            )
            bdist = jnp.minimum(bdist, sdist)
            blo = jnp.minimum(blo, slo)
            bhi = jnp.minimum(bhi, shi)

    @pl.when(j == 0)
    def _():
        lo_acc[...] = blo
        hi_acc[...] = bhi
        if with_count:
            cnt_acc[...] = bcnt

    @pl.when(j > 0)
    def _():
        if with_count:
            # The grid offsets only touch the key's index bits, so the
            # accumulator's distance decodes exactly with one shift.
            old_dist = lo_acc[...] >> shift
            cnt_acc[...] = jnp.where(
                bdist < old_dist, bcnt,
                jnp.where(bdist == old_dist, cnt_acc[...] + bcnt,
                          cnt_acc[...]),
            )
        lo_acc[...] = jnp.minimum(lo_acc[...], blo)
        hi_acc[...] = jnp.minimum(hi_acc[...], bhi)

    @pl.when(j == nj - 1)
    def _():
        lo_ref[...] = lo_acc[...]
        hi_ref[...] = hi_acc[...]
        if with_count:
            cnt_ref[...] = cnt_acc[...]


# ---------------------------------------------------------------------------
# Round-5 compaction mask kernel: pack hit bits in VMEM.
#
# The XLA compaction pass runs ~13x below the scan because its bit-pack
# epilogue (the 32-wide word reduction, or the round-3 MXU matmul pack)
# lowers poorly: at 16384 x 1M the scan+threshold costs 76 ms but the
# pack adds ~360 ms per dispatch (docs/PERFORMANCE.md "Compaction cost
# anatomy"). This kernel fuses threshold-compare + bit pack into the
# matmul tile loop: the [TB, TW] bool hit matrix lives and dies in VMEM
# — only the packed [TB, TW/32] uint32 words reach HBM. The pack itself
# is MXU work: each 512-bit group contracts against a PLANE-MAJOR
# block-diagonal powers-of-two int8 matrix (5 seven-bit planes x 16
# words = 80 output columns; plane-major layout makes the shift-or
# combine read CONTIGUOUS 16-column slices, which Mosaic lowers — the
# word-major layout of distance._pack_weights would need strided column
# gathers). MXU cost: 128 MACs/hit-bit after N-tile padding = 0.5x the
# K=256 scan matmul; no carries, so the grid is fully parallel.
# Reference semantics: the hit set of lib.rs:261-292 / 306-313.

_PACK_GROUP = 512
_PACK_WPG = _PACK_GROUP // 32  # words per group
_PACK_PLANES = 5


def _pack_weights_planemajor(group: int = _PACK_GROUP):
    """[group, 5*group/32] int8: bit j of the group lands in word j//32,
    plane (j%32)//7, weight 1<<(j%32%7) — at PLANE-major column
    plane*(group/32) + word. Plane sums stay <= 127 so int8 x int8 ->
    int32 is exact (the same plane decomposition as
    distance._pack_weights, relaid for contiguous plane slices)."""
    import numpy as np

    wpg = group // 32
    w = np.zeros((group, _PACK_PLANES * wpg), np.int8)
    for j in range(group):
        word, bit = divmod(j, 32)
        plane, pos = divmod(bit, 7)
        w[j, plane * wpg + word] = np.int8(1 << pos)
    return w


def pick_compact_tiles(b_loc: int, shard_wp: int,
                       interpret: bool) -> tuple[int, int] | None:
    """(tile_b, tile_w) for compact_mask_pallas, or None when no
    supported tiling divides. tile_w must be a multiple of the 512-bit
    pack group AND — on the real Mosaic lowering — large enough that the
    [TB, TW/32] output block's lane dimension is a multiple of 128
    (TW >= 4096); interpret mode (CPU tests) has no layout constraint
    and accepts smaller shards."""
    tile_b = min(512, b_loc)
    if tile_b <= 0 or b_loc % tile_b:
        return None
    tws = (8192, 4096) if not interpret else (8192, 4096, 2048, 1024, 512)
    for tw in tws:
        if tw <= shard_wp and shard_wp % tw == 0:
            return tile_b, tw
    return None


def _compact_kernel(th_ref, q_ref, db_ref, w_ref, mask_ref, *,
                    seq_len: int, tile_w: int):
    dot = jax.lax.dot_general(
        q_ref[...], db_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dist = seq_len - dot  # poisoned padding rows decode to seq_len + 1
    hit = (dist <= th_ref[...]).astype(jnp.int8)  # th [TB, 1] broadcasts
    wpg = _PACK_WPG
    for g in range(tile_w // _PACK_GROUP):
        planes = jax.lax.dot_general(
            hit[:, g * _PACK_GROUP:(g + 1) * _PACK_GROUP], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.uint32)
        words = planes[:, 0:wpg]
        for p in range(1, _PACK_PLANES):
            words = words | (planes[:, p * wpg:(p + 1) * wpg]
                             << jnp.uint32(7 * p))
        mask_ref[:, g * wpg:(g + 1) * wpg] = words


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "tile_b", "tile_w", "interpret"),
)
def compact_mask_pallas(
    q_emb: jax.Array,      # int8 [Bp, EP] (embed_query_with_one)
    db_emb: jax.Array,     # int8 [Wp, EP] (embed_db_with_zc — poisoned pad)
    thresh: jax.Array,     # int32 [Bp]: inclusive cutoff, -1 disables row
    seq_len: int,
    tile_b: int = 512,
    tile_w: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """[Bp, Wp/32] uint32 hit mask (bit j of word w of row r = window
    32w+j has dist <= thresh[r]) — drop-in for the mask the XLA
    compact_scan builds, at MXU pack speed. Validity rides in the
    poisoned twin (padding rows sit at the sentinel distance seq_len+1,
    above every legal threshold), so the kernel takes no n_windows
    operand. Extraction stays the XLA rank search
    (distance.extract_mask_hits with chunk = Wp)."""
    bp, ep = q_emb.shape
    wp = db_emb.shape[0]
    grid = (bp // tile_b, wp // tile_w)
    wpt = tile_w // 32

    kernel = functools.partial(
        _compact_kernel, seq_len=seq_len, tile_w=tile_w
    )
    mask = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, ep), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, ep), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PACK_GROUP, _PACK_PLANES * _PACK_WPG),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, wpt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, wp // 32), jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * wp * (ep + 128),
            bytes_accessed=bp * ep + wp * ep * grid[0] + bp * wp // 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(thresh[:, None], q_emb, db_emb,
      jnp.asarray(_pack_weights_planemajor()))
    return mask


def compact_enabled_env() -> str:
    """SMAFA_TPU_PALLAS_COMPACT: '' auto, '0' off, '1' force,
    'interpret' force in Mosaic interpret mode (CPU tests)."""
    import os

    return os.environ.get("SMAFA_TPU_PALLAS_COMPACT", "")


def compact_eligible(seq_len: int, db_width: int, b_loc: int,
                     shard_rows: int, n_windows: int) -> bool:
    """Gate for shipping the Mosaic compaction mask. Same embed-twin
    preconditions as min2_eligible (codes-resident, active rank-4
    embedding with a spare zc column, affordable twin) plus the compact
    tiling; auto mode requires the span where the XLA pack epilogue
    actually dominates (>= 2^20 rows). Unlike min2 there is no batch
    floor — compaction sub-batches are small by construction."""
    from smafa_tpu.ops import distance as D

    v = compact_enabled_env()
    if v == "0":
        return False
    if not ((v == "interpret"
             or jax.devices()[0].platform not in ("cpu",))
            and db_width == seq_len
            and D.embed_active(seq_len) and seq_len <= 127
            and D.padded_embed_dim(seq_len) > 4 * seq_len
            and pick_compact_tiles(b_loc, shard_rows,
                                   v == "interpret") is not None):
        return False
    if v in ("1", "interpret"):
        return True
    if n_windows < (1 << 20):
        return False
    from smafa_tpu.parallel import select

    cap = select._hbm_capacity(per_device=True)
    return (cap is not None
            and shard_rows * D.padded_embed_dim(seq_len) <= cap // 4)


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "t_cap", "tile_b", "tile_w", "interpret"),
)
def compact_scan_pallas(
    q_emb: jax.Array,
    db_emb: jax.Array,
    thresh: jax.Array,
    index_offset: jax.Array,
    seq_len: int,
    t_cap: int,
    tile_b: int,
    tile_w: int,
    interpret: bool = False,
):
    """Mosaic-mask twin of distance.compact_scan: (rows, idx,
    row_counts, total) with identical ordering and sentinel
    conventions."""
    from smafa_tpu.ops import distance as D

    mask = compact_mask_pallas(
        q_emb, db_emb, thresh, seq_len, tile_b, tile_w, interpret
    )
    return D.extract_mask_hits(mask, index_offset, db_emb.shape[0], t_cap)


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "shift", "tile_b", "tile_w", "sub",
                     "interpret", "with_count"),
)
def min2_scan_pallas(
    q_emb: jax.Array,      # int8 [Bp, EP] (expand_embed_query + 1-column at 4L)
    db_emb: jax.Array,     # int8 [Wp, EP] (embed_db_with_zc — padding poisoned)
    seq_len: int,
    shift: int,
    tile_b: int = 1024,
    tile_w: int = 512,
    sub: int = 1,          # in-kernel sub-tiles per grid step
    interpret: bool = False,
    with_count: bool = True,
) -> tuple[jax.Array, ...]:
    """Dual packed min keys per row — drop-in twin of
    ops.distance.min2_scan (index_offset 0, span = Wp) over the
    pre-embedded db form, plus (with_count, the shipped default) the
    exact per-row count of windows at the min distance fused into the
    same pass — so best-hit mode (reference lib.rs:296-314: print ALL
    windows at the min) needs no separate tie-count dispatch. Validity
    rides in the twin itself (embed_db_with_zc poisons padding rows to
    the sentinel distance), so the kernel takes no n_windows operand.
    Returns (lo, hi[, cnt])."""
    bp, ep = q_emb.shape
    wp = db_emb.shape[0]
    grid = (bp // tile_b, wp // tile_w)
    n_out = 3 if with_count else 2

    kernel = functools.partial(
        _min2_kernel, seq_len=seq_len, shift=shift, tile_w=tile_w, span=wp,
        sub=sub, with_count=with_count,
    )
    col = pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, ep), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, ep), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[col] * n_out,
        out_shape=[jax.ShapeDtypeStruct((bp, 1), jnp.int32)] * n_out,
        scratch_shapes=[pltpu.VMEM((tile_b, 1), jnp.int32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * wp * ep,
            bytes_accessed=bp * ep + wp * ep * grid[0] + 8 * bp,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The default 16 MB scoped-vmem budget sat exactly at the
            # round-3 kernel's footprint; the fused count's extra
            # accumulators tipped it over (observed 16.26 MB at
            # (1024, 4096, sub=2)). v5e has 128 MB VMEM — raise the
            # scoped budget so the measured-best tiles keep compiling.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_emb, db_emb)

    return tuple(o[:, 0] for o in outs)
