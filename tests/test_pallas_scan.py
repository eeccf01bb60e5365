"""Pallas fused min/count scan: parity vs the pure-JAX oracle.

On CPU the kernel runs in interpreter mode; on TPU it compiles via Mosaic.
The oracle is ops.distance.pairwise_distances (itself golden-tested against
the reference semantics in test_encoding/test_cmdline_golden).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smafa_tpu.ops import distance as D
from smafa_tpu.ops import pallas_scan as P

INTERPRET = jax.default_backend() != "tpu"


def _run(db, q, seq_len, tb=8, tw=128):
    W, B = db.shape[0], q.shape[0]
    db_oh = np.asarray(D.expand_onehot(db, seq_len))
    q_oh = np.asarray(D.expand_onehot(q, seq_len))
    bp = ((B + tb - 1) // tb) * tb
    wp = ((W + tw - 1) // tw) * tw
    q_p = np.pad(q_oh, [(0, bp - B), (0, 0)])
    db_p = np.pad(db_oh, [(0, wp - W), (0, 0)])
    shift = P.packing_shift(seq_len, wp)
    assert shift is not None
    d, i, c = P.min_count_scan(
        jnp.asarray(q_p), jnp.asarray(db_p), jnp.asarray([W], jnp.int32),
        seq_len, shift, tb, tw, interpret=INTERPRET,
    )
    return np.asarray(d)[:B], np.asarray(i)[:B], np.asarray(c)[:B]


@pytest.mark.parametrize("seq_len,W,B,seed", [(60, 300, 70, 0), (13, 97, 33, 1), (3, 5, 9, 2)])
def test_min_count_parity(seq_len, W, B, seed):
    rng = np.random.default_rng(seed)
    db = rng.integers(0, 5, size=(W, seq_len)).astype(np.uint8)
    q = rng.integers(0, 5, size=(B, seq_len)).astype(np.uint8)
    # force exact matches and duplicate windows (tie + count coverage)
    k = min(5, W, B)
    q[:k] = db[:k]
    if W > 3:
        db[W - 1] = db[0]
        db[W - 2] = db[0]

    d, i, c = _run(db, q, seq_len)
    full = np.asarray(
        D.pairwise_distances(D.expand_onehot(q, seq_len), D.expand_onehot(db, seq_len), seq_len)
    )
    od = full.min(axis=1)
    oi = full.argmin(axis=1)  # np.argmin returns first (lowest) index — the reference tie rule
    oc = (full == od[:, None]).sum(axis=1)
    assert np.array_equal(d, od)
    assert np.array_equal(i, oi)
    assert np.array_equal(c, oc)


def test_packing_shift_limits():
    assert P.packing_shift(60, 1 << 20) is not None
    assert P.packing_shift(60, 16 << 20) is not None  # 10M+ windows
    assert P.packing_shift(2**26, 1 << 20) is None  # absurd length overflows


def test_min2_scan_pallas_parity():
    """Round-3 dual-key Mosaic kernel (interpret mode) equals the XLA
    min2_scan keys exactly, padding rows included."""
    import jax.numpy as jnp
    from smafa_tpu.ops import pallas_scan as PS

    rng = np.random.default_rng(5)
    L, wp, b = 60, 1024, 64
    nw = 1000  # 24 padding rows in the last tile
    db = rng.integers(0, 5, size=(wp, L), dtype=np.uint8)
    db[:nw][rng.integers(0, nw, 30)] = db[7]  # tie material
    q = rng.integers(0, 5, size=(b, L), dtype=np.uint8)
    q[:3] = db[7]
    shift = D.packing_shift(L, wp)

    lo_x, hi_x = D.min2_scan(
        D.expand_query(q, L, L), jnp.asarray(db), jnp.int32(nw),
        jnp.int32(0), L, shift, 256, wp,
    )
    lo_p, hi_p, cnt_p = PS.min2_scan_pallas(
        PS.embed_query_with_one(jnp.asarray(q), L),
        PS.embed_db_with_zc(jnp.asarray(db), L, nw),
        L, shift,
        tile_b=32, tile_w=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(lo_p), np.asarray(lo_x))
    np.testing.assert_array_equal(np.asarray(hi_p), np.asarray(hi_x))
    # fused tie count vs the dense oracle (valid windows only)
    full = np.asarray(D.pairwise_distances(
        D.expand_onehot(q, L), D.expand_onehot(db[:nw], L), L))
    oc = (full == full.min(axis=1, keepdims=True)).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(cnt_p), oc)
    # with_count=False keeps the two-output legacy form
    lo2, hi2 = PS.min2_scan_pallas(
        PS.embed_query_with_one(jnp.asarray(q), L),
        PS.embed_db_with_zc(jnp.asarray(db), L, nw),
        L, shift, tile_b=32, tile_w=256, interpret=True, with_count=False,
    )
    np.testing.assert_array_equal(np.asarray(lo2), np.asarray(lo_x))
    np.testing.assert_array_equal(np.asarray(hi2), np.asarray(hi_x))


def test_min2_scan_pallas_subtiled_parity():
    """The in-kernel sub-tile variant (tile_w split into sub dots) must
    equal both the sub=1 kernel and the XLA keys exactly."""
    import jax.numpy as jnp
    from smafa_tpu.ops import pallas_scan as PS

    rng = np.random.default_rng(6)
    L, wp, b = 60, 2048, 32
    nw = 2000
    db = rng.integers(0, 5, size=(wp, L), dtype=np.uint8)
    db[:nw][rng.integers(0, nw, 60)] = db[11]
    q = rng.integers(0, 5, size=(b, L), dtype=np.uint8)
    q[:2] = db[11]
    shift = D.packing_shift(L, wp)
    qe = PS.embed_query_with_one(jnp.asarray(q), L)
    de = PS.embed_db_with_zc(jnp.asarray(db), L, nw)
    a = PS.min2_scan_pallas(qe, de, L, shift, tile_b=32, tile_w=512,
                            sub=2, interpret=True)
    c = PS.min2_scan_pallas(qe, de, L, shift, tile_b=32, tile_w=512,
                            sub=1, interpret=True)
    x = D.min2_scan(D.expand_query(q, L, L), jnp.asarray(db), jnp.int32(nw),
                    jnp.int32(0), L, shift, 256, wp)
    for g, w in zip(a, c):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    for g, w in zip(a[:2], x):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    full = np.asarray(D.pairwise_distances(
        D.expand_onehot(q, L), D.expand_onehot(db[:nw], L), L))
    oc = (full == full.min(axis=1, keepdims=True)).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(a[2]), oc)
