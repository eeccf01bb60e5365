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
