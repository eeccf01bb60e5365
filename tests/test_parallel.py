"""Sharded + ring scan parity on the 8-device CPU mesh.

Determinism-across-shardings is this framework's replacement for the
reference's (nonexistent) race detection (SURVEY.md §5): the same inputs
must produce identical results on every mesh shape and schedule.
"""

import numpy as np
import pytest

from smafa_tpu.ops import distance as D
from smafa_tpu.parallel import ring, sharded


def _problem(seed=0, W=700, B=53, L=60):
    rng = np.random.default_rng(seed)
    db = rng.integers(0, 5, size=(W, L)).astype(np.uint8)
    q = rng.integers(0, 5, size=(B, L)).astype(np.uint8)
    k = min(7, W, B)
    q[:k] = db[:k]  # exact hits
    if W > 4:
        db[W - 1] = db[3]  # duplicate window -> tie
        db[W - 2] = db[3]
    return db, q, L


def _oracle(db, q, L):
    full = np.asarray(
        D.pairwise_distances(D.expand_onehot(q, L), D.expand_onehot(db, L), L)
    )
    return full


@pytest.mark.parametrize("nq,nw", [(1, 1), (1, 8), (2, 4), (8, 1)])
def test_scanrunner_min2_matches_oracle(nq, nw):
    db, q, L = _problem()
    mesh = sharded.build_mesh(nq, nw)
    runner = sharded.ScanRunner(db, L, mesh=mesh, chunk=64)
    d, i, u = runner.min2(q)
    full = _oracle(db, q, L)
    assert np.array_equal(d, full.min(axis=1))
    assert np.array_equal(i, full.argmin(axis=1))
    ties = (full == full.min(axis=1)[:, None]).sum(axis=1)
    assert np.array_equal(u, ties == 1)


@pytest.mark.parametrize("n", [1, 2, 8])
def test_ring_min2_matches_oracle(n):
    db, q, L = _problem(seed=1)
    runner = ring.RingScanRunner(db, L, mesh=ring.build_ring_mesh(n), chunk=64)
    d, i, u = runner.min2(q)
    full = _oracle(db, q, L)
    assert np.array_equal(d, full.min(axis=1))
    assert np.array_equal(i, full.argmin(axis=1))
    ties = (full == full.min(axis=1)[:, None]).sum(axis=1)
    assert np.array_equal(u, ties == 1)


@pytest.mark.parametrize("nq,nw", [(1, 8), (4, 2)])
def test_scanrunner_topm_matches_oracle(nq, nw):
    db, q, L = _problem(seed=2, W=300, B=40)
    mesh = sharded.build_mesh(nq, nw)
    runner = sharded.ScanRunner(db, L, mesh=mesh, chunk=64)
    d, i, mx = runner.topm(q, 10)
    full = _oracle(db, q, L)
    order = np.lexsort((np.arange(full.shape[1])[None, :].repeat(len(q), 0), full), axis=1)
    sorted_d = np.take_along_axis(full, order, axis=1)
    m = d.shape[1]
    assert np.array_equal(d[:, : min(m, 10)], sorted_d[:, : min(m, 10)])
    assert np.array_equal(i[:, : min(m, 10)], order[:, : min(m, 10)])
    assert np.array_equal(mx, full.max(axis=1))


@pytest.mark.parametrize("nq,nw", [(1, 1), (2, 4)])
@pytest.mark.parametrize("dup", [1, 2, 7, 40, 100])
def test_collect_ties_matches_oracle(nq, nw, dup):
    # db built from `dup` copies of a small pool -> every query has `dup`
    # (or more) ties at the min; exercises the multi-pass range-masked
    # extraction loop deeply.
    rng = np.random.default_rng(dup)
    L, pool_n, B = 24, 30, 17
    pool = rng.integers(0, 4, size=(pool_n, L)).astype(np.uint8)
    order = rng.permutation(pool_n * dup)
    db = np.repeat(pool, dup, axis=0)[order]
    q = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    q[:6] = pool[:6]
    runner = sharded.ScanRunner(db, L, mesh=sharded.build_mesh(nq, nw), chunk=64)
    d, ties = runner.collect_ties(q)
    full = _oracle(db, q, L)
    assert np.array_equal(d, full.min(axis=1))
    for r in range(B):
        expect = np.nonzero(full[r] == full[r].min())[0].tolist()
        assert ties[r] == expect, (r, ties[r], expect)


@pytest.mark.parametrize("n", [1, 2, 8])
@pytest.mark.parametrize("dup", [1, 5])
def test_ring_collect_ties_matches_oracle(n, dup):
    rng = np.random.default_rng(dup * 10 + n)
    L, pool_n, B = 20, 40, 13
    pool = rng.integers(0, 4, size=(pool_n, L)).astype(np.uint8)
    db = np.repeat(pool, dup, axis=0)[rng.permutation(pool_n * dup)]
    q = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    q[:4] = pool[:4]
    runner = ring.RingScanRunner(db, L, mesh=ring.build_ring_mesh(n), chunk=64)
    d, ties = runner.collect_ties(q)
    full = _oracle(db, q, L)
    assert np.array_equal(d, full.min(axis=1))
    for r in range(B):
        assert ties[r] == np.nonzero(full[r] == full[r].min())[0].tolist()


@pytest.mark.parametrize("n", [1, 2, 8])
@pytest.mark.parametrize("k,maxdiv", [(5, None), (99, 8), (3, 0)])
def test_ring_kmode_matches_oracle(n, k, maxdiv):
    rng = np.random.default_rng(n * 7 + k)
    W, B, L = 300, 11, 24
    db = rng.integers(0, 3, size=(W, L)).astype(np.uint8)  # heavy ties
    q = rng.integers(0, 3, size=(B, L)).astype(np.uint8)
    runner = ring.RingScanRunner(db, L, mesh=ring.build_ring_mesh(n), chunk=64)
    d, i, hits = runner.kmode(q, k, maxdiv)
    full = _oracle(db, q, L)
    for r in range(B):
        srt = np.sort(full[r])
        cutoff = full[r].max() if k > W else srt[min(k, W) - 1]
        eff = cutoff if maxdiv is None else min(cutoff, maxdiv)
        pairs = sorted((int(full[r, w]), w) for w in range(W) if full[r, w] <= eff)
        assert hits[r] == len(pairs)
        assert d[r, : hits[r]].tolist() == [p[0] for p in pairs]
        assert i[r, : hits[r]].tolist() == [p[1] for p in pairs]


@pytest.mark.parametrize("n", [1, 4, 8])
def test_column_sharded_min2_matches_oracle(n):
    # Long windows: the one-hot feature axis shards over 'c'; psum of
    # partial match counts must reproduce exact distances.
    from smafa_tpu.parallel import seqpar

    db, q, L = _problem(seed=4, W=150, B=21, L=700)
    runner = seqpar.ColumnShardedScanRunner(
        db, L, mesh=seqpar.build_col_mesh(n), chunk=64
    )
    d, i, u = runner.min2(q)
    full = _oracle(db, q, L)
    assert np.array_equal(d, full.min(axis=1))
    assert np.array_equal(i, full.argmin(axis=1))
    ties = (full == full.min(axis=1)[:, None]).sum(axis=1)
    assert np.array_equal(u, ties == 1)


@pytest.mark.parametrize("n", [1, 8])
def test_column_sharded_collect_ties_matches_oracle(n):
    from smafa_tpu.parallel import seqpar

    rng = np.random.default_rng(n)
    W, B, L = 120, 9, 300
    pool = rng.integers(0, 4, size=(40, L)).astype(np.uint8)
    db = np.repeat(pool, 3, axis=0)[rng.permutation(120)]
    q = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    q[:3] = pool[:3]
    runner = seqpar.ColumnShardedScanRunner(
        db, L, mesh=seqpar.build_col_mesh(n), chunk=64
    )
    d, ties = runner.collect_ties(q)
    full = _oracle(db, q, L)
    assert np.array_equal(d, full.min(axis=1))
    for r in range(B):
        assert ties[r] == np.nonzero(full[r] == full[r].min())[0].tolist()


@pytest.mark.parametrize("n", [1, 8])
@pytest.mark.parametrize("k,maxdiv", [(5, None), (40, 125)])
def test_column_sharded_kmode_matches_oracle(n, k, maxdiv):
    from smafa_tpu.parallel import seqpar

    rng = np.random.default_rng(n * 3 + k)
    W, B, L = 150, 7, 200
    db = rng.integers(0, 3, size=(W, L)).astype(np.uint8)
    q = rng.integers(0, 3, size=(B, L)).astype(np.uint8)
    runner = seqpar.ColumnShardedScanRunner(
        db, L, mesh=seqpar.build_col_mesh(n), chunk=64
    )
    d, i, hits = runner.kmode(q, k, maxdiv)
    full = _oracle(db, q, L)
    for r in range(B):
        srt = np.sort(full[r])
        cutoff = full[r].max() if k > W else srt[min(k, W) - 1]
        eff = cutoff if maxdiv is None else min(cutoff, maxdiv)
        pairs = sorted((int(full[r, w]), w) for w in range(W) if full[r, w] <= eff)
        assert hits[r] == len(pairs)
        assert d[r, : hits[r]].tolist() == [p[0] for p in pairs]
        assert i[r, : hits[r]].tolist() == [p[1] for p in pairs]


def test_short_sequences_and_tiny_db():
    # L=3, W=2 (the tests/data scale) through the sharded machinery
    db, q, L = _problem(seed=3, W=2, B=5, L=3)
    for mesh in [sharded.build_mesh(1, 1), sharded.build_mesh(1, 8)]:
        runner = sharded.ScanRunner(db, L, mesh=mesh, chunk=16)
        d, i, u = runner.min2(q)
        full = _oracle(db, q, L)
        assert np.array_equal(d, full.min(axis=1))
        assert np.array_equal(i, full.argmin(axis=1))
