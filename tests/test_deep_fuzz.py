"""Wider randomized parity sweep (a trimmed version of the dev-time
deep-fuzz harness): random L/alphabet/size/mode combinations against the
literal-transcription oracles from test_fuzz_parity."""

import io
import pathlib

import numpy as np
import pytest

from smafa_tpu.engine.cluster import cluster
from test_fuzz_parity import (
    _run_query, _write_fasta, oracle_cluster, oracle_query,
)


@pytest.mark.parametrize("seed", range(10, 20))
def test_random_configuration(tmp_path, seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(1, 80))
    nd = int(rng.integers(1, 120))
    nq = int(rng.integers(1, 60))
    alpha = int(rng.integers(2, 6))
    mk = lambda n: [
        "".join("ACGTN"[c] for c in rng.integers(0, alpha, L)) for _ in range(n)
    ]
    db, qs = mk(nd), mk(nq)
    for _ in range(nd // 3):
        db[int(rng.integers(0, nd))] = db[int(rng.integers(0, nd))]

    mode = seed % 3
    if mode == 0:
        kw = dict(max_divergence=[None, int(rng.integers(0, L + 1))][seed % 2])
    elif mode == 1:
        kw = dict(
            max_num_hits=int(rng.integers(1, 200)),
            max_divergence=[None, int(rng.integers(0, L + 1))][(seed // 3) % 2],
        )
    else:
        kw = dict(
            max_num_hits=int(rng.integers(2, 50)),
            limit_per_sequence=int(rng.integers(1, 5)),
        )
    assert _run_query(tmp_path, db, qs, **kw) == oracle_query(db, qs, **kw)

    f = tmp_path / "c.fna"
    _write_fasta(f, db)
    maxd = int(rng.integers(0, max(1, L)))
    buf = io.StringIO()
    cluster(f, maxd, out=buf, batch_size=int(rng.integers(1, 40)))
    assert buf.getvalue() == oracle_cluster(db, maxd)


@pytest.mark.parametrize("seed", range(20000, 20006))
def test_singlem_shaped_boundary(tmp_path, seed):
    """Mutation-cluster data at 60bp with divergence near the boundary —
    distances concentrate exactly at the cutoff, the tie-heaviest regime."""
    rng = np.random.default_rng(seed)
    L = 60
    n_pool = int(rng.integers(2, 12))
    pool = rng.integers(0, 4, size=(n_pool, L))

    def mk(n, maxmut):
        rows = pool[rng.integers(0, n_pool, n)].copy()
        for i in range(n):
            k = int(rng.integers(0, maxmut + 1))
            pos = rng.choice(L, size=k, replace=False)
            rows[i, pos] = rng.integers(0, 5, k)
        return ["".join("ACGTN"[c] for c in r) for r in rows]

    nd, nq = int(rng.integers(3, 150)), int(rng.integers(1, 50))
    db = mk(nd, int(rng.integers(0, 8)))
    qs = mk(nq, int(rng.integers(0, 8)))
    div = int(rng.integers(0, 9))
    mode = seed % 3
    if mode == 0:
        kw = dict(max_divergence=div)
    elif mode == 1:
        kw = dict(max_num_hits=int(rng.integers(2, 120)), max_divergence=div)
    else:
        kw = dict(max_num_hits=int(rng.integers(2, 40)),
                  limit_per_sequence=int(rng.integers(1, 4)))
    assert _run_query(tmp_path, db, qs, **kw) == oracle_query(db, qs, **kw)

    f = tmp_path / "c.fna"
    _write_fasta(f, db)
    buf = io.StringIO()
    cluster(f, div, out=buf, batch_size=int(rng.integers(1, 40)))
    assert buf.getvalue() == oracle_cluster(db, div)
