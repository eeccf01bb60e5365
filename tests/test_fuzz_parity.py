"""Randomized parity: engine output vs a direct Python oracle.

The oracle re-implements the reference semantics literally (reference
lib.rs:198-325 query, cluster.rs:13-94 cluster) in plain Python over
small random inputs crafted to hit the tricky paths: cutoff ties
exceeding K, limit-per-sequence run resets, best-hit multi-ties, dup
inputs in cluster. Any divergence between engine and oracle is a
correctness bug regardless of the checked-in golden fixtures.
"""

import io

import numpy as np
import pytest

from smafa_tpu.core.alphabet import BYTE_LUT, DECODE_BYTES
from smafa_tpu.core.windowset import WindowSet
from smafa_tpu.engine.cluster import cluster
from smafa_tpu.engine.query import query
from smafa_tpu.io import postcard

BASES = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _rand_seqs(rng, n, L, alphabet=4):
    """Small alphabet -> lots of distance ties."""
    return ["".join("ACGTN"[c] for c in rng.integers(0, alphabet, L)) for _ in range(n)]


def _write_fasta(path, seqs):
    path.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))


def _dist(a: str, b: str) -> int:
    ea = BYTE_LUT[np.frombuffer(a.encode(), np.uint8)]
    eb = BYTE_LUT[np.frombuffer(b.encode(), np.uint8)]
    return int((ea != eb).sum())


def _decode(s: str) -> str:
    return DECODE_BYTES[BYTE_LUT[np.frombuffer(s.encode(), np.uint8)]].tobytes().decode()


def oracle_query(db_seqs, q_seqs, max_divergence=None, max_num_hits=None,
                 limit_per_sequence=None):
    """Literal transcription of reference query (lib.rs:198-325)."""
    out = []
    k_mode = max_num_hits if (max_num_hits is not None and max_num_hits != 1) else None
    for qnum, q in enumerate(q_seqs):
        dists = [_dist(q, s) for s in db_seqs]
        if k_mode is not None:
            pairs = sorted((d, i) for i, d in enumerate(dists))
            if k_mode > len(pairs):
                cutoff = max(dists)
            else:
                cutoff = pairs[k_mode - 1][0]
            last_seq = None  # (decoded, count) consecutive-run state
            for d, i in pairs:
                if d > cutoff:
                    break
                if max_divergence is not None and d > max_divergence:
                    continue
                s = _decode(db_seqs[i])
                if limit_per_sequence is not None:
                    if last_seq is not None and last_seq[0] == s:
                        if last_seq[1] >= limit_per_sequence:
                            continue
                        last_seq = (s, last_seq[1] + 1)
                    else:
                        last_seq = (s, 1)
                out.append(f"{qnum}\t{i}\t{d}\t{s}")
        else:
            mind = min(dists)
            if max_divergence is not None and mind > max_divergence:
                continue
            for i, d in enumerate(dists):
                if d == mind:
                    out.append(f"{qnum}\t{i}\t{d}\t{_decode(db_seqs[i])}")
    return "".join(line + "\n" for line in out)


def oracle_cluster(seqs, max_divergence):
    """Literal transcription of reference cluster (cluster.rs:13-94)."""
    out = []
    centroids: list[str] = []
    seen: set[str] = set()
    for s in seqs:
        enc = _decode(s)  # encoding-equivalence key (same as packed u64 key)
        if enc in seen:
            continue
        seen.add(enc)
        dists = [_dist(s, c) for c in centroids]
        mind = min(dists) if dists else max_divergence * 2 + 2
        if mind <= max_divergence:
            cidx = dists.index(mind)
        else:
            centroids.append(s)
            cidx = len(centroids) - 1
        out.append(f"{s}\t{_decode(centroids[cidx])}")
    return "".join(line + "\n" for line in out)


def _run_query(tmp_path, db_seqs, q_seqs, **kw):
    dbf = tmp_path / "d.fna"
    qf = tmp_path / "q.fna"
    _write_fasta(dbf, db_seqs)
    _write_fasta(qf, q_seqs)
    ws = WindowSet(version=2)
    for s in db_seqs:
        ws.push(BYTE_LUT[np.frombuffer(s.encode(), np.uint8)])
    dbp = tmp_path / "db"
    dbp.write_bytes(postcard.dumps(ws))
    buf = io.StringIO()
    query(dbp, qf, out=buf, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("seed", range(6))
def test_query_best_hit_fuzz(tmp_path, seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(3, 20))
    db = _rand_seqs(rng, int(rng.integers(1, 40)), L, alphabet=3)
    qs = _rand_seqs(rng, int(rng.integers(1, 30)), L, alphabet=3)
    max_div = [None, int(rng.integers(0, L))][seed % 2]
    got = _run_query(tmp_path, db, qs, max_divergence=max_div)
    assert got == oracle_query(db, qs, max_divergence=max_div)


@pytest.mark.parametrize("seed", range(6))
def test_query_kmode_fuzz(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    L = int(rng.integers(3, 16))
    db = _rand_seqs(rng, int(rng.integers(2, 50)), L, alphabet=2)  # heavy ties
    qs = _rand_seqs(rng, int(rng.integers(1, 20)), L, alphabet=2)
    k = int(rng.integers(2, 60))
    max_div = [None, int(rng.integers(0, L))][seed % 2]
    lim = [None, int(rng.integers(1, 4))][(seed // 2) % 2]
    got = _run_query(
        tmp_path, db, qs, max_num_hits=k, max_divergence=max_div,
        limit_per_sequence=lim,
    )
    assert got == oracle_query(
        db, qs, max_num_hits=k, max_divergence=max_div, limit_per_sequence=lim
    )


@pytest.mark.parametrize("seed", range(6))
def test_cluster_fuzz(tmp_path, seed):
    rng = np.random.default_rng(200 + seed)
    L = int(rng.integers(3, 20))
    n = int(rng.integers(2, 80))
    seqs = _rand_seqs(rng, n, L, alphabet=3)
    # inject duplicates and encoding-equivalent variants
    for _ in range(n // 4):
        seqs[int(rng.integers(0, n))] = seqs[int(rng.integers(0, n))]
    max_div = int(rng.integers(0, max(1, L // 2)))
    f = tmp_path / "in.fna"
    _write_fasta(f, seqs)
    buf = io.StringIO()
    cluster(f, max_div, out=buf, batch_size=int(rng.integers(2, 17)))
    assert buf.getvalue() == oracle_cluster(seqs, max_div)


def test_query_kmode_degenerate_equivalence(tmp_path):
    # R/Y/W etc. and '-' all encode as N: distances must reflect that and
    # decoded output must print N (reference lib.rs:171-180, 113-134).
    db = ["ACGTRW", "ACGT--", "ACGTAA"]
    qs = ["ACGTNN", "acgtaa"]
    got = _run_query(tmp_path, db, qs, max_num_hits=5)
    assert got == oracle_query(db, qs, max_num_hits=5)
    assert "ACGTNN" in got  # degenerates normalized in output
