"""Greedy clustering golden tests — ports of the reference's in-crate
cluster unit tests (reference cluster.rs:96-144), which are the regression
gates for tie/threshold behavior and duplicate handling."""

import io

import numpy as np

from smafa_tpu.engine.cluster import cluster


def run_cluster(path, max_div, **kw):
    buf = io.StringIO()
    cluster(path, max_div, out=buf, **kw)
    return buf.getvalue()


def test_simple():
    # reference cluster.rs:101-112
    assert run_cluster("tests/data/cluster_dummy1.fna", 1) == (
        "ATGC\tATGC\nATGG\tATGC\nAAAA\tAAAA\n"
    )


def test_bug1():
    # reference cluster.rs:114-125 (greedy tie/threshold regression)
    assert run_cluster("tests/data/cluster_bug1.fna", 2) == (
        "ATGCAAAAA\tATGCAAAAA\nATAAAAAAA\tATGCAAAAA\nTTAAAAAAA\tTTAAAAAAA\n"
    )


def test_best_hit_changes_bug():
    # reference cluster.rs:127-143: a duplicate input must be skipped
    # entirely (no output line), so identical sequences can never land in
    # different centroids.
    assert run_cluster("tests/data/cluster_best_hit_changes.fna", 2) == (
        "ATGCAAAAA\tATGCAAAAA\nATAAAAAAA\tATGCAAAAA\nTTAAAAAAA\tTTAAAAAAA\n"
    )


def test_batch_boundary_invariance():
    # The TPU engine batches an inherently sequential algorithm; output must
    # be identical for every batch size (intra-batch promotion resolution).
    ref = run_cluster("tests/data/cluster_best_hit_changes.fna", 2, batch_size=512)
    for bs in (1, 2, 3):
        assert run_cluster("tests/data/cluster_best_hit_changes.fna", 2, batch_size=bs) == ref


def _oracle_cluster(seqs, max_div):
    """Direct transliteration of the reference algorithm (cluster.rs:13-94)
    in numpy — the order-sequential oracle for randomized comparison."""
    centroids: list[np.ndarray] = []
    seen = set()
    out = []
    for seq in seqs:
        key = seq.tobytes()
        if key in seen:
            continue
        seen.add(key)
        if centroids:
            dists = [int(np.sum(seq != c)) for c in centroids]
            mind = min(dists)
        else:
            dists, mind = [], max_div * 2 + 2
        if mind <= max_div:
            assigned = dists.index(mind)
        else:
            assigned = len(centroids)
            centroids.append(seq)
        out.append((seq, assigned))
    return out


def test_randomized_against_oracle(tmp_path):
    rng = np.random.default_rng(123)
    n, L = 200, 12
    seqs = rng.integers(0, 4, size=(n, L))
    # inject duplicates
    seqs[50] = seqs[10]
    seqs[51] = seqs[10]
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    strings = ["".join(chr(alpha[c]) for c in row) for row in seqs]
    fa = tmp_path / "rand.fna"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(strings)))

    for max_div in (0, 2, 5):
        expected_pairs = _oracle_cluster([row for row in seqs], max_div)
        # reconstruct expected stdout: raw seq \t decoded centroid
        cent_strings = {}
        exp_lines = []
        for seq, cid in expected_pairs:
            if cid not in cent_strings:
                cent_strings.setdefault(cid, None)
        # decode centroids in promotion order
        cents = []
        for seq, cid in expected_pairs:
            if cid == len(cents):
                cents.append("".join(chr(alpha[c]) for c in seq))
            exp_lines.append(f"{''.join(chr(alpha[c]) for c in seq)}\t{cents[cid]}\n")
        expected = "".join(exp_lines)
        for bs in (7, 512):
            assert run_cluster(str(fa), max_div, batch_size=bs) == expected, (max_div, bs)
