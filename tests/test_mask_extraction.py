"""Unit tests for the bitmask-compaction rank extraction (ops.distance).

The extraction locates the t-th set bit of a [B, W/32] hit mask via a
rank cumsum that SATURATES at CUM_SAT instead of overflowing int32 (a
dispatch can carry more than 2^31 possible hit bits; jax x64 is
disabled). These tests pin the saturating cumsum against an int64
oracle — including forced saturation, which no realistically-sized
in-test mask could trigger through the public entry point — and the
bit-position arithmetic of extract_mask_hits against a numpy
enumeration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smafa_tpu.ops import distance as D


def _oracle(pcw: np.ndarray):
    cum = np.minimum(np.cumsum(pcw.reshape(-1).astype(np.int64)), D.CUM_SAT)
    return cum.astype(np.int32), pcw.sum(axis=1).astype(np.int32)


@pytest.mark.parametrize("b,w32,hi", [
    (1, 1, 31),          # degenerate single word
    (7, 33, 2**18),      # large synthetic counts, total below the clamp
    (64, 128, 400_000),  # expected total ~1.6e9: tail crosses CUM_SAT
    (16, 50, 32),        # realistic popcount range, no saturation
    (1 << 12, 8, 90_000),  # many rows; total ~1.4e9 saturates mid-matrix
])
def test_saturating_cumsum_matches_int64_oracle(b, w32, hi):
    # Synthetic per-word counts stand in for popcounts; they respect the
    # construction's only requirement (any one segment's internal cumsum
    # stays inside int32 — guaranteed for real masks by popcount <= 32).
    rng = np.random.default_rng(b * 1000003 + w32)
    pcw = rng.integers(0, hi + 1, size=(b, w32)).astype(np.int32)
    assert pcw.sum(dtype=np.int64) < 2**31
    got_cum, got_rc = D._saturating_word_cumsum(jnp.asarray(pcw))
    exp_cum, exp_rc = _oracle(pcw)
    np.testing.assert_array_equal(np.asarray(got_cum), exp_cum)
    np.testing.assert_array_equal(np.asarray(got_rc), exp_rc)


def test_saturating_cumsum_multi_segment_carries(monkeypatch):
    # Shrink the segment length so a small matrix exercises many
    # sequential carry steps, including carries already at the clamp.
    monkeypatch.setattr(D, "_CUM_SEG", 16)
    rng = np.random.default_rng(99)
    pcw = rng.integers(0, 1 << 26, size=(24, 40)).astype(np.int32)
    got_cum, got_rc = D._saturating_word_cumsum(jnp.asarray(pcw))
    exp_cum, exp_rc = _oracle(pcw)
    np.testing.assert_array_equal(np.asarray(got_cum), exp_cum)
    np.testing.assert_array_equal(np.asarray(got_rc), exp_rc)
    assert exp_cum[-1] == D.CUM_SAT  # really crossed the clamp
    # realistic popcounts over many tiny segments, no saturation
    pcw = rng.integers(0, 33, size=(9, 37)).astype(np.int32)
    got_cum, _ = D._saturating_word_cumsum(jnp.asarray(pcw))
    np.testing.assert_array_equal(np.asarray(got_cum), _oracle(pcw)[0])


def test_saturating_cumsum_exact_then_clamped_boundary():
    # One row's counts step the running total right across CUM_SAT:
    # every prefix below the clamp must stay exact, everything after
    # must clamp, and the result must stay monotone.
    b, w32 = 4, 16
    pcw = np.full((b, w32), (D.CUM_SAT // (b * w32 - 8)) + 1, np.int32)
    got_cum, _ = D._saturating_word_cumsum(jnp.asarray(pcw))
    got = np.asarray(got_cum)
    exp, _ = _oracle(pcw)
    np.testing.assert_array_equal(got, exp)
    assert (np.diff(got) >= 0).all()
    assert got[-1] == D.CUM_SAT and got[0] < D.CUM_SAT


def _enumerate_mask(mask: np.ndarray, chunk: int):
    """(row, window) pairs of set bits in extract_mask_hits' coordinate
    system, in (row, window) ascending order."""
    b, w32 = mask.shape
    wpc = D.mask_words_per_chunk(chunk)
    out = []
    for r in range(b):
        for w in range(w32):
            word = int(mask[r, w])
            for j in range(32):
                if (word >> j) & 1:
                    out.append((r, (w // wpc) * chunk + (w % wpc) * 32 + j))
    return out


@pytest.mark.parametrize("pattern", ["dense", "sparse", "striped"])
def test_extract_mask_hits_matches_enumeration(pattern):
    rng = np.random.default_rng(hash(pattern) % 2**31)
    b, chunk, n_chunks = 6, 96, 5          # wpc = 3, w32 = 15
    w32 = D.mask_words_per_chunk(chunk) * n_chunks
    if pattern == "dense":
        mask = np.full((b, w32), 0xFFFFFFFF, np.uint32)
    elif pattern == "sparse":
        mask = (rng.random((b, w32)) < 0.1).astype(np.uint32) << rng.integers(
            0, 32, size=(b, w32), dtype=np.uint32
        )
    else:
        mask = np.where(np.arange(w32)[None, :] % 2 == 0, 0xAAAAAAAA, 0
                        ).astype(np.uint32) * (np.arange(b)[:, None] % 2)
    expected = _enumerate_mask(mask, chunk)
    t_cap = len(expected) + 7 or 8
    rows, idx, rc, total = D.extract_mask_hits(
        jnp.asarray(mask), jnp.int32(0), chunk, t_cap
    )
    rows, idx = np.asarray(rows), np.asarray(idx)
    assert int(total) == len(expected)
    got = [(int(r), int(i)) for r, i in zip(rows, idx) if r >= 0]
    assert got == expected
    exp_rc = np.bincount([r for r, _ in expected], minlength=b)
    np.testing.assert_array_equal(np.asarray(rc), exp_rc)


def test_extract_mask_hits_undersized_cap_counts_stay_exact():
    b, chunk = 3, 64
    w32 = D.mask_words_per_chunk(chunk) * 4
    mask = np.full((b, w32), 0xFFFFFFFF, np.uint32)
    t_cap = 16  # far fewer slots than the b*w32*32 set bits
    rows, idx, rc, total = D.extract_mask_hits(
        jnp.asarray(mask), jnp.int32(100), chunk, t_cap
    )
    assert int(total) == b * w32 * 32
    np.testing.assert_array_equal(np.asarray(rc), np.full(b, w32 * 32))
    # The t_cap buffered hits are the FIRST t_cap in (row, window) order,
    # offset by index_offset.
    np.testing.assert_array_equal(np.asarray(rows), np.zeros(t_cap))
    np.testing.assert_array_equal(np.asarray(idx), 100 + np.arange(t_cap))


def test_mask_row_cap_bounds():
    from smafa_tpu.parallel.hitops import MASK_WORDS_BUDGET, mask_row_cap

    for span in (1, 31, 32, 1024, 1 << 20, 10_000_000, (1 << 26) * 31):
        cap = mask_row_cap(span)
        assert cap & (cap - 1) == 0          # power of two
        assert 16 <= cap <= 1 << 15          # exactness proof's row bound
        if 32 * 16 <= span and MASK_WORDS_BUDGET // (span // 32) >= 16:
            assert cap * (span // 32) <= MASK_WORDS_BUDGET
        # (spans so huge that even the 16-row floor exceeds the budget
        # are segmented along the db axis by the runner instead)


def test_block_distances_codes_equals_onehot():
    # The shared scan step accepts the db as one-hot or raw codes
    # (expanded per chunk); both forms must produce identical distances.
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    L, W, chunk = 13, 64, 16
    codes = rng.integers(0, 5, size=(W, L)).astype(np.uint8)
    q = rng.integers(0, 5, size=(6, L)).astype(np.uint8)
    q_oh = D.expand_onehot(q, L)
    db_oh = D.expand_onehot(codes, L)
    for off in (0, 16, 48):
        a = D.block_distances(q_oh, db_oh, jnp.int32(off), chunk, L)
        b = D.block_distances(q_oh, jnp.asarray(codes), jnp.int32(off), chunk, L)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kmode_phase1_multiprobe_oracle():
    """Round-5 multi-probe cutoff search vs a dense oracle across the
    reference rule's edges: K beyond the window count (cutoff = row
    max), maxdiv below/at/above the Kth distance, K=1, tiny windows."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for seq_len, w, b in ((60, 700, 40), (9, 64, 16), (1, 8, 8), (3, 5, 8)):
        codes = rng.integers(0, 5, (w, seq_len)).astype(np.uint8)
        q = rng.integers(0, 5, (b, seq_len)).astype(np.uint8)
        q[0] = codes[0]  # exact hit row
        dist = seq_len - (q[:, None, :] == codes[None, :, :]).sum(axis=2)
        chunk = 32 if w >= 32 else w
        wp = -(-w // chunk) * chunk
        codes_p = np.zeros((wp, seq_len), np.uint8)
        codes_p[:w] = codes
        q_oh = D.expand_onehot(q, seq_len)
        db_oh = D.expand_onehot(codes_p, seq_len)
        for k in (1, 2, 5, w, w + 3):
            for maxdiv in (None, 0, 1, seq_len // 2, seq_len, seq_len + 4):
                md = seq_len + 1 if maxdiv is None else maxdiv
                eff, hits = D.kmode_stats_scan(
                    q_oh, db_oh, jnp.int32(w), jnp.int32(k), jnp.int32(md),
                    seq_len, chunk,
                )
                eff = np.asarray(eff)
                hits = np.asarray(hits)
                # oracle (reference lib.rs:253-265)
                srt = np.sort(dist, axis=1)
                kth = (srt[:, min(k, w) - 1] if k <= w
                       else dist.max(axis=1))
                want_eff = np.minimum(kth, md)
                want_hits = (dist <= want_eff[:, None]).sum(axis=1)
                np.testing.assert_array_equal(eff, want_eff, err_msg=f"{seq_len},{k},{maxdiv}")
                np.testing.assert_array_equal(hits, want_hits, err_msg=f"{seq_len},{k},{maxdiv}")
