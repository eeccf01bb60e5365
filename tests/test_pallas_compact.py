"""Mosaic compaction mask kernel (ops.pallas_scan.compact_mask_pallas):
threshold-compare + MXU bit pack fused into the matmul tile loop, the
bool hit matrix never leaving VMEM. Exactness contract: bit-identical
masks to the dense oracle, and byte-identical K-mode / best-hit results
through the runner versus the XLA compact path (reference hit-set
semantics lib.rs:261-292, 306-313).
"""

from __future__ import annotations

import numpy as np
import pytest

from smafa_tpu.parallel.sharded import ScanRunner, build_mesh

L = 60


def _mk(rng, w, n_q, ragged=False):
    real_w = w - 37 if ragged else w
    codes = rng.integers(0, 3, (real_w, L)).astype(np.uint8)
    nd = real_w // 4
    codes[nd : 2 * nd] = codes[:nd]
    q = codes[rng.integers(0, real_w, n_q)].copy()
    mut = rng.random(q.shape) < 0.05
    q[mut] = rng.integers(0, 5, int(mut.sum())).astype(np.uint8)
    return codes, q


def test_mask_kernel_exact_vs_dense_oracle():
    import jax.numpy as jnp

    from smafa_tpu.ops import pallas_scan as PS

    rng = np.random.default_rng(0)
    codes, q = _mk(rng, 2048, 128)
    q_emb = PS.embed_query_with_one(jnp.asarray(q), L)
    db_emb = PS.embed_db_with_zc(jnp.asarray(codes), L, codes.shape[0])
    thresh = rng.integers(0, 6, 128).astype(np.int32)
    thresh[5] = -1   # disabled row
    thresh[7] = 0    # exact-match-only row
    mask = np.asarray(PS.compact_mask_pallas(
        q_emb, db_emb, jnp.asarray(thresh), L,
        tile_b=128, tile_w=512, interpret=True,
    ))
    dist = L - (q[:, None, :] == codes[None, :, :]).sum(axis=2)
    hit = dist <= thresh[:, None]
    w32 = codes.shape[0] // 32
    want = np.zeros((128, w32), np.uint32)
    for w in range(w32):
        for j in range(32):
            want[:, w] |= hit[:, 32 * w + j].astype(np.uint32) << np.uint32(j)
    np.testing.assert_array_equal(mask, want)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (1, 4), (2, 2)])
@pytest.mark.parametrize("ragged", [False, True])
def test_compact_runner_parity(monkeypatch, mesh_shape, ragged):
    """K-mode and best-hit through the runner: Mosaic mask vs XLA mask,
    byte-identical — including ragged row counts (poisoned twin padding)
    and sharded meshes."""
    rng = np.random.default_rng(1 + int(ragged))
    codes, q = _mk(rng, 4096, 96, ragged=ragged)
    monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", "0")
    ref = ScanRunner(codes, L, mesh=build_mesh(1, 1))
    want_k = ref.kmode_flat(q, 7, 4)
    want_k99 = ref.kmode_flat(q, 99, None)
    want_b = ref.best_hit(q, None)
    monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", "interpret")
    r = ScanRunner(codes, L, mesh=build_mesh(*mesh_shape))
    assert r._pallas_compact_eligible(16)
    for got, want in ((r.kmode_flat(q, 7, 4), want_k),
                      (r.kmode_flat(q, 99, None), want_k99),
                      (r.best_hit(q, None), want_b)):
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compactd_fused_distances_parity(monkeypatch):
    """K-mode via the fused-distance compaction (packed (dist,idx) keys,
    rows reconstructed from counts) must equal the separate
    compact + host-distance path bit for bit — XLA and Mosaic masks."""
    rng = np.random.default_rng(5)
    codes, q = _mk(rng, 4096, 96)
    for env in ("0", "interpret"):
        monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", env)
        r = ScanRunner(codes, L, mesh=build_mesh(1, 1))
        assert r._compactd_supported()
        got = r.kmode_flat(q, 13, 8)
        r2 = ScanRunner(codes, L, mesh=build_mesh(1, 1))
        monkeypatch.setattr(type(r2), "_compactd_supported", lambda self: False)
        want = r2.kmode_flat(q, 13, 8)
        monkeypatch.undo()
        monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", env)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_pallas_with_onewave(monkeypatch):
    """Both round-5 kernels together: one-wave phase A + Mosaic
    compaction for the heavy tail."""
    monkeypatch.setenv("SMAFA_TPU_ONEWAVE", "1")
    monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", "interpret")
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, (128, L)).astype(np.uint8)
    codes = np.concatenate([base] * 16, axis=0)  # heavy ties everywhere
    q = base[rng.integers(0, 128, 64)].copy()
    monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", "0")
    monkeypatch.setenv("SMAFA_TPU_ONEWAVE", "0")
    ref = ScanRunner(codes, L, mesh=build_mesh(1, 1))
    want = ref.best_hit(q, None)
    monkeypatch.setenv("SMAFA_TPU_ONEWAVE", "1")
    monkeypatch.setenv("SMAFA_TPU_PALLAS_COMPACT", "interpret")
    r = ScanRunner(codes, L, mesh=build_mesh(1, 1))
    got = r.best_hit(q, None)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
