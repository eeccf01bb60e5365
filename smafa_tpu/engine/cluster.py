"""cluster op: greedy online clustering, byte-identical to the reference.

Reference algorithm (reference cluster.rs:13-94): stream records in order;
skip exact duplicates of the packed encoding (cluster.rs:46-48, no output
line); compute distances to all current centroids; assign to the
lowest-index centroid at the minimum distance if min <= max_divergence,
else promote the record to a new centroid; print
``{raw_input_seq}\t{decoded_centroid}`` per unique record.

The algorithm is order-sequential — each record's assignment depends on
centroids created by earlier records — so a TPU can't just vmap it.
The TPU formulation here batches the stream:

1. device: one int8 MXU matmul scans the whole batch against all existing
   centroids at once -> per-row (min distance, first argmin),
2. device: one [B, B] self-distance matmul for the batch,
3. host: a tiny O(B * promotions) sequential pass resolves intra-batch
   order dependencies exactly — a row promoted earlier in the batch can
   capture later rows via the self-distance matrix. New centroids always
   have higher indices than old ones, so a strict ``<`` comparison
   reproduces the reference's lowest-index tie rule (cluster.rs:62-68).

Centroids live on device in an amortized-doubling one-hot buffer; the
batch's promotions are appended with one dynamic_update_slice per batch.
"""

from __future__ import annotations

import logging
import math
import sys
import time
from functools import partial
from pathlib import Path
from typing import TextIO

import jax
import jax.numpy as jnp
import numpy as np

from smafa_tpu.core import alphabet
from smafa_tpu.core.windowset import WindowSet
from smafa_tpu.core.encoding import dedup_key
from smafa_tpu.io.fastx import read_encoded_batches
from smafa_tpu.ops import distance as D
from smafa_tpu.utils.profiling import StageTimers

logger = logging.getLogger("smafa")

DEFAULT_BATCH = 512


_bucket = D.bucket  # single bucketing policy (ops.distance)


@partial(jax.jit, static_argnames=("seq_len", "chunk"))
def _scan_batch_fused(q_codes, cent_oh, n_centroids, seq_len, chunk):
    """One program per batch: (min dist, argmin) vs centroids AND the
    batch's self-distance matrix (for intra-batch promotion capture)."""
    q_oh = D.expand_onehot(q_codes, seq_len)
    d, i = D.min_scan(q_oh, cent_oh, n_centroids, seq_len, chunk)
    self_d = D.pairwise_distances(q_oh, q_oh, seq_len)
    return d, i, self_d


def _build_sharded_scan(mesh, seq_len: int, chunk: int, shard_rows: int, span: int):
    """Centroid scan over a ('q','w') mesh: centroid rows sharded over 'w',
    packed keys pmin-merged — the cluster op's tensor-parallel axis
    (centroid tensor distances merged via collectives). Queries stay
    replicated; the batch self-distance matmul is computed redundantly on
    each device (it is tiny relative to the centroid scan)."""
    from jax.sharding import PartitionSpec as P

    shift = D.packing_shift(seq_len, span)

    def shard_fn(q_oh, cent_shard, n_centroids):
        off = jax.lax.axis_index("w").astype(jnp.int32) * shard_rows
        n_valid = jnp.clip(n_centroids - off, 0, shard_rows)
        b_loc = q_oh.shape[0]
        lo, _ = D.min2_scan(
            q_oh, cent_shard, n_valid, off,
            jnp.full((b_loc,), -1, jnp.int32),
            jnp.full((b_loc,), span, jnp.int32),
            seq_len, shift, chunk, span,
        )
        lo = jax.lax.pmin(lo, "w")
        big = jnp.int32(2**31 - 1)
        d = jnp.where(lo == big, jnp.int32(2**30), lo >> shift)
        i = jnp.where(lo == big, big, lo & ((1 << shift) - 1))
        return d, i

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("w", None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(q_codes, cent_oh, n_centroids):
        q_oh = D.expand_onehot(q_codes, seq_len)
        d, i = mapped(q_oh, cent_oh, n_centroids)
        self_d = D.pairwise_distances(q_oh, q_oh, seq_len)
        return d, i, self_d

    return run


@partial(jax.jit, static_argnames=("seq_len",))
def _self_distances(q_codes, seq_len):
    q_oh = D.expand_onehot(q_codes, seq_len)
    return D.pairwise_distances(q_oh, q_oh, seq_len)


@partial(jax.jit, static_argnames=("seq_len",))
def _append_rows(cent_oh, new_codes, at, seq_len):
    new_oh = D.expand_onehot(new_codes, seq_len)
    return jax.lax.dynamic_update_slice_in_dim(cent_oh, new_oh, at, axis=0)


class _CentroidStore:
    """Host WindowSet mirror + growable device one-hot buffer."""

    def __init__(self, seq_len: int):
        from smafa_tpu.parallel import sharded
        from smafa_tpu.utils.platform import enable_compilation_cache

        enable_compilation_cache()
        self.seq_len = seq_len
        self.ws = WindowSet(version=0)  # version unused, reference cluster.rs:22
        self.decoded: list[str] = []
        # Generous initial capacity: each doubling changes the device
        # buffer shape and forces a recompile, which costs far more than
        # the few MB of one-hot int8 it saves.
        self.cap = 16384
        self.chunk = 1024
        # Shard the centroid tensor over the 'w' mesh axis in multi-host
        # runs, or when tests force sharding; single-process runs keep
        # the simpler single-device program (centroid scans are small —
        # the host-side sequential assignment pass dominates — so the
        # collective path is for multi-host and validation). The packed-
        # key scan merges with a pmin collective, like the query db scan.
        self.mesh = None
        if sharded._force_shard() or jax.process_count() > 1:
            self.mesh = sharded.build_mesh()
            if self.mesh.devices.size == 1:
                self.mesh = None
        self._scan_cache: dict[tuple, callable] = {}
        lp = D.padded_feature_dim(seq_len)
        if self.mesh is not None and D.packing_shift(seq_len, self.cap * 64) is None:
            # The sharded scan needs packed 31-bit keys with growth
            # headroom; absurdly long sequences fall back to the
            # single-device path (which has a pair-carry fallback).
            self.mesh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_w = self.mesh.devices.shape[1]
            # Capacity must split evenly into chunk-sized scan steps per
            # shard (stride = chunk * n_w), for any device count.
            self._stride = self.chunk * n_w
            self.cap = ((self.cap + self._stride - 1) // self._stride) * self._stride
            self._buf_sharding = NamedSharding(self.mesh, P("w", None))
            self.buf = jax.device_put(
                np.zeros((self.cap, lp), dtype=np.int8), self._buf_sharding
            )
        else:
            self._stride = 1
            self._buf_sharding = None
            self.buf = jnp.zeros((self.cap, lp), dtype=jnp.int8)

    def __len__(self) -> int:
        return len(self.ws)

    def append(self, codes_rows: np.ndarray) -> None:
        n0 = len(self.ws)
        k = codes_rows.shape[0]
        if n0 + k > self.cap:
            while self.cap < n0 + k:
                self.cap *= 2
            self.cap = ((self.cap + self._stride - 1) // self._stride) * self._stride
            if self.mesh is not None and D.packing_shift(self.seq_len, self.cap) is None:
                # Growth outran the 31-bit key budget: drop to the
                # single-device pair-carry path (the buffer is being
                # rebuilt anyway, so resharding is free here).
                self.mesh = None
                self._buf_sharding = None
                self._stride = 1
            all_codes = np.zeros((self.cap, self.seq_len), dtype=np.uint8)
            all_codes[:n0] = self.ws.codes
            all_codes[n0 : n0 + k] = codes_rows
            expand = jax.jit(
                partial(D.expand_onehot, seq_len=self.seq_len),
                out_shardings=self._buf_sharding,
            )
            self.buf = expand(all_codes)
        else:
            self.buf = _append_rows(self.buf, codes_rows, n0, self.seq_len)
        self.ws.push_batch(codes_rows)
        flat = alphabet.DECODE_BYTES[codes_rows].tobytes().decode("ascii")
        L = self.seq_len
        self.decoded.extend(flat[i * L : (i + 1) * L] for i in range(k))

    def scan_batch(self, q_codes: np.ndarray):
        """(min dist, argmin vs centroids, self-distance matrix) per batch."""
        nq = q_codes.shape[0]
        b = _bucket(nq)
        if nq < b:
            q_codes = np.pad(q_codes, [(0, b - nq), (0, 0)])
        if self.mesh is not None:
            n_w = self.mesh.devices.shape[1]
            key = (b, self.cap)
            fn = self._scan_cache.get(key)
            if fn is None:
                fn = _build_sharded_scan(
                    self.mesh, self.seq_len, min(self.chunk, self.cap // n_w),
                    self.cap // n_w, self.cap,
                )
                self._scan_cache[key] = fn
            d, i, self_d = fn(q_codes, self.buf, jnp.int32(len(self.ws)))
        else:
            d, i, self_d = _scan_batch_fused(
                q_codes, self.buf, jnp.int32(len(self.ws)), self.seq_len,
                min(self.chunk, self.cap),
            )
        return (
            np.asarray(d)[:nq], np.asarray(i)[:nq],
            np.asarray(self_d)[:nq, :nq],
        )


def cluster(
    input_fasta: str | Path,
    max_divergence: int,
    out: TextIO | None = None,
    batch_size: int = DEFAULT_BATCH,
) -> None:
    out = out if out is not None else sys.stdout
    t0 = time.time()
    max_div = int(max_divergence)
    seen: set[bytes] = set()
    store: _CentroidStore | None = None

    if not Path(input_fasta).exists():
        # Reference panic text on open failure (cluster.rs:28).
        raise ValueError(f"valid path/file of input fasta: {input_fasta}")
    logger.info("Clustering ..")
    timers = StageTimers()
    query_number = 0
    for ids, raws, codes in read_encoded_batches(input_fasta, batch_size=batch_size):
        query_number += len(ids)
        # exact-duplicate skip, in input order (reference cluster.rs:46-48)
        with timers.stage("dedup"):
            keep: list[int] = []
            for j in range(len(ids)):
                key = dedup_key(codes[j])
                if key not in seen:
                    seen.add(key)
                    keep.append(j)
        if not keep:
            continue
        codes_u = codes[keep]
        raws_u = [raws[j] for j in keep]
        seq_len = codes_u.shape[1]

        if store is None:
            store = _CentroidStore(seq_len)
        else:
            store.ws.check_query_length(seq_len)

        timers.count("comparisons", len(keep) * len(store))
        with timers.stage("scan+assign"):
            _process_batch(store, codes_u, raws_u, max_div, out)
    timers.log_report(logging.DEBUG)

    n_centroids = len(store) if store is not None else 0
    logger.info(
        "Clustering complete, took %d seconds. Clustered %d sequences into %d clusters.",
        int(time.time() - t0), query_number, n_centroids,
    )


def _process_batch(store, codes_u, raws_u, max_div, out):
    nb = codes_u.shape[0]
    n_old = len(store)
    if n_old:
        old_d, old_i, self_d = store.scan_batch(codes_u)
    else:
        old_d = old_i = None
        self_d = np.asarray(_self_distances(codes_u, store.seq_len)) if nb > 1 else None

    sentinel = max_div * 2 + 2  # reference cluster.rs:54-58
    promoted: list[tuple[int, int]] = []  # (batch_row, centroid_idx)
    assigned: list[int] = []
    for j in range(nb):
        if old_d is not None:
            best_d, best_i = int(old_d[j]), int(old_i[j])
        else:
            best_d, best_i = sentinel, 0
        for j2, cidx in promoted:
            d = int(self_d[j, j2])
            if d < best_d:  # strict: older (lower-index) centroids win ties
                best_d, best_i = d, cidx
        if best_d <= max_div:
            assigned.append(best_i)
        else:
            cidx = n_old + len(promoted)
            promoted.append((j, cidx))
            assigned.append(cidx)

    if promoted:
        store.append(codes_u[[j for j, _ in promoted]])
    lines = []
    for j in range(nb):
        raw = raws_u[j].decode("utf-8")
        lines.append(f"{raw}\t{store.decoded[assigned[j]]}\n")
    out.write("".join(lines))
