"""Multi-host scan: db shards across processes, collectives over ICI+DCN.

The reference is one OS thread on one machine (SURVEY.md §2.2); this is
the scale-out the BASELINE.json multi-host config asks for (10M-row db on
a v5e-16, 2+ hosts). Design:

- ``initialize()`` wraps ``jax.distributed.initialize`` (NCCL/MPI-free:
  the only backend is XLA's own coordination service + compiled
  collectives).
- The db lives in the TPU-native format (io.native_format), which is
  row-sliceable with zero decode cost: each process memmaps ONLY the rows
  its local devices own, then assembles the global sharded array with
  ``jax.make_array_from_process_local_data`` — no host ever touches the
  full db.
- The scan is the same packed-key min2 shard_map as the single-host path;
  the ``pmin`` merge compiles to ICI collectives within a host and DCN
  between hosts. Results come back replicated so process 0 can emit the
  ordered TSV (output order contract: reference lib.rs:250, 261).

Every process must run the same program with the same query stream (the
standard SPMD contract); only process 0 writes output.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smafa_tpu.io import native_format
from smafa_tpu.ops import distance as D

logger = logging.getLogger("smafa")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the cross-host coordination service (idempotent).

    Must run before anything initializes the XLA backend — so no jax
    queries happen here before the initialize call itself.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e):
            raise
        logger.debug("distributed already initialized: %s", e)
    logger.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_emitter() -> bool:
    return jax.process_index() == 0


class MultiHostScanRunner:
    """Global-mesh db scan with per-process shard loading.

    The db tensor is sharded over the flat 'w' axis spanning every device
    of every process. Query batches are replicated (each process parses
    the same query stream, keeping global order without any gather).
    """

    def __init__(self, db_path: str | Path, chunk: int = 2048,
                 mesh: Mesh | None = None):
        from smafa_tpu.utils.platform import enable_compilation_cache

        enable_compilation_cache()
        header = native_format.read_header(db_path)
        self.n_windows = header["num_windows"]
        self.seq_len = max(1, header["length"] or 1)
        self.db_version = header["db_version"]
        self.length = header["length"]

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("w",))
        self.mesh = mesh
        n_dev = mesh.devices.size
        self.chunk = min(chunk, max(128, 1 << math.ceil(math.log2(max(1, self.n_windows)))))
        stride = self.chunk * n_dev
        self.wp = max(stride, ((self.n_windows + stride - 1) // stride) * stride)
        self.shard_rows = self.wp // n_dev
        self.shift = D.packing_shift(self.seq_len, self.wp)
        if self.shift is None:
            raise ValueError("db too large for 31-bit packed keys")

        # Rows owned by this process: devices are laid out in mesh order,
        # so a process's rows are contiguous iff its devices are contiguous
        # in the mesh (true for the standard device order).
        flat = list(mesh.devices.reshape(-1))
        local_ids = {d.id for d in jax.local_devices()}
        my_positions = [i for i, d in enumerate(flat) if d.id in local_ids]
        lo_row = min(my_positions) * self.shard_rows
        hi_row = (max(my_positions) + 1) * self.shard_rows

        local = self._load_rows(db_path, lo_row, hi_row)
        sharding = NamedSharding(mesh, P("w", None))
        codes_global = jax.make_array_from_process_local_data(sharding, local)
        self.db_oh = jax.jit(
            partial(D.expand_onehot, seq_len=self.seq_len), out_shardings=sharding
        )(codes_global)
        self.n_windows_dev = jnp.int32(self.n_windows)
        self._cache: dict[int, callable] = {}

    def _load_rows(self, db_path, lo: int, hi: int) -> np.ndarray:
        """Memmap-slice [lo, hi) of the db rows, zero-padded past the end."""
        n_real = max(0, min(hi, self.n_windows) - min(lo, self.n_windows))
        out = np.zeros((hi - lo, self.seq_len), dtype=np.uint8)
        if n_real:
            ws = native_format.load(db_path, rows=(lo, lo + n_real))
            out[:n_real] = ws.codes
        return out

    def _build(self, b: int):
        seq_len, chunk, shard_rows = self.seq_len, self.chunk, self.shard_rows
        shift, span = self.shift, self.wp

        def shard_fn(q_oh, db_shard, n_windows):
            off = jax.lax.axis_index("w").astype(jnp.int32) * shard_rows
            n_valid = jnp.clip(n_windows - off, 0, shard_rows)
            b_loc = q_oh.shape[0]
            lo, hi = D.min2_scan(
                q_oh, db_shard, n_valid, off,
                jnp.full((b_loc,), -1, jnp.int32),
                jnp.full((b_loc,), span, jnp.int32),
                seq_len, shift, chunk, span,
            )
            return jax.lax.pmin(lo, "w"), jax.lax.pmin(hi, "w")

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(), P("w", None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows):
            q_oh = D.expand_onehot(q_codes, seq_len)
            return mapped(q_oh, db_oh, n_windows)

        return run

    def min2(self, q_codes: np.ndarray):
        """(min dist, lowest-index argmin, unique flag) per row, replicated."""
        q_codes, nq, b = D.pad_batch(q_codes)
        fn = self._cache.get(b)
        if fn is None:
            fn = self._build(b)
            self._cache[b] = fn
        lo, hi = fn(q_codes, self.db_oh, self.n_windows_dev)
        lo = np.asarray(jax.device_get(lo))[:nq]
        hi = np.asarray(jax.device_get(hi))[:nq]
        return D.unpack_min2(lo, hi, self.shift, self.wp)
