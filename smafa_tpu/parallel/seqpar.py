"""Sequence-parallel scan: the window COLUMN axis sharded across devices.

SingleM windows are short (60 bp), but the framework supports arbitrary
uniform lengths; for very long windows a single device may not hold the
one-hot db (or the MXU tile becomes contraction-bound). This runner
shards the feature axis (L*5 one-hot columns) over a 'c' mesh axis: each
device computes a partial match count over its column slice, a ``psum``
over 'c' reassembles exact distances, and the packed-key min reduction
runs replicated — the Hamming-distance analogue of sequence parallelism
(SURVEY.md §2.2 SP row; partial sums combine exactly because the dot
product is linear over column blocks).

Composable with row sharding in principle (a ('w','c') mesh); kept as a
dedicated runner because the two axes optimize different regimes (many
windows vs long windows).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smafa_tpu.ops import distance as D

BIG_KEY = 2**31 - 1


def build_col_mesh(n: int | None = None) -> Mesh:
    devices = np.array(jax.devices())
    n = n or len(devices)
    return Mesh(devices[:n], ("c",))


class ColumnShardedScanRunner:
    """Db resident with its one-hot feature axis sharded over 'c'."""

    def __init__(self, codes: np.ndarray, seq_len: int, mesh: Mesh | None = None,
                 chunk: int | None = None):
        self.seq_len = max(1, seq_len)
        self.n_windows = int(codes.shape[0])
        self.mesh = mesh if mesh is not None else build_col_mesh()
        self.n_c = self.mesh.devices.shape[0]
        self.chunk = chunk or 1024

        padded = max(self.chunk, ((self.n_windows + self.chunk - 1) // self.chunk) * self.chunk)
        self.wp = padded
        self.shift = D.packing_shift(self.seq_len, padded)
        if self.shift is None:
            raise ValueError("seq_len x rows overflow packed 31-bit keys")

        codes_p = codes
        if codes_p.shape[0] < padded:
            codes_p = np.pad(codes_p, [(0, padded - codes_p.shape[0]), (0, 0)])

        # One-hot feature dim padded so it splits evenly over 'c' in
        # 128-lane multiples; zero pad columns are distance-neutral.
        lp = D.padded_feature_dim(self.seq_len)
        lane_groups = lp // D.LANE
        groups_per_dev = (lane_groups + self.n_c - 1) // self.n_c
        self.lp_sharded = groups_per_dev * self.n_c * D.LANE

        spec = NamedSharding(self.mesh, P(None, "c"))

        @partial(jax.jit, out_shardings=spec)
        def expand(c):
            oh = D.expand_onehot(c, self.seq_len)
            return jnp.pad(oh, [(0, 0), (0, self.lp_sharded - oh.shape[1])])

        self.db_oh = expand(jax.device_put(codes_p))
        self._expand_q = expand
        self.n_windows_dev = jnp.int32(self.n_windows)
        self._cache: dict[int, callable] = {}

    def _bounded_min2(self, q_oh, db_sh, n_windows, lo_b=None, hi_b=None):
        """Dual packed-key minima over the per-row open index interval,
        with distances psum-reassembled from column-slice partial matches.
        The single scan body behind min2 (_build, bounds None -> no mask
        cost) and tie collection (_build_collect, narrowing bounds)."""
        seq_len, chunk, shift, span = self.seq_len, self.chunk, self.shift, self.wp
        n_chunks = span // chunk
        b_loc = q_oh.shape[0]

        def step(carry, off):
            lo_c, hi_c = carry
            block = jax.lax.dynamic_slice_in_dim(db_sh, off, chunk, axis=0)
            part = jax.lax.dot_general(
                q_oh, block,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            dist = seq_len - jax.lax.psum(part, "c")
            lidx = off + jnp.arange(chunk, dtype=jnp.int32)
            valid = (lidx < n_windows)[None, :]
            if lo_b is not None:
                valid = valid & (lidx[None, :] > lo_b[:, None])
            if hi_b is not None:
                valid = valid & (lidx[None, :] < hi_b[:, None])
            shifted = dist << shift
            key_lo = jnp.where(valid, shifted | lidx[None, :], BIG_KEY)
            key_hi = jnp.where(valid, shifted | (span - 1 - lidx)[None, :], BIG_KEY)
            return (
                jnp.minimum(lo_c, jnp.min(key_lo, axis=1)),
                jnp.minimum(hi_c, jnp.min(key_hi, axis=1)),
            ), None

        init = (
            jnp.full((b_loc,), BIG_KEY, jnp.int32),
            jnp.full((b_loc,), BIG_KEY, jnp.int32),
        )
        offs = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        (lo, hi), _ = jax.lax.scan(step, init, offs)
        return lo, hi

    def _build(self, b: int):
        span = self.wp

        def shard_fn(q_oh, db_sh, n_windows):
            return self._bounded_min2(q_oh, db_sh, n_windows)

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(None, "c"), P(None, "c"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows):
            q_oh = self._expand_q(q_codes)
            return mapped(q_oh, db_oh, n_windows)

        return run

    def _build_collect(self, b: int):
        shift, span = self.shift, self.wp

        def shard_fn(q_oh, db_sh, n_windows):
            b_loc = q_oh.shape[0]

            def scan_bounds(lo_b, hi_b):
                return self._bounded_min2(q_oh, db_sh, n_windows, lo_b, hi_b)

            # All 'c' devices hold every query row and see identical
            # psum-merged values, so the loop condition is naturally
            # agreed — no cond_reduce needed.
            return D.collect_loop(scan_bounds, b_loc, span, shift, D.TIE_CAP)

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(None, "c"), P(None, "c"), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows):
            q_oh = self._expand_q(q_codes)
            return mapped(q_oh, db_oh, n_windows)

        return run

    def collect_ties(self, q_codes: np.ndarray):
        """(min distance, ALL minimum-distance indices ascending) per row —
        ScanRunner.collect_ties contract on the column-sharded layout.
        Rows overflowing TIE_CAP raise (use ScanRunner)."""
        q_codes, nq, b = D.pad_batch(q_codes, minimum=8)
        key = ("collect", b)
        fn = self._cache.get(key)
        if fn is None:
            fn = self._build_collect(b)
            self._cache[key] = fn
        dist, tbuf, count, overflow = fn(q_codes, self.db_oh, self.n_windows_dev)
        dist = np.asarray(dist)[:nq]
        tbuf = np.asarray(tbuf)[:nq]
        count = np.asarray(count)[:nq]
        if bool(np.asarray(overflow)[:nq].any()):
            raise ValueError(f"row exceeds {D.TIE_CAP} ties; use ScanRunner")
        srt = np.sort(np.where(tbuf >= 0, tbuf, np.int32(2**31 - 1)), axis=1)
        return dist, [srt[r, : count[r]].tolist() for r in range(nq)]

    def _build_kmode(self, b: int, cap: int | None):
        """cap None -> phase-1 (cutoff stats); else phase-2 enumeration.
        Distances come from psum-merged partial matches; since every 'c'
        device holds all rows and identical merged values, the enumeration
        while_loop condition is naturally agreed."""
        seq_len, chunk, shift, span = self.seq_len, self.chunk, self.shift, self.wp
        n_chunks = span // chunk

        def shard_fn(q_oh, db_sh, n_windows, *extra):
            b_loc = q_oh.shape[0]

            def dist_chunk(off):
                block = jax.lax.dynamic_slice_in_dim(db_sh, off, chunk, axis=0)
                part = jax.lax.dot_general(
                    q_oh, block,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return seq_len - jax.lax.psum(part, "c")

            offs = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

            if cap is None:
                k, maxdiv = extra

                def scan_stats(t):
                    t = jnp.broadcast_to(t, (b_loc,))

                    def step(carry, off):
                        dist = dist_chunk(off)
                        lidx = off + jnp.arange(chunk, dtype=jnp.int32)
                        return D.stats_chunk_update(
                            carry, dist, lidx, n_windows, t
                        ), None

                    init = (
                        jnp.zeros((b_loc,), jnp.int32),
                        jnp.full((b_loc,), -1, jnp.int32),
                    )
                    (cnt, mx), _ = jax.lax.scan(step, init, offs)
                    return cnt, mx

                return D.kmode_phase1(scan_stats, k, maxdiv, n_windows, seq_len)

            eff, hits = extra

            def region_scan(e, lo_k, hi_k):
                big = jnp.int32(2**31 - 1)

                def step(carry, off):
                    dist = dist_chunk(off)
                    lidx = off + jnp.arange(chunk, dtype=jnp.int32)
                    return D.region_chunk_update(
                        carry, dist, lidx, n_windows, e, lo_k, hi_k,
                        seq_len, shift, span,
                    ), None

                init = (
                    jnp.full((b_loc,), big, jnp.int32),
                    jnp.full((b_loc,), big, jnp.int32),
                )
                (m1, mr), _ = jax.lax.scan(step, init, offs)
                return m1, mr

            return D.kmode_enumerate(
                region_scan, b_loc, eff, hits, shift, seq_len, span, cap
            )

        in_specs = (P(None, "c"), P(None, "c"), P(), P(), P())
        out_specs = (P(), P()) if cap is None else P()
        mapped = jax.shard_map(
            shard_fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows, *extra):
            q_oh = self._expand_q(q_codes)
            return mapped(q_oh, db_oh, n_windows, *extra)

        return run

    def kmode(self, q_codes: np.ndarray, k: int, max_divergence: int | None):
        """Exact K-mode hit lists on the column-sharded layout —
        ScanRunner.kmode result contract; None for degenerate hit sets."""
        q_codes, nq, b = D.pad_batch(q_codes, minimum=8)
        maxdiv = self.seq_len + 1 if max_divergence is None else max_divergence
        skey = ("kstats", b)
        sfn = self._cache.get(skey)
        if sfn is None:
            sfn = self._build_kmode(b, None)
            self._cache[skey] = sfn
        eff, hits = sfn(
            q_codes, self.db_oh, self.n_windows_dev,
            jnp.int32(k), jnp.int32(maxdiv),
        )
        hits_all = np.array(hits)  # writable copy
        hits_all[nq:] = 0  # padded rows must not drive enumeration passes
        hits_h = hits_all[:nq]
        max_hits = int(hits_h.max(initial=0))
        if max_hits == 0:
            return np.empty((nq, 0), np.int32), np.empty((nq, 0), np.int32), hits_h
        if max_hits > 4096:
            return None
        cap = D.bucket(max_hits)
        ekey = ("kenum", b, cap)
        efn = self._cache.get(ekey)
        if efn is None:
            efn = self._build_kmode(b, cap)
            self._cache[ekey] = efn
        buf = np.asarray(efn(q_codes, self.db_oh, self.n_windows_dev, eff,
                             jnp.asarray(hits_all)))
        dists, idxs = D.unpack_key(buf[:nq], self.shift)
        return dists, idxs, hits_h

    def min2(self, q_codes: np.ndarray):
        q_codes, nq, b = D.pad_batch(q_codes, minimum=8)
        fn = self._cache.get(b)
        if fn is None:
            fn = self._build(b)
            self._cache[b] = fn
        lo, hi = fn(q_codes, self.db_oh, self.n_windows_dev)
        return D.unpack_min2(np.asarray(lo)[:nq], np.asarray(hi)[:nq], self.shift, self.wp)
