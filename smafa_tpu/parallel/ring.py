"""Ring-scheduled scan: db shards rotate around the device ring.

The ('q', 'w') ScanRunner (parallel.sharded) keeps queries replicated
within a q-group and all-gathers candidate lists over 'w'. This module is
the other canonical TPU topology (SURVEY.md §2.2 "ring/blockwise"):
BOTH the query batch and the db rows are sharded over one flat 'd' axis,
and every step each device scans its resident query block against the db
shard it currently holds, then forwards that shard to its ring neighbor
with ``lax.ppermute`` (ICI neighbor traffic only — the db is never
all-gathered and no device ever holds more than 1/n of it). After n steps
every query block has met every db row. Running packed-key minima are the
only cross-step state, so the accumulator is O(B/n) per device.

This is the layout for dbs at the 10M-row scale (BASELINE.json multi-host
config) where per-device HBM cannot hold a replicated db and candidate
all-gathers would ride DCN. It is the Hamming-scan analogue of ring
attention: rotate the KV (db) blocks, keep running reductions instead of
softmax accumulators.
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


def build_ring_mesh(n: int | None = None) -> Mesh:
    devices = np.array(jax.devices())
    n = n or len(devices)
    return Mesh(devices[:n], ("d",))


class RingScanRunner:
    """Db resident sharded over a 1-D ring; queries sharded over the same axis."""

    def __init__(self, codes: np.ndarray, seq_len: int, mesh: Mesh | None = None,
                 chunk: int | None = None):
        from smafa_tpu.utils.platform import enable_compilation_cache

        enable_compilation_cache()
        self.seq_len = max(1, seq_len)
        self.n_windows = int(codes.shape[0])
        self.mesh = mesh if mesh is not None else build_ring_mesh()
        self.n_d = self.mesh.devices.shape[0]
        self.chunk = chunk or 1024

        stride = self.chunk * self.n_d
        padded = max(stride, ((self.n_windows + stride - 1) // stride) * stride)
        self.wp = padded
        self.shard_rows = padded // self.n_d
        self.shift = D.packing_shift(self.seq_len, padded)
        if self.shift is None:
            raise ValueError(
                f"Ring scan requires (seq_len={seq_len}, rows={padded}) to fit "
                "packed 31-bit keys; use parallel.sharded.ScanRunner instead"
            )

        codes_p = codes
        if codes_p.shape[0] < padded:
            codes_p = np.pad(codes_p, [(0, padded - codes_p.shape[0]), (0, 0)])
        db_spec = NamedSharding(self.mesh, P("d", None))
        codes_dev = jax.device_put(codes_p, db_spec)
        self.db_oh = jax.jit(
            partial(D.expand_onehot, seq_len=self.seq_len), out_shardings=db_spec
        )(codes_dev)
        self.n_windows_dev = jnp.int32(self.n_windows)
        self._cache: dict[int, callable] = {}

    def _build(self, b: int):
        seq_len = self.seq_len
        chunk = self.chunk
        shard_rows = self.shard_rows
        shift = self.shift
        span = self.wp
        n_d = self.n_d
        fwd = [(j, (j + 1) % n_d) for j in range(n_d)]

        def shard_fn(q_oh, db_shard, n_windows):
            me = jax.lax.axis_index("d").astype(jnp.int32)

            def body(i, carry):
                lo, hi, db_cur = carry
                # After i forward rotations, we hold the shard originally
                # owned by (me - i) mod n.
                owner = (me - i) % n_d
                off = owner * shard_rows
                n_valid = jnp.clip(n_windows - off, 0, shard_rows)
                b_loc = q_oh.shape[0]
                l2, h2 = D.min2_scan(
                    q_oh, db_cur, n_valid, off,
                    jnp.full((b_loc,), -1, jnp.int32),
                    jnp.full((b_loc,), span, jnp.int32),
                    seq_len, shift, chunk, span,
                )
                lo = jnp.minimum(lo, l2)
                hi = jnp.minimum(hi, h2)
                db_nxt = jax.lax.cond(
                    i < n_d - 1,  # final rotation would be wasted ICI traffic
                    lambda x: jax.lax.ppermute(x, "d", fwd),
                    lambda x: x,
                    db_cur,
                )
                return lo, hi, db_nxt

            b_loc = q_oh.shape[0]
            init = (
                jnp.full((b_loc,), BIG_KEY, dtype=jnp.int32),
                jnp.full((b_loc,), BIG_KEY, dtype=jnp.int32),
                db_shard,
            )
            lo, hi, _ = jax.lax.fori_loop(0, n_d, body, init)
            return lo, hi

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P("d", None), P("d", None), P()),
            out_specs=(P("d"), P("d")),
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows):
            q_oh = D.expand_onehot(q_codes, seq_len)
            return mapped(q_oh, db_oh, n_windows)

        return run

    def _build_collect(self, b: int):
        seq_len = self.seq_len
        chunk = self.chunk
        shard_rows = self.shard_rows
        shift = self.shift
        span = self.wp
        n_d = self.n_d
        fwd = [(j, (j + 1) % n_d) for j in range(n_d)]

        def shard_fn(q_oh, db_shard, n_windows):
            me = jax.lax.axis_index("d").astype(jnp.int32)
            b_loc = q_oh.shape[0]

            def scan_bounds(lo_b, hi_b):
                # One FULL ring sweep (db returns to its home shard after
                # n_d rotations), merging bounded dual keys along the way.
                def body(i, carry):
                    lo, hi, db_cur = carry
                    owner = (me - i) % n_d
                    off = owner * shard_rows
                    n_valid = jnp.clip(n_windows - off, 0, shard_rows)
                    l2, h2 = D.min2_scan(
                        q_oh, db_cur, n_valid, off, lo_b, hi_b,
                        seq_len, shift, chunk, span,
                    )
                    db_nxt = jax.lax.cond(
                        i < n_d - 1,  # final rotation's result is discarded
                        lambda x: jax.lax.ppermute(x, "d", fwd),
                        lambda x: x, db_cur,
                    )
                    return jnp.minimum(lo, l2), jnp.minimum(hi, h2), db_nxt

                init = (
                    jnp.full((b_loc,), BIG_KEY, jnp.int32),
                    jnp.full((b_loc,), BIG_KEY, jnp.int32),
                    db_shard,
                )
                lo, hi, _ = jax.lax.fori_loop(0, n_d, body, init)
                return lo, hi

            def cond_reduce(local_any):
                # The sweep's ppermute spans every ring device, so all of
                # them must agree on the trip count.
                return jax.lax.pmax(local_any.astype(jnp.int32), "d") > 0

            return D.collect_loop(
                scan_bounds, b_loc, span, shift, D.TIE_CAP,
                cond_reduce=cond_reduce,
            )

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P("d", None), P("d", None), P()),
            out_specs=(P("d"), P("d", None), P("d"), P("d")),
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows):
            q_oh = D.expand_onehot(q_codes, seq_len)
            return mapped(q_oh, db_oh, n_windows)

        return run

    def collect_ties(self, q_codes: np.ndarray, handle=None):
        """(min distance, ALL minimum-distance indices ascending) per row —
        the ScanRunner.collect_ties contract on the ring layout (``handle``
        accepted for parity, ignored). Each enumeration pass is a full
        ring sweep (db shards rotate once around); rows overflowing
        TIE_CAP return None (callers fall back to top-M)."""
        q_codes, nq, b = D.pad_batch(q_codes, multiple=self.n_d,
                                     minimum=self.n_d)
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
            return None  # caller falls back to the exact top-M path
        srt = np.sort(np.where(tbuf >= 0, tbuf, np.int32(2**31 - 1)), axis=1)
        ties = [srt[r, : count[r]].tolist() for r in range(nq)]
        return dist, ties

    def _build_kmode(self, b: int, cap: int | None):
        """cap None -> phase-1 (cutoff stats) program; else phase-2."""
        seq_len = self.seq_len
        chunk = self.chunk
        shard_rows = self.shard_rows
        shift = self.shift
        span = self.wp
        n_d = self.n_d
        fwd = [(j, (j + 1) % n_d) for j in range(n_d)]

        def shard_fn(q_oh, db_shard, n_windows, *extra):
            me = jax.lax.axis_index("d").astype(jnp.int32)
            b_loc = q_oh.shape[0]

            if cap is None:
                k, maxdiv = extra

                def scan_stats(t):
                    t = jnp.broadcast_to(t, (b_loc,))

                    def body(i, carry):
                        cnt, mx, db_cur = carry
                        owner = (me - i) % n_d
                        off = owner * shard_rows
                        n_valid = jnp.clip(n_windows - off, 0, shard_rows)
                        c2, m2 = D._stats_pass(
                            q_oh, db_cur, n_valid, t, seq_len, chunk
                        )
                        db_nxt = jax.lax.cond(
                            i < n_d - 1,
                            lambda x: jax.lax.ppermute(x, "d", fwd),
                            lambda x: x, db_cur,
                        )
                        return cnt + c2, jnp.maximum(mx, m2), db_nxt

                    init = (
                        jnp.zeros((b_loc,), jnp.int32),
                        jnp.full((b_loc,), -1, jnp.int32),
                        db_shard,
                    )
                    cnt, mx, _ = jax.lax.fori_loop(0, n_d, body, init)
                    return cnt, mx

                return D.kmode_phase1(scan_stats, k, maxdiv, n_windows, seq_len)

            eff, hits = extra

            def region_scan(e, lo_k, hi_k):
                def body(i, carry):
                    m1, mr, db_cur = carry
                    owner = (me - i) % n_d
                    off = owner * shard_rows
                    n_valid = jnp.clip(n_windows - off, 0, shard_rows)
                    a, r = D._region_pass(
                        q_oh, db_cur, n_valid, e, lo_k, hi_k,
                        seq_len, shift, chunk, span, index_offset=off,
                    )
                    db_nxt = jax.lax.cond(
                        i < n_d - 1,
                        lambda x: jax.lax.ppermute(x, "d", fwd),
                        lambda x: x, db_cur,
                    )
                    return jnp.minimum(m1, a), jnp.minimum(mr, r), db_nxt

                big = jnp.int32(2**31 - 1)
                init = (
                    jnp.full((b_loc,), big, jnp.int32),
                    jnp.full((b_loc,), big, jnp.int32),
                    db_shard,
                )
                m1, mr, _ = jax.lax.fori_loop(0, n_d, body, init)
                return m1, mr

            def cond_reduce(local_any):
                return jax.lax.pmax(local_any.astype(jnp.int32), "d") > 0

            return D.kmode_enumerate(
                region_scan, b_loc, eff, hits, shift, seq_len, span, cap,
                cond_reduce=cond_reduce,
            )

        if cap is None:
            in_specs = (P("d", None), P("d", None), P(), P(), P())
            out_specs = (P("d"), P("d"))
        else:
            in_specs = (P("d", None), P("d", None), P(), P("d"), P("d"))
            out_specs = P("d", None)
        mapped = jax.shard_map(
            shard_fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        @jax.jit
        def run(q_codes, db_oh, n_windows, *extra):
            q_oh = D.expand_onehot(q_codes, seq_len)
            return mapped(q_oh, db_oh, n_windows, *extra)

        return run

    def kmode(self, q_codes: np.ndarray, k: int, max_divergence: int | None,
              stats_handle=None):
        """Exact K-mode hit lists on the ring layout — ScanRunner.kmode
        contract: (dists [B, cap], idxs [B, cap], hits [B]); None for
        degenerate hit sets (callers fall back to the top-M path).
        ``stats_handle`` is accepted for interface parity and ignored
        (ring phase 1 is cheap relative to its sweeps)."""
        q_codes, nq, b = D.pad_batch(q_codes, multiple=self.n_d,
                                     minimum=self.n_d)
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
        hits_all[nq:] = 0  # padded rows must not drive enumeration sweeps
        hits = jnp.asarray(hits_all)
        hits_h = hits_all[:nq]
        max_hits = int(hits_h.max(initial=0))
        if max_hits == 0:
            return np.empty((nq, 0), np.int32), np.empty((nq, 0), np.int32), hits_h
        if max_hits > 4096:
            # Enumeration would need ~hits/2 full ring sweeps; signal the
            # caller to use its exact top-M fallback (ScanRunner contract).
            return None
        cap = D.bucket(max_hits)
        ekey = ("kenum", b, cap)
        efn = self._cache.get(ekey)
        if efn is None:
            efn = self._build_kmode(b, cap)
            self._cache[ekey] = efn
        buf = np.asarray(efn(q_codes, self.db_oh, self.n_windows_dev, eff, hits))
        dists, idxs = D.unpack_key(buf[:nq], self.shift)
        return dists, idxs, hits_h

    def min2(self, q_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per row: (min distance, first argmin, unique-min flag) — exact,
        identical contract to ScanRunner.min2."""
        q_codes, nq, b = D.pad_batch(q_codes, multiple=self.n_d,
                                     minimum=self.n_d)
        fn = self._cache.get(b)
        if fn is None:
            fn = self._build(b)
            self._cache[b] = fn
        lo, hi = fn(q_codes, self.db_oh, self.n_windows_dev)
        return D.unpack_min2(np.asarray(lo)[:nq], np.asarray(hi)[:nq], self.shift, self.wp)
