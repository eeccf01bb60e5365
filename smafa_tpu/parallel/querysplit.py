"""Multi-host query-stream splitting: per-process disjoint byte ranges.

Without this, every process of a multi-host run parses and encodes the
ENTIRE query stream (the scan programs are SPMD, so each dispatch needs
the batch replicated) — host-side query work then does not scale with
hosts (the round-3 gap; the serial loop being scaled is reference
lib.rs:232). With it, each process parses + encodes only ~1/P of the
file:

1. Every process deterministically cuts the file into P byte ranges,
   each extended forward to the next record boundary. Plain FASTA cuts
   at ``\\n>`` (a sequence line can never start with '>'); plain FASTQ
   cuts at a VALIDATED ``\\n@`` — quality lines may start with '@', so
   each candidate is checked against the positional 4-line structure
   (the line two physical lines later must be the '+' separator;
   reference treats FASTQ as first-class, lib.rs:221,
   test_cmdline.rs:194-201). Gzip is not byte-addressable without BGZF
   and falls back to the replicated parse.
2. Each process parses + encodes ITS range only (native C++ one-pass
   where built). Range metadata — record count, window length,
   deferred-error text — is exchanged with ONE ``process_allgather``,
   giving every process the same deterministic global batch schedule
   and the global record numbering (prefix sums).
3. The batch loop walks ranges in file order. For each batch the owner
   contributes its encoded codes to a fixed-shape ``process_allgather``
   (others contribute zeros); every process receives the batch and
   joins the SPMD dispatch. DCN traffic is one [B, L] uint8 buffer per
   batch — trivia against the scan itself.
4. Error parity: a deferred parse/encode error surfaces exactly where
   the reference's serial loop would hit it — after every batch of
   earlier ranges and of the erroring range's valid prefix has been
   yielded (reference streams output before panicking,
   lib.rs:231-318) — with the owner's exact error text re-raised on
   every process.

``--resume-state`` composes: the broadcast ``done`` count maps into the
ranges via the same prefix sums (ranges entirely before it yield
nothing).
"""

from __future__ import annotations

import io as _io
from pathlib import Path

import numpy as np

from smafa_tpu.io.fastx import FastxError, _read_fasta

_ERR_TEXT_CAP = 2048
_SCAN_WINDOW = 1 << 20


def split_format(path: str | Path) -> bytes | None:
    """b'>' for plain FASTA, b'@' for plain FASTQ (both splittable at
    record boundaries), None otherwise (gzip is not byte-addressable
    without BGZF — those streams fall back to the replicated parse)."""
    try:
        with open(path, "rb") as f:
            first = f.read(1)
    except OSError:
        return None
    return first if first in (b">", b"@") else None


def is_plain_fasta(path: str | Path) -> bool:
    """True for an uncompressed FASTA (splittable at ``\\n>`` boundaries)."""
    return split_format(path) == b">"


def _validated_fastq_start(buf: bytes, base: int) -> int | None:
    """Offset (relative to ``buf``) of the first TRUE record start at or
    after ``base``, or None. A ``\\n@`` candidate is ambiguous — quality
    lines may start with '@' — so each candidate line is validated
    against the 4-line structure: the line two PHYSICAL lines later
    must start with '+' (the parser takes sequence/separator/quality
    lines by position, fastx_scan — blank sequence lines are legal, so
    no blank-skipping here). A quality line masquerading as a header
    fails the check (two lines later is the next record's sequence
    line: nucleotide text or blank, never '+'), and no other line type
    starts with '@'."""
    pos = base
    while True:
        hit = buf.find(b"\n@", pos)
        if hit < 0:
            return None
        cand = hit + 1
        p = cand
        ok = True
        for _ in range(2):
            nl = buf.find(b"\n", p)
            if nl < 0:
                return None  # structure runs off the window: widen
            p = nl + 1
        if p >= len(buf):
            return None
        if ok and buf[p:p + 1] == b"+":
            return cand
        pos = hit + 1


def byte_ranges(path: str | Path, n_ranges: int,
                fmt: bytes = b">") -> list[int]:
    """n_ranges+1 boundaries into the file, each (except 0 and EOF) at a
    record start (FASTA: the byte after a ``\\n>``'s newline; FASTQ: a
    validated header line start). Deterministic, so every process
    computes the identical cut without communication."""
    size = Path(path).stat().st_size
    bounds = [0]
    with open(path, "rb") as f:
        for p in range(1, n_ranges):
            cut = p * size // n_ranges
            if cut <= bounds[-1]:
                bounds.append(bounds[-1])
                continue
            pos = max(cut - 1, 0)
            boundary = size
            win = b""
            while True:
                f.seek(pos + len(win))
                more = f.read(_SCAN_WINDOW)
                win = win + more
                if fmt == b">":
                    hit = win.find(b"\n>")
                    rec = hit + 1 if hit >= 0 else None
                else:
                    rec = _validated_fastq_start(win, 0)
                if rec is not None:
                    boundary = pos + rec
                    break
                if not more:
                    break  # EOF with no further record start
            bounds.append(max(boundary, bounds[-1]))
    bounds.append(size)
    return bounds


class _RangeParse:
    """One process's parsed+encoded slice: valid records only, plus the
    deferred error (exact text) if its slice has one."""

    def __init__(self, n_ok: int, length: int, codes: np.ndarray,
                 error_text: str | None):
        self.n_ok = n_ok
        self.length = length  # -1 = nonuniform within the slice
        self.codes = codes    # uint8 [n_ok, length] (empty if nonuniform)
        self.error_text = error_text


def _parse_slice(path: str | Path, start: int, end: int) -> _RangeParse:
    if end <= start:
        return _RangeParse(0, 0, np.empty((0, 0), np.uint8), None)
    with open(path, "rb") as f:
        f.seek(start)
        buf = f.read(end - start)

    from smafa_tpu.native import ingest

    if ingest.load() is not None:
        parsed = ingest.parse_buffer(buf, encode=True, path=str(path))
        if parsed.n == 0:
            return _RangeParse(0, 0, np.empty((0, 0), np.uint8), None)
        n_ok = parsed.n if parsed.error is None else parsed.error_record
        err = str(parsed.error) if parsed.error is not None else None
        lengths = parsed.seq_lengths()[:n_ok]
        if n_ok == 0:
            return _RangeParse(0, 0, np.empty((0, 0), np.uint8), err)
        if int(lengths.min()) != int(lengths.max()):
            return _RangeParse(n_ok, -1, np.empty((0, 0), np.uint8), err)
        L = int(lengths[0])
        codes = parsed.codes[: parsed.seq_offs[n_ok]].reshape(n_ok, L)
        return _RangeParse(n_ok, L, np.ascontiguousarray(codes), err)

    # Pure-Python fallback: stream the slice through the format's reader.
    from smafa_tpu.core.alphabet import encode_bytes
    from smafa_tpu.io.fastx import _read_fastq

    reader = _read_fastq if buf[:1] == b"@" else _read_fasta
    rows: list[np.ndarray] = []
    err = None
    length: int | None = None
    uniform = True
    try:
        for rid, seq in reader(_io.BytesIO(buf)):
            rows.append(encode_bytes(seq, identifier=rid))
            if length is None:
                length = len(seq)
            elif len(seq) != length:
                uniform = False
    except Exception as e:  # deferred: valid prefix still serves
        err = str(e)
    n_ok = len(rows)
    if n_ok == 0:
        return _RangeParse(0, 0, np.empty((0, 0), np.uint8), err)
    if not uniform:
        return _RangeParse(n_ok, -1, np.empty((0, 0), np.uint8), err)
    return _RangeParse(n_ok, int(length), np.vstack(rows), err)


def _pack_meta(rp: _RangeParse) -> np.ndarray:
    meta = np.zeros(3 + _ERR_TEXT_CAP, np.int64)
    meta[0] = rp.n_ok
    meta[1] = rp.length
    meta[2] = 1 if rp.error_text is not None else 0
    if rp.error_text is not None:
        raw = rp.error_text.encode("utf-8")[:_ERR_TEXT_CAP]
        meta[3 : 3 + len(raw)] = np.frombuffer(raw, np.uint8)
    return meta


def _unpack_err(meta_row: np.ndarray) -> str:
    raw = meta_row[3:][meta_row[3:] > 0].astype(np.uint8).tobytes()
    return raw.decode("utf-8", "replace")


def split_encoded_batches(path: str | Path, batch_size: int,
                          skip_records: int = 0):
    """SPMD generator of (None, None, codes) batches in global record
    order, or None when the stream is not splittable (not plain FASTA,
    nonuniform lengths, or single-process). Every process must drive the
    generator in lockstep — each metadata exchange and each batch is one
    collective. The caller applies its own per-batch length check (so
    the db-length-mismatch error text matches the reference)."""
    import jax

    P = jax.process_count()
    fmt = split_format(path)
    if P <= 1 or fmt is None:
        return None
    from jax.experimental import multihost_utils

    pid = jax.process_index()
    bounds = byte_ranges(path, P, fmt)
    rp = _parse_slice(path, bounds[pid], bounds[pid + 1])
    metas = np.asarray(multihost_utils.process_allgather(_pack_meta(rp)))
    counts = metas[:, 0].astype(np.int64)
    lengths = metas[:, 1].astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        # Deferred-error parity even with an empty valid prefix: if any
        # slice recorded a parse/encode error (e.g. the first record has
        # an invalid base), the serial path would raise THAT text, not
        # the empty-file error. Owner order = file order.
        for owner in range(P):
            if metas[owner, 2]:
                raise FastxError(_unpack_err(metas[owner]))
        # Match read_encoded_batches on an empty stream; every process
        # raises together (same metadata everywhere).
        raise FastxError(f"Empty or invalid FASTX file: {path}")
    active = counts > 0
    ls = set(int(x) for x in lengths[active])
    if -1 in ls or len(ls) > 1:
        return None  # nonuniform lengths: replicated fallback handles it
    L = ls.pop()

    def gen():
        offsets = np.concatenate([[0], np.cumsum(counts)])
        pad = np.zeros((batch_size, L), np.uint8)
        for owner in range(P):
            n_p = int(counts[owner])
            off = int(offsets[owner])
            lo = max(skip_records - off, 0)
            for s in range(lo, n_p, batch_size):
                e = min(s + batch_size, n_p)
                if pid == owner:
                    contrib = pad.copy()
                    contrib[: e - s] = rp.codes[s:e]
                else:
                    contrib = pad
                gathered = np.asarray(
                    multihost_utils.process_allgather(contrib)
                )
                yield None, None, gathered[owner, : e - s]
            if metas[owner, 2]:
                # The owner's slice hit a deferred parse/encode error:
                # the stream stops here on every process, after every
                # earlier record's batch was served (streaming parity).
                raise FastxError(_unpack_err(metas[owner]))

    return gen()
