"""Streaming FASTA/FASTQ reader with transparent gzip, replacing the
reference's needletail dependency (reference lib.rs:143-144, 221;
cluster.rs:28; gz support pinned by the .fq.gz count test,
reference tests/test_cmdline.rs:194-201).

Records are yielded as ``(id, seq)`` where ``id`` is the full header after
the ``>``/``@`` marker (needletail's ``.id()`` semantics) and ``seq`` is the
raw sequence bytes. FASTA sequences may wrap over multiple lines; FASTQ
records are the standard 4-line form.

A batched interface (``read_encoded_batches``) feeds the device pipeline:
it encodes records into dense channel-index matrices off the hot path so
the TPU never waits on per-record Python work. When the native C++ ingest
extension is built it is used automatically for the parse+encode step.
"""

from __future__ import annotations

import gzip
import io
from pathlib import Path
from typing import Iterator

import numpy as np

from smafa_tpu.core.alphabet import encode_bytes

_GZIP_MAGIC = b"\x1f\x8b"


class FastxError(ValueError):
    pass


def open_maybe_gzip(path: str | Path) -> io.BufferedReader:
    f = open(path, "rb")
    magic = f.peek(2)[:2] if hasattr(f, "peek") else f.read(2)
    if magic == _GZIP_MAGIC:
        return io.BufferedReader(gzip.GzipFile(fileobj=f), buffer_size=1 << 20)
    return io.BufferedReader(f, buffer_size=1 << 20) if not isinstance(f, io.BufferedReader) else f


def read_file_bytes(path: str | Path) -> bytes:
    """Whole file contents, transparently gunzipped."""
    with open_maybe_gzip(path) as f:
        return f.read()


def parse_native(path: str | Path, encode: bool = True):
    """Parse a whole file with the C++ ingest extension; None if unbuilt."""
    from smafa_tpu.native import ingest

    if ingest.load() is None:
        return None
    return ingest.parse_buffer(read_file_bytes(path), encode=encode, path=str(path))


def read_records(path: str | Path) -> Iterator[tuple[str, bytes]]:
    """Yield (id, seq_bytes) for each record in a FASTA/FASTQ(.gz) file."""
    parsed = parse_native(path, encode=False)
    if parsed is not None:
        if parsed.n == 0:
            raise FastxError(f"Empty or invalid FASTX file: {path}")
        for i in range(parsed.n):
            yield parsed.record_id(i), parsed.raw_seq(i)
        return
    with open_maybe_gzip(path) as f:
        first = f.peek(1)[:1]
        if not first:
            raise FastxError(f"Empty or invalid FASTX file: {path}")
        if first == b">":
            yield from _read_fasta(f)
        elif first == b"@":
            yield from _read_fastq(f)
        else:
            raise FastxError(f"Not a FASTA or FASTQ file (bad leading byte): {path}")


def _read_fasta(f) -> Iterator[tuple[str, bytes]]:
    header: str | None = None
    chunks: list[bytes] = []
    for line in f:
        line = line.rstrip(b"\r\n")
        if line.startswith(b">"):
            if header is not None:
                yield header, b"".join(chunks)
            header = line[1:].decode("utf-8", "replace")
            chunks = []
        elif line:
            if header is None:
                raise FastxError("Sequence data before first FASTA header")
            chunks.append(line)
    if header is not None:
        yield header, b"".join(chunks)


def _read_fastq(f) -> Iterator[tuple[str, bytes]]:
    while True:
        h = f.readline()
        if not h:
            return
        h = h.rstrip(b"\r\n")
        if not h:
            continue
        if not h.startswith(b"@"):
            raise FastxError("Malformed FASTQ record header")
        seq = f.readline().rstrip(b"\r\n")
        plus = f.readline()
        qual = f.readline()
        if not plus.startswith(b"+") or not qual:
            raise FastxError("Malformed FASTQ record")
        yield h[1:].decode("utf-8", "replace"), seq


def read_encoded_batches(
    path: str | Path,
    batch_size: int,
    expected_length: int | None = None,
    skip_records: int = 0,
) -> Iterator[tuple[list[str], list[bytes], np.ndarray]]:
    """Yield (ids, raw_seqs, codes[B, L]) batches of encoded records.

    Length uniformity inside a batch follows from the db contract; a
    mismatching record raises through the caller's WindowSet length check
    so the error text matches the reference (lib.rs:71-78).
    ``skip_records`` resumes mid-stream (checkpointed query restart).
    """
    parsed = parse_native(path, encode=True)
    if parsed is not None:
        if parsed.n == 0:
            raise FastxError(f"Empty or invalid FASTX file: {path}")
        # A deferred invalid-base error belongs to a specific record:
        # yield everything before it, then raise (streaming parity).
        n_ok = parsed.n if parsed.error is None else parsed.error_record
        lengths = parsed.seq_lengths()
        # NB: min(initial=0) would include 0 in the reduction and defeat
        # the uniformity check for every L>0 file; parsed.n >= 1 here.
        uniform = int(lengths.min()) == int(lengths.max())
        if uniform and (expected_length is None or int(lengths[0]) == expected_length):
            L = int(lengths[0])
            codes = parsed.codes.reshape(parsed.n, L) if L else np.empty(
                (parsed.n, 0), np.uint8
            )
            for s in range(skip_records, n_ok, batch_size):
                e = min(s + batch_size, n_ok)
                yield (
                    [parsed.record_id(i) for i in range(s, e)],
                    [parsed.raw_seq(i) for i in range(s, e)],
                    codes[s:e],
                )
            if parsed.error is not None:
                raise parsed.error
            return
        # Non-uniform lengths: group consecutive same-length runs so the
        # caller's WindowSet length check fires on the right record.
        yield from _batches_from_parsed(
            parsed, lengths, batch_size, expected_length, skip_records, n_ok
        )
        if parsed.error is not None:
            raise parsed.error
        return

    ids: list[str] = []
    raws: list[bytes] = []
    rows: list[np.ndarray] = []
    length = expected_length
    records = read_records(path)
    for _ in range(skip_records):
        if next(records, None) is None:
            return
    for rid, seq in records:
        try:
            chans = encode_bytes(seq, identifier=rid)
        except Exception:
            # Streaming parity: emit the accumulated records before the
            # offending one, then raise (reference lib.rs:231-238).
            if ids:
                yield ids, raws, np.vstack(rows)
            raise
        if length is None:
            length = len(seq)
        if len(seq) != length or len(ids) == batch_size:
            if ids:
                yield ids, raws, np.vstack(rows) if rows else np.empty((0, length or 0), np.uint8)
            ids, raws, rows = [], [], []
            length = len(seq) if expected_length is None else expected_length
        ids.append(rid)
        raws.append(seq)
        rows.append(chans)
    if ids:
        yield ids, raws, np.vstack(rows)


def _batches_from_parsed(parsed, lengths, batch_size, expected_length,
                         skip_records=0, n_ok=None):
    """Batch a natively-parsed file with non-uniform record lengths."""
    ids: list[str] = []
    raws: list[bytes] = []
    rows: list[np.ndarray] = []
    length = expected_length
    for i in range(skip_records, parsed.n if n_ok is None else n_ok):
        L = int(lengths[i])
        chans = parsed.codes[parsed.seq_offs[i] : parsed.seq_offs[i + 1]]
        if length is None:
            length = L
        if L != length or len(ids) == batch_size:
            if ids:
                yield ids, raws, (
                    np.vstack(rows) if rows else np.empty((0, length or 0), np.uint8)
                )
            ids, raws, rows = [], [], []
            length = L if expected_length is None else expected_length
        ids.append(parsed.record_id(i))
        raws.append(parsed.raw_seq(i))
        rows.append(chans)
    if ids:
        yield ids, raws, np.vstack(rows)
