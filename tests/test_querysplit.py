"""Multi-host query-stream splitting (parallel.querysplit).

Unit level: byte-range cuts land on record boundaries and per-slice
parses reassemble the full stream. Protocol level: the full SPMD
generator runs as two simulated processes in lockstep (threads + a
barrier exchanger standing in for process_allgather) and must reproduce
the single-stream batches byte-for-byte, including deferred-error
ordering and resume skips. The real 2-process CLI goldens in
test_multihost.py exercise the same path end to end.
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from smafa_tpu.parallel import querysplit as QS

ALPHA = np.array(list("ACGTN"))


def _write_fasta(path, seqs, ids=None):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            rid = ids[i] if ids else f"s{i}"
            f.write(f">{rid}\n{s}\n")


def _rand_seqs(rng, n, L):
    return ["".join(ALPHA[rng.integers(0, 4, L)]) for _ in range(n)]


def test_byte_ranges_land_on_records(tmp_path):
    rng = np.random.default_rng(0)
    fa = tmp_path / "a.fna"
    _write_fasta(fa, _rand_seqs(rng, 157, 33))
    raw = fa.read_bytes()
    for P in (1, 2, 3, 4, 8):
        bounds = QS.byte_ranges(fa, P)
        assert bounds[0] == 0 and bounds[-1] == len(raw)
        assert bounds == sorted(bounds)
        for b in bounds[1:-1]:
            if b < len(raw):
                assert raw[b : b + 1] == b">", (P, b)
        # slices parse back to the complete record set, in order
        total = []
        for p in range(P):
            rp = QS._parse_slice(fa, bounds[p], bounds[p + 1])
            assert rp.error_text is None
            total.append(rp.codes)
        got = np.concatenate([c for c in total if c.size], axis=0)
        full = QS._parse_slice(fa, 0, len(raw))
        np.testing.assert_array_equal(got, full.codes)


def test_split_format(tmp_path):
    fa = tmp_path / "x.fna"
    fa.write_text(">a\nACGT\n")
    assert QS.is_plain_fasta(fa)
    assert QS.split_format(fa) == b">"
    import gzip

    gz = tmp_path / "x.fna.gz"
    gz.write_bytes(gzip.compress(b">a\nACGT\n"))
    assert not QS.is_plain_fasta(gz)
    assert QS.split_format(gz) is None  # gz: replicated fallback
    fq = tmp_path / "x.fq"
    fq.write_text("@a\nACGT\n+\nIIII\n")
    assert QS.split_format(fq) == b"@"


def _write_fastq(path, seqs, at_quals=True):
    """FASTQ where many quality lines START WITH '@' — the ambiguity
    that makes a plain '\\n@' split unsound."""
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            q = ("@" if (at_quals and i % 2 == 0) else "I") + "I" * (len(s) - 1)
            f.write(f"@r{i}\n{s}\n+\n{q}\n")


def test_fastq_byte_ranges_land_on_records(tmp_path):
    rng = np.random.default_rng(11)
    fq = tmp_path / "a.fq"
    seqs = _rand_seqs(rng, 203, 31)
    _write_fastq(fq, seqs)
    raw = fq.read_bytes()
    for P in (2, 3, 5, 8):
        bounds = QS.byte_ranges(fq, P, b"@")
        assert bounds[0] == 0 and bounds[-1] == len(raw)
        assert bounds == sorted(bounds)
        for b in bounds[1:-1]:
            if b < len(raw):
                # every boundary is a true header line: '@r<n>\n'
                assert raw[b:b + 2] == b"@r", (P, b, raw[b:b + 8])
        total = []
        for p in range(P):
            rp = QS._parse_slice(fq, bounds[p], bounds[p + 1])
            assert rp.error_text is None
            if rp.codes.size:
                total.append(rp.codes)
        got = np.concatenate(total, axis=0)
        full = QS._parse_slice(fq, 0, len(raw))
        np.testing.assert_array_equal(got, full.codes)


def test_fastq_split_protocol_matches_single_stream(tmp_path, monkeypatch):
    from smafa_tpu.io.fastx import read_encoded_batches

    rng = np.random.default_rng(12)
    fq = tmp_path / "q.fq"
    seqs = _rand_seqs(rng, 97, 22)
    _write_fastq(fq, seqs)
    for n_procs in (2, 3):
        got, err = _run_split_two_procs(monkeypatch, fq, batch_size=16,
                                        n_procs=n_procs)
        assert err is None
        want = np.concatenate(
            [c for _i, _r, c in read_encoded_batches(fq, batch_size=16)]
        )
        np.testing.assert_array_equal(np.concatenate(got), want)


def test_fastq_validated_start_blank_lines():
    """Regression (round-5 review): a quality line starting with '@'
    followed by a record with a BLANK sequence line must not validate
    as a record start (positional structure, no blank-skipping)."""
    buf = b"@r1\nACGT\n+\n@IJK\n@r2\n\n+\n\n@r3\nACGT\n+\nIIII\n"
    got = QS._validated_fastq_start(buf, 0)
    assert got == buf.index(b"@r2"), got
    # and the quality-line '@' is still rejected in the plain case
    buf2 = b"@r1\nACGT\n+\n@IJK\n@r2\nACGT\n+\nIIII\n"
    assert QS._validated_fastq_start(buf2, 0) == buf2.index(b"@r2")


def test_fastq_split_python_fallback(tmp_path, monkeypatch):
    """The pure-Python slice parser must handle FASTQ slices too."""
    monkeypatch.setenv("SMAFA_TPU_NO_NATIVE", "1")
    rng = np.random.default_rng(13)
    fq = tmp_path / "q.fq"
    _write_fastq(fq, _rand_seqs(rng, 41, 18))
    bounds = QS.byte_ranges(fq, 2, b"@")
    a = QS._parse_slice(fq, bounds[0], bounds[1])
    b = QS._parse_slice(fq, bounds[1], bounds[2])
    full = QS._parse_slice(fq, 0, bounds[2])
    np.testing.assert_array_equal(
        np.concatenate([a.codes, b.codes]), full.codes
    )


def test_parse_slice_defers_errors(tmp_path):
    fa = tmp_path / "bad.fna"
    fa.write_text(">a\nACGT\n>b\nACXT\n>c\nACGT\n")
    rp = QS._parse_slice(fa, 0, fa.stat().st_size)
    assert rp.n_ok == 1  # only the record before the bad base serves
    assert rp.error_text is not None and "88" in rp.error_text
    np.testing.assert_array_equal(rp.codes.shape, (1, 4))


def test_split_returns_none_single_process(tmp_path):
    fa = tmp_path / "a.fna"
    fa.write_text(">a\nACGT\n")
    assert QS.split_encoded_batches(fa, 4) is None


class _FakeCluster:
    """Two simulated processes: thread-local pid, barrier exchanger in
    place of multihost_utils.process_allgather."""

    def __init__(self, n):
        self.n = n
        self.local = threading.local()
        self.barrier = threading.Barrier(n)
        self.slots = [None] * n
        self.lock = threading.Lock()

    def allgather(self, x):
        pid = self.local.pid
        self.slots[pid] = np.asarray(x)
        self.barrier.wait()
        out = np.stack(self.slots)
        self.barrier.wait()  # slots stable until everyone copied
        return out


def _run_split_two_procs(monkeypatch, fa, batch_size, skip=0, n_procs=2):
    """Drive split_encoded_batches as n lockstep simulated processes.
    Returns (batches_from_pid0, error_from_pid0)."""
    cluster = _FakeCluster(n_procs)

    import jax
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: n_procs)
    monkeypatch.setattr(jax, "process_index", lambda: cluster.local.pid)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        cluster.allgather)

    results: dict[int, list] = {p: [] for p in range(n_procs)}
    errors: dict[int, BaseException | None] = {p: None for p in range(n_procs)}

    def worker(pid):
        cluster.local.pid = pid
        try:
            gen = QS.split_encoded_batches(fa, batch_size, skip_records=skip)
            assert gen is not None
            for _ids, _raws, codes in gen:
                results[pid].append(np.array(codes))
        except BaseException as e:  # noqa: BLE001 — barrier-safe capture
            errors[pid] = e

    ts = [threading.Thread(target=worker, args=(p,))
          for p in range(n_procs)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
        assert not t.is_alive(), "split protocol deadlocked"
    # every process must see identical batches and identical errors
    for p in range(1, n_procs):
        assert len(results[0]) == len(results[p])
        for a, b in zip(results[0], results[p]):
            np.testing.assert_array_equal(a, b)
        assert (errors[0] is None) == (errors[p] is None)
        if errors[0] is not None:
            assert str(errors[0]) == str(errors[p])
    return results[0], errors[0]


def test_split_protocol_matches_single_stream(tmp_path, monkeypatch):
    from smafa_tpu.io.fastx import read_encoded_batches

    rng = np.random.default_rng(3)
    fa = tmp_path / "q.fna"
    seqs = _rand_seqs(rng, 101, 24)
    _write_fasta(fa, seqs)

    for n_procs in (2, 3):
        got, err = _run_split_two_procs(monkeypatch, fa, batch_size=16,
                                        n_procs=n_procs)
        assert err is None
        want = np.concatenate(
            [c for _i, _r, c in read_encoded_batches(fa, batch_size=16)]
        )
        np.testing.assert_array_equal(np.concatenate(got), want)
        # record ORDER is the byte-exact contract: rows must align 1:1
        assert sum(c.shape[0] for c in got) == 101


def test_split_protocol_resume_skip(tmp_path, monkeypatch):
    from smafa_tpu.io.fastx import read_encoded_batches

    rng = np.random.default_rng(5)
    fa = tmp_path / "q.fna"
    _write_fasta(fa, _rand_seqs(rng, 60, 12))
    for skip in (0, 7, 30, 59, 60):
        got, err = _run_split_two_procs(monkeypatch, fa, 8, skip=skip)
        assert err is None
        want = [c for _i, _r, c in
                read_encoded_batches(fa, batch_size=8, skip_records=skip)]
        if skip >= 60:
            assert got == []
        else:
            np.testing.assert_array_equal(
                np.concatenate(got), np.concatenate(want)
            )


def test_split_protocol_error_after_valid_prefix(tmp_path, monkeypatch):
    """A bad base mid-stream: every record before it is served (in
    order), then the exact single-stream error text raises on BOTH
    processes."""
    from smafa_tpu.io.fastx import read_encoded_batches

    rng = np.random.default_rng(7)
    fa = tmp_path / "q.fna"
    seqs = _rand_seqs(rng, 40, 20)
    seqs[25] = seqs[25][:10] + "X" + seqs[25][11:]
    _write_fasta(fa, seqs)

    single_batches = []
    single_err = None
    try:
        for _i, _r, c in read_encoded_batches(fa, batch_size=8):
            single_batches.append(c)
    except Exception as e:  # noqa: BLE001
        single_err = e
    assert single_err is not None

    got, err = _run_split_two_procs(monkeypatch, fa, 8)
    assert err is not None
    assert str(single_err) in str(err) or str(err) in str(single_err)
    np.testing.assert_array_equal(
        np.concatenate(got), np.concatenate(single_batches)
    )


def test_split_protocol_error_with_empty_prefix(tmp_path, monkeypatch):
    """A file whose FIRST (and only) record has an invalid base: every
    slice's valid prefix is empty, but the deferred parse error — not
    the empty-file error — must surface, matching the serial path."""
    from smafa_tpu.io.fastx import read_encoded_batches

    fa = tmp_path / "q.fna"
    fa.write_text(">a\nACXT\n")

    single_err = None
    try:
        for _ in read_encoded_batches(fa, batch_size=8):
            pass
    except Exception as e:  # noqa: BLE001
        single_err = e
    assert single_err is not None and "88" in str(single_err)

    got, err = _run_split_two_procs(monkeypatch, fa, 8)
    assert got == []
    assert err is not None
    assert str(single_err) in str(err) or str(err) in str(single_err)


def test_split_protocol_nonuniform_falls_back(tmp_path, monkeypatch):
    fa = tmp_path / "q.fna"
    fa.write_text(">a\nACGT\n>b\nACGTAA\n")
    cluster = _FakeCluster(2)
    import jax
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: cluster.local.pid)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        cluster.allgather)
    out = {}

    def worker(pid):
        cluster.local.pid = pid
        out[pid] = QS.split_encoded_batches(fa, 4)

    ts = [threading.Thread(target=worker, args=(p,)) for p in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
        assert not t.is_alive()
    assert out[0] is None and out[1] is None


def test_split_protocol_empty_stream_raises(tmp_path, monkeypatch):
    from smafa_tpu.io.fastx import FastxError

    fa = tmp_path / "q.fna"
    fa.write_text(">a\nACGT\n")
    # force every slice to parse empty — the generator must raise the
    # same "Empty or invalid" error as read_encoded_batches, on both
    # processes (defensive path; a real plain FASTA always has records)
    monkeypatch.setattr(
        QS, "_parse_slice",
        lambda *_a: QS._RangeParse(0, 0, np.empty((0, 0), np.uint8), None),
    )
    cluster = _FakeCluster(2)
    import jax
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: cluster.local.pid)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        cluster.allgather)
    errs = {}

    def worker(pid):
        cluster.local.pid = pid
        try:
            QS.split_encoded_batches(fa, 4)
            errs[pid] = None
        except FastxError as e:
            errs[pid] = e

    ts = [threading.Thread(target=worker, args=(p,)) for p in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
        assert not t.is_alive()
    assert errs[0] is not None and errs[1] is not None
