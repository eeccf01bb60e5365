"""Db auto-detection loader and native-format edge cases."""

import numpy as np
import pytest

from smafa_tpu.core.windowset import WindowSet
from smafa_tpu.io import native_format, postcard
from smafa_tpu.io.db import load_db


def _ws(n=5, L=7, seed=0):
    rng = np.random.default_rng(seed)
    return WindowSet.from_matrix(
        rng.integers(0, 5, size=(n, L)).astype(np.uint8), 2
    )


def test_loader_autodetects_both_formats(tmp_path):
    ws = _ws()
    p1 = tmp_path / "a.smafadb"
    p1.write_bytes(postcard.dumps(ws))
    p2 = tmp_path / "b.smafatpu"
    native_format.save(ws, p2)
    for p in (p1, p2):
        got = load_db(p)
        assert np.array_equal(got.codes, ws.codes)
        assert got.length == ws.length


def test_native_empty_db_roundtrip(tmp_path):
    ws = WindowSet(version=2)
    p = tmp_path / "empty"
    native_format.save(ws, p)
    got = native_format.load(p)
    assert len(got) == 0 and got.length is None


def test_native_row_slicing_matches_full(tmp_path):
    ws = _ws(n=100, L=13, seed=3)
    p = tmp_path / "db"
    native_format.save(ws, p)
    part = native_format.load(p, rows=(30, 70))
    assert np.array_equal(part.codes, ws.codes[30:70])
    header = native_format.read_header(p)
    assert header["num_windows"] == 100 and header["length"] == 13


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad"
    p.write_bytes(b"NOTADB\x00\x00\x00 garbage")
    with pytest.raises(ValueError):
        native_format.load(p)


def test_postcard_truncated_stream_error(tmp_path):
    ws = _ws(n=50, L=9, seed=4)
    blob = postcard.dumps(ws)
    with pytest.raises(postcard.PostcardError, match="end of buffer"):
        postcard.loads(blob[: len(blob) // 2])


def test_postcard_inconsistent_wps_rejected():
    # Declared length larger than the word stream supports must not
    # OOB-read (native) or mis-decode (numpy): both raise.
    out = bytearray()
    postcard.write_varint(2, out)   # version
    postcard.write_varint(2, out)   # two windows
    for _ in range(2):
        postcard.write_varint(1, out)       # wps = 1
        postcard.write_varint(0b10000, out)  # one word: "A"
    out.append(0x01)
    postcard.write_varint(100, out)  # Some(length=100): inconsistent
    with pytest.raises(ValueError):
        postcard.loads(bytes(out))


def test_fastq_gz_roundtrip_through_engine(tmp_path, data_dir):
    """FASTQ(.gz) works as both makedb subject input and query stream
    (the reference accepts FASTX everywhere; only count was covered)."""
    import io as _io

    from smafa_tpu.engine.makedb import makedb
    from smafa_tpu.engine.query import query as run_query

    src = data_dir / "random_30_4.fq.gz"
    dbp = tmp_path / "db"
    makedb(src, dbp)
    buf = _io.StringIO()
    run_query(dbp, src, out=buf)
    lines = [l.split("\t") for l in buf.getvalue().splitlines()]
    # every read must best-hit itself at distance 0
    self_hits = {(p[0], p[1]) for p in lines if p[2] == "0"}
    for i in range(4):
        assert (str(i), str(i)) in self_hits


def test_count_zero_files_prints_empty_array(capsys):
    from smafa_tpu.cli import main

    assert main(["count", "-i"]) == 0
    assert capsys.readouterr().out.strip() == "[]"


def test_no_subcommand_prints_help_and_exits_zero(capsys):
    # Reference: no subcommand -> print help, exit 0 (main.rs:52-56).
    from smafa_tpu.cli import main

    assert main([]) == 0
    out = capsys.readouterr().out
    assert "makedb" in out and "query" in out and "cluster" in out and "count" in out
