"""Native C++ FASTX ingest: parity with the pure-Python parser.

The native parser must produce identical records, encodings, and error
behavior to the Python fallback (both implement the reference needletail
call-sites' semantics, reference lib.rs:143-149, 221, 234; cluster.rs:28).
"""

import numpy as np
import pytest

from smafa_tpu.core.alphabet import InvalidBaseError
from smafa_tpu.io import fastx
from smafa_tpu.native import load


requires_native = pytest.mark.skipif(load() is None, reason="native lib unavailable")


@requires_native
@pytest.mark.parametrize(
    "name",
    ["subjects.fa", "random_3_2.fna", "degenerate.fna", "random_30_4.fq.gz"],
)
def test_native_matches_python_records(data_dir, name, monkeypatch):
    path = data_dir / name
    parsed = fastx.parse_native(path)
    native = [(parsed.record_id(i), parsed.raw_seq(i)) for i in range(parsed.n)]

    monkeypatch.setenv("SMAFA_TPU_NO_NATIVE", "1")
    python = list(fastx.read_records(path))
    assert native == python


@requires_native
@pytest.mark.parametrize("name", ["subjects.fa", "random_30_4.fq.gz"])
def test_native_matches_python_batches(data_dir, name, monkeypatch):
    batches_native = list(fastx.read_encoded_batches(data_dir / name, batch_size=3))

    monkeypatch.setenv("SMAFA_TPU_NO_NATIVE", "1")
    batches_py = list(fastx.read_encoded_batches(data_dir / name, batch_size=3))

    assert len(batches_native) == len(batches_py)
    for (ids_n, raws_n, codes_n), (ids_p, raws_p, codes_p) in zip(
        batches_native, batches_py
    ):
        assert ids_n == ids_p
        assert raws_n == raws_p
        assert np.array_equal(codes_n, codes_p)


@requires_native
def test_native_uniform_batches(tmp_path):
    # Uniform-length files batch via the chunked zero-copy reshape path
    # (no per-record work; the pre-round-5 per-record fallback helper is
    # gone).
    f = tmp_path / "u.fna"
    f.write_text("".join(f">s{i}\nACGTACGT\n" for i in range(10)))
    import smafa_tpu.io.fastx as fx

    batches = list(fx.read_encoded_batches(f, batch_size=4))
    assert sum(len(b[0]) for b in batches) == 10
    assert all(b[2].shape[1] == 8 for b in batches)


@requires_native
def test_native_invalid_base_error(tmp_path):
    bad = tmp_path / "bad.fna"
    bad.write_text(">seq one\nACGTACGTXA\n")
    with pytest.raises(InvalidBaseError) as e:
        list(fastx.read_encoded_batches(bad, batch_size=16))
    # Reference panic parameters (lib.rs:38-42): byte, full id, position.
    assert "Byte 88" in str(e.value)
    assert '"seq one"' in str(e.value)
    assert "position 8" in str(e.value)


@requires_native
def test_native_multiline_fasta_and_crlf(tmp_path, monkeypatch):
    f = tmp_path / "wrap.fna"
    f.write_bytes(b">a desc\r\nACGT\r\nACGT\r\n>b\nTTTT\nGGGG\n\n>c\nAAAA\n")
    parsed = fastx.parse_native(f)
    native = [(parsed.record_id(i), parsed.raw_seq(i)) for i in range(parsed.n)]
    monkeypatch.setenv("SMAFA_TPU_NO_NATIVE", "1")
    python = list(fastx.read_records(f))
    assert native == python
    assert native[0] == ("a desc", b"ACGTACGT")
    assert native[2] == ("c", b"AAAA")


@requires_native
@pytest.mark.parametrize("L", [1, 3, 12, 13, 60, 61])
def test_native_postcard_codec_differential(L, monkeypatch):
    # Native C++ varint codec vs numpy fallback: byte-identical encode,
    # identical decode, across partial-trailing-word lengths.
    import smafa_tpu.native as native_mod
    from smafa_tpu.core.windowset import WindowSet
    from smafa_tpu.io import postcard

    rng = np.random.default_rng(L)
    codes = rng.integers(0, 5, size=(333, L), dtype=np.uint8)
    ws = WindowSet.from_matrix(codes, 2)
    blob_native = postcard.dumps(ws)
    ws_native = postcard.loads(blob_native)

    monkeypatch.setenv("SMAFA_TPU_NO_NATIVE", "1")
    blob_py = postcard.dumps(ws)
    ws_py = postcard.loads(blob_native)

    assert blob_native == blob_py
    assert np.array_equal(ws_native.codes, codes)
    assert np.array_equal(ws_py.codes, codes)


@requires_native
def test_native_empty_and_garbage(tmp_path):
    empty = tmp_path / "empty.fna"
    empty.write_text("")
    with pytest.raises(fastx.FastxError):
        list(fastx.read_records(empty))
    garbage = tmp_path / "garbage.fna"
    garbage.write_text("not a fastx\n")
    with pytest.raises(fastx.FastxError):
        list(fastx.read_records(garbage))
