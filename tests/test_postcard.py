"""Postcard v2 format tests: byte-exact parity with reference db fixtures
(reference lib.rs:160-162, 206-218; fixture layout verified in SURVEY.md
§2.1)."""

import numpy as np
import pytest

from smafa_tpu.core.alphabet import encode_bytes
from smafa_tpu.core.windowset import WindowSet
from smafa_tpu.io import postcard


def _ws(seqs, version=2):
    ws = WindowSet(version=version)
    for s in seqs:
        ws.push(encode_bytes(s))
    return ws


def test_dumps_matches_reference_fixture(data_dir):
    ws = _ws([b"CTT", b"AGG"])
    assert postcard.dumps(ws) == (data_dir / "random_3_2.fna.smafadb").read_bytes()
    ws3 = _ws([b"CTT", b"AGG", b"AGG"])
    assert postcard.dumps(ws3) == (data_dir / "random_3_2_one_repeated.fna.smafadb").read_bytes()


def test_loads_reference_fixture(data_dir):
    ws = postcard.loads((data_dir / "random_3_2.fna.smafadb").read_bytes())
    assert ws.version == 2
    assert ws.length == 3
    assert ws.decoded_strings() == ["CTT", "AGG"]


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    for L in [1, 12, 13, 60]:
        codes = rng.integers(0, 5, size=(17, L)).astype(np.uint8)
        ws = WindowSet.from_matrix(codes, version=2)
        back = postcard.loads(postcard.dumps(ws))
        np.testing.assert_array_equal(back.codes, codes)
        assert back.length == L


def test_version_gate(data_dir):
    buf = (data_dir / "random_3_2.fna.v1.smafadb").read_bytes()
    assert postcard.peek_version(buf) == 1
    with pytest.raises(postcard.UnsupportedDbVersion) as e:
        postcard.loads(buf)
    assert str(e.value) == (
        "Unsupported db file version: 1. This version of smafa only works with "
        "version 2 databases. The last version to support version 1 databases "
        "was v0.7.1."
    )


def test_empty_windowset_roundtrip():
    ws = WindowSet(version=2)
    back = postcard.loads(postcard.dumps(ws))
    assert len(back) == 0 and back.length is None


def test_varint_vectorized_agrees_with_scalar():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.array([0, 1, 127, 128, 16383, 16384, 2**63, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**62, size=200).astype(np.uint64),
    ])
    enc = postcard._encode_varints(vals)
    # scalar reference decode
    pos = 0
    out = []
    for _ in range(len(vals)):
        v, pos = postcard.read_varint(enc, pos)
        out.append(v)
    assert out == vals.tolist()
    dec, end = postcard._decode_varints(enc, len(vals), 0)
    assert end == len(enc)
    np.testing.assert_array_equal(dec, vals)


@pytest.mark.parametrize("tail,expect", [
    (b"\x80" * 10 + b"\x01", "Found a varint that didn't terminate"),
    (b"\x80" * 11, "Found a varint that didn't terminate"),
    (b"\x80" * 3, "Hit the end of buffer, expected more data"),
])
def test_corrupt_varint_errors_agree_across_decoders(tail, expect, monkeypatch):
    """The scalar, vectorized-numpy, and native C++ varint decoders must
    classify the same corrupt stream identically (overlong vs truncated)."""
    bad = bytes([2, 1, 1]) + tail  # version 2, 1 window, word-count 1, then junk
    for disable in ("0", "1"):
        monkeypatch.setenv("SMAFA_TPU_NO_NATIVE", disable)
        import smafa_tpu.native as N

        monkeypatch.setattr(N, "_TRIED", False)
        monkeypatch.setattr(N, "_LIB", None)
        with pytest.raises(postcard.PostcardError, match=expect):
            postcard.loads(bad)
    with pytest.raises(postcard.PostcardError, match=expect):
        pos = 2  # skip version + windows-count varints
        while True:
            _, pos = postcard.read_varint(bad, pos)
