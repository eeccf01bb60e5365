"""Core encoding tests: pin the alphabet LUT, packing layout, and decode
semantics to the reference contract (reference lib.rs:20-52, 113-134,
167-196)."""

import numpy as np
import pytest

from smafa_tpu.core import alphabet
from smafa_tpu.core.alphabet import InvalidBaseError, encode_bytes, decode_channels
from smafa_tpu.core.encoding import pack_channels, unpack_words, dedup_key
from smafa_tpu.core.windowset import WindowSet, LengthMismatchError


def test_lut_one_hot_values():
    # The five canonical single-base encodings (reference lib.rs:357-366
    # test_makedb expected values).
    for base, code in [("A", 0b10000), ("C", 0b01000), ("G", 0b00100), ("T", 0b00010), ("N", 0b00001)]:
        chan = encode_bytes(base.encode())[0]
        assert alphabet.CODE_OF_CHANNEL[chan] == code


def test_lut_case_and_degenerates():
    # T and U are the same channel; all IUPAC degenerates and '-' are N.
    assert encode_bytes(b"tTuU").tolist() == [alphabet.T] * 4
    for ch in "NWSMKRYBDHV-nwsmkrybdhv":
        assert encode_bytes(ch.encode())[0] == alphabet.N
    for ch in "aA":
        assert encode_bytes(ch.encode())[0] == alphabet.A


def test_invalid_byte_message():
    with pytest.raises(InvalidBaseError) as e:
        encode_bytes(b"ACGTXACGT", identifier="myseq")
    assert str(e.value) == (
        'Byte 88 cannot be interpreted as nucleotide, in sequence "myseq" at position 4'
    )


def test_pack_layout_matches_reference():
    # "CTT" packs to 2120 and "AGG" to 4240 (verified against the reference
    # fixture random_3_2.fna.smafadb, SURVEY.md §2.1).
    assert pack_channels(encode_bytes(b"CTT")).tolist() == [2120]
    assert pack_channels(encode_bytes(b"AGG")).tolist() == [4240]
    # 13 bases -> 2 words, 13th base in low bits of second word
    chans = encode_bytes(b"A" * 13)
    words = pack_channels(chans)
    assert words.shape == (2,)
    assert words[1] == 0b10000


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for L in [1, 3, 12, 13, 24, 60, 61]:
        chans = rng.integers(0, 5, size=(7, L)).astype(np.uint8)
        words = pack_channels(chans)
        assert words.shape == (7, (L + 11) // 12)
        back = unpack_words(words, L)
        np.testing.assert_array_equal(back, chans)


def test_decode_channels():
    assert decode_channels(encode_bytes(b"acgTu-rN")) == "ACGTTNNN"


def test_unpack_invalid_code():
    with pytest.raises(ValueError, match="Invalid character in query sequence: 3"):
        unpack_words(np.array([[3]], dtype=np.uint64), 1)


def test_dedup_key_normalizes_degenerates():
    # 'R', 'N' and '-' encode identically -> same dedup key
    # (reference cluster.rs:46-48 dedups on the packed encoding).
    assert dedup_key(encode_bytes(b"ARA")) == dedup_key(encode_bytes(b"A-A"))
    assert dedup_key(encode_bytes(b"ARA")) != dedup_key(encode_bytes(b"AGA"))


def test_windowset_push_and_errors():
    ws = WindowSet(version=2)
    ws.push(encode_bytes(b"ACGT"))
    ws.push(encode_bytes(b"TTTT"))
    assert len(ws) == 2
    assert ws.get_as_string(0) == "ACGT"
    assert ws.decoded_strings() == ["ACGT", "TTTT"]
    with pytest.raises(LengthMismatchError, match="WindowSet seq length is 4, got a new sequence of length 3"):
        ws.push(encode_bytes(b"ACG"))
    with pytest.raises(LengthMismatchError, match="Cannot compute distances between seq of length 5 and windows of lengths 4"):
        ws.check_query_length(5)
    ws2 = WindowSet()
    with pytest.raises(LengthMismatchError, match="Cannot add empty sequence"):
        ws2.push(np.empty(0, dtype=np.uint8))


def test_windowset_growth():
    ws = WindowSet()
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 5, size=(100, 9)).astype(np.uint8)
    ws.push_batch(rows)
    np.testing.assert_array_equal(ws.codes, rows)
