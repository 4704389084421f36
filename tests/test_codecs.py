"""Varbyte / delta codec roundtrips, including property-based fuzzing."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_codesearch.codecs import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode([]) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode([]) == b""
    assert delta_decode(b"").size == 0


def test_known_values():
    # 0..127 -> 1 byte; 128 -> 2 bytes
    assert varbyte_encode([0]) == b"\x00"
    assert varbyte_encode([1]) == b"\x01"
    assert varbyte_encode([127]) == b"\x7f"
    assert varbyte_encode([128]) == bytes([0x80, 0x01])
    assert list(varbyte_decode(bytes([0x80, 0x01]))) == [128]


def test_roundtrip_simple():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40 + 7]
    assert list(varbyte_decode(varbyte_encode(vals))) == vals


def test_delta_roundtrip():
    ids = [3, 7, 8, 100, 101, 5000, 10**9]
    assert list(delta_decode(delta_encode(ids))) == ids


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode([5, 3])
    with pytest.raises(ValueError):
        delta_encode([5, 5])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varbyte_property(vals):
    assert list(varbyte_decode(varbyte_encode(vals))) == vals


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**50), max_size=300))
def test_delta_property(ids):
    ids = sorted(ids)
    assert list(delta_decode(delta_encode(ids))) == ids


def test_compression_ratio_dense_ids():
    # dense sorted ids compress to ~1 byte/id
    ids = np.arange(10_000, 20_000, dtype=np.int64)
    enc = delta_encode(ids)
    assert len(enc) < len(ids) * 1.1 + 4
