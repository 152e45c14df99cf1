"""Codec round-trips incl. the reference's edge vectors (FIXTURES.md §3
golden_codec: 1-byte values, multi-byte 130/16384, singletons)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from news_information_retrieval_system_ray.functions.codecs import (
    decode_sorted_ids,
    delta_decode,
    delta_encode,
    encode_sorted_ids,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_known_vectors():
    # 0 and 127 -> one byte; 128 -> two bytes (little-endian base-128)
    assert vbyte_encode(np.array([0])) == b"\x00"
    assert vbyte_encode(np.array([127])) == b"\x7f"
    assert vbyte_encode(np.array([128])) == b"\x80\x01"
    assert vbyte_encode(np.array([130])) == b"\x82\x01"
    assert vbyte_encode(np.array([16384])) == b"\x80\x80\x01"
    assert list(vbyte_decode(b"\x82\x01")) == [130]


@pytest.mark.parametrize("vals", [[], [0], [1], [127, 128, 129], [16384], [2**40, 2**63 - 1], list(range(1000))])
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(vbyte_decode(vbyte_encode(arr))) == vals


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = vbyte_decode(vbyte_encode(arr))
    assert list(out) == vals


def test_delta_requires_strictly_increasing():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 3]))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 4]))


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_sorted_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    out = decode_sorted_ids(encode_sorted_ids(arr))
    assert list(out) == sorted(ids)


def test_delta_roundtrip_singleton():
    assert list(delta_decode(delta_encode(np.array([42])))) == [42]


# ---------------------------------------------------------------- Elias codecs

from news_information_retrieval_system_ray.functions.codecs import (  # noqa: E402
    delta_elias_decode,
    delta_elias_encode,
    gamma_decode,
    gamma_encode,
)


def test_gamma_known_values():
    # 1 -> '1'; 2 -> '010'; 3 -> '011'; 4 -> '00100' (classic Elias-Gamma)
    assert gamma_encode(np.array([1], dtype=np.uint64)) == bytes([0b10000000])
    assert gamma_encode(np.array([2], dtype=np.uint64)) == bytes([0b01000000])
    assert gamma_encode(np.array([4], dtype=np.uint64)) == bytes([0b00100000])


def test_gamma_rejects_zero():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        gamma_encode(np.array([0], dtype=np.uint64))
    with _pytest.raises(ValueError):
        delta_elias_encode(np.array([0], dtype=np.uint64))


@given(st.lists(st.integers(min_value=1, max_value=2**32), min_size=0, max_size=100))
@settings(max_examples=150, deadline=None)
def test_gamma_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(gamma_decode(gamma_encode(arr), len(vals))) == vals


@given(st.lists(st.integers(min_value=1, max_value=2**32), min_size=0, max_size=100))
@settings(max_examples=150, deadline=None)
def test_elias_delta_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(delta_elias_decode(delta_elias_encode(arr), len(vals))) == vals


def test_elias_delta_beats_gamma_on_large_values():
    vals = np.arange(10_000, 10_100, dtype=np.uint64)
    assert len(delta_elias_encode(vals)) < len(gamma_encode(vals))
