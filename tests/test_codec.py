"""Codec invariants — encode∘decode == identity (the posting-side analog
of the reference's is_sorted/LCP validation, Suffix_Array.cpp:512-536)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from capsbm25.codec import (
    decode_varints,
    delta_decode,
    delta_encode,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(arr)).tolist() == vals


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    assert delta_decode(delta_encode(arr)).tolist() == sorted(vals)


def test_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0
    assert delta_decode(delta_encode(np.array([], dtype=np.int64))).size == 0


def test_non_increasing_rejected():
    import pytest

    with pytest.raises(ValueError):
        delta_encode(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 2], dtype=np.int64))


def test_single_byte_density():
    # gaps < 128 must take exactly one byte (index size matters at scale)
    ids = np.arange(0, 1000, dtype=np.int64)
    assert len(delta_encode(ids)) == 1000


@given(
    st.lists(st.integers(min_value=0, max_value=1000), unique=True),
    st.lists(st.integers(min_value=0, max_value=1000), max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_sorted_member_mask_matches_isin(ids, vals):
    from capsbm25.codec import sorted_member_mask

    s = np.array(sorted(ids), dtype=np.int64)
    v = np.array(vals, dtype=np.int64)
    got = sorted_member_mask(s, v)
    assert got.dtype == bool and got.shape == v.shape
    assert (got == np.isin(v, s)).all()


def test_decode_varints_rejects_overlong_varint():
    """Round-6 review: an 11+-byte varint is corruption; the uint64
    shift would silently WRAP (numpy shifts mod 64) — it must raise
    like the truncation path does."""
    import pytest

    from capsbm25.codec import decode_varints

    with pytest.raises(ValueError, match="10 bytes"):
        decode_varints(bytes([0x81] * 11 + [0x01]))
    # 10 bytes is the legal uint64 maximum and still decodes
    assert decode_varints(
        bytes([0xFF] * 9 + [0x01])).tolist() == [2 ** 63 + (2 ** 63 - 1)]
