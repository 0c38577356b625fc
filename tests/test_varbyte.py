from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hunt_ray.common.varbyte import (
    delta_decode,
    delta_encode,
    segmented_delta_decode,
    segmented_delta_encode,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_golden():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    assert vb_decode(vb_encode(vals)).tolist() == vals.tolist()


def test_vb_known_bytes():
    # LEB128: 300 = 0b10_0101100 -> 0xAC 0x02
    assert vb_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert vb_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vb_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert vb_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_vb_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert vb_decode(vb_encode(vals)).tolist() == xs


def test_delta_roundtrip():
    v = np.array([3, 10, 10, 400, 2**40], dtype=np.uint64)
    assert delta_decode(delta_encode(v)).tolist() == v.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**32), min_size=1, max_size=20), max_size=10))
def test_segmented_delta_roundtrip(segments):
    segments = [sorted(s) for s in segments]
    flat = np.array([x for s in segments for x in s], dtype=np.uint64)
    offsets = np.cumsum([0] + [len(s) for s in segments])
    enc = segmented_delta_encode(flat, offsets)
    dec = segmented_delta_decode(enc, offsets)
    assert dec.tolist() == flat.tolist()
