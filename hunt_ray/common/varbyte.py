"""Vectorized LEB128 (varbyte) codec over numpy uint64 arrays.

The reference stores postings as varint streams (Hunt's segment writer,
``hunt-searchengine/src/Hunt/SegmentIndex/Directory/TermInfos.hs:206-221`` and
the varint combinators in ``IO/Write.hs:87-103``). We reimplement the codec
with numpy so encode/decode of a whole posting block is a handful of
vectorized passes instead of a per-int Python loop.

Format: little-endian base-128; low 7 bits per byte, high bit set on every
byte except the last byte of a value.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def vb_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode and also return per-value byte lengths (for stream splitting).

    Preserves narrow unsigned dtypes (u8/u16/u32) to keep temporary
    allocations small — this path runs over tens of millions of positions
    per merge task, where fresh-page footprint dominates on cold heaps.
    """
    if values.dtype in (np.uint8, np.uint16, np.uint32):
        v = np.ascontiguousarray(values)
    else:
        v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.empty(0, np.int64)
    nb = _byte_lengths(v)
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nb)
    starts = ends - nb
    max_nb = int(nb.max())
    dt = v.dtype.type
    for j in range(max_nb):
        sel = nb > j
        idx = starts[sel] + j
        chunk = (v[sel] >> dt(7 * j)).astype(np.uint8) & np.uint8(0x7F)
        cont = (nb[sel] - 1) > j
        out[idx] = chunk | (cont.astype(np.uint8) << 7)
    return out.tobytes(), nb


def _byte_lengths(v: np.ndarray) -> np.ndarray:
    """ceil(bit_length/7) per value, min 1 — computed in the input dtype."""
    dt = v.dtype.type
    bits = v.dtype.itemsize * 8
    nb = np.ones(v.shape, dtype=np.int32)
    shift = 7
    while shift < bits:
        mask = v >= (dt(1) << dt(shift))
        if not mask.any():
            break
        nb[mask] += 1
        if shift + 7 >= bits:
            break
        shift += 7
    return nb


def vb_encode(values: np.ndarray) -> bytes:
    """Encode an array of non-negative ints as a LEB128 byte stream."""
    buf, _nb = vb_encode_with_lengths(np.asarray(values))
    return buf


def vb_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte stream into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    pos_in_val = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & 0x7F).astype(_U64) << (_U64(7) * pos_in_val.astype(_U64))
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """First value kept, the rest replaced by gaps (input must be ascending)."""
    v = np.ascontiguousarray(sorted_values, dtype=_U64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=_U64)
    return np.cumsum(d, dtype=_U64)


def segmented_delta_encode(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Delta-encode each segment independently.

    ``offsets`` are pyarrow-style boundaries (len = nsegments + 1). Each
    segment must be ascending. Used for per-doc position lists. The input
    dtype is preserved (ascending segments never wrap), keeping temporaries
    narrow for the hot u32 position path.
    """
    if values.dtype in (np.uint8, np.uint16, np.uint32, np.uint64):
        v = np.ascontiguousarray(values)
    else:
        v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    starts = starts[(starts >= 0) & (starts < v.size)]
    out[starts] = v[starts]  # reset at segment starts
    return out


def segmented_delta_decode(deltas: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=_U64)
    if d.size == 0:
        return d
    out = np.cumsum(d, dtype=_U64)
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    # unique: empty segments duplicate a start index, and the correction
    # below must count each distinct start's increment exactly once
    starts = np.unique(starts[(starts > 0) & (starts < d.size)])
    if starts.size:
        # subtract, per segment, the running total accumulated before its
        # start: cumsum of per-start increments yields a step function that
        # equals out[start-1] throughout each segment (mod 2^64 arithmetic)
        pre = out[starts - 1]
        inc = np.empty_like(pre)
        inc[0] = pre[0]
        np.subtract(pre[1:], pre[:-1], out=inc[1:])
        correction = np.zeros(d.size, dtype=_U64)
        correction[starts] = inc
        np.cumsum(correction, dtype=_U64, out=correction)
        out = out - correction
    return out
