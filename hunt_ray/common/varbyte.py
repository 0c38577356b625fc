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


def vb_encode(values: np.ndarray) -> bytes:
    """Encode an array of non-negative ints as a LEB128 byte stream."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = 64 - np.zeros_like(v)  # placeholder; computed below
    # bit length via log-free ladder: compare against powers of 2^7
    nb = np.ones(v.shape, dtype=np.int64)
    thresh = _U64(1) << _U64(7)
    while True:
        mask = v >= thresh
        if not mask.any():
            break
        nb[mask] += 1
        if int(thresh) >= (1 << 57):  # next shift would overflow past 64 bits
            # values >= 2^63 handled: max nb for uint64 is 10
            big = v >= (_U64(1) << _U64(63))
            nb[big] = np.maximum(nb[big], 10)
            break
        thresh = thresh << _U64(7)
    del nbits
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nb)
    starts = ends - nb
    max_nb = int(nb.max())
    for j in range(max_nb):
        sel = nb > j
        idx = starts[sel] + j
        chunk = (v[sel] >> _U64(7 * j)) & _U64(0x7F)
        cont = (nb[sel] - 1) > j
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


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
    segment must be ascending. Used for per-doc position lists.
    """
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
    starts = starts[(starts > 0) & (starts < d.size)]
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
