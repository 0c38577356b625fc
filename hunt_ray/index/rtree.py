"""STR-packed R-tree over geo position keys — the structural analog of the
reference's ``SimpleRTreeIndex`` (``Hunt/Index/RTreeIndex.hs:120-180``,
``Data.RTree.Strict`` + MBB), built for the immutable-per-generation index:
one Sort-Tile-Recursive bulk load per (partition, context), no incremental
inserts (a new generation re-packs, like every other structure here).

Keyspace. Position keys are the analyzer's bit-interleaved sign+binary
strings (``Position.hs:61-68`` — lat bits at even offsets, lon at odd).
Each dimension's 32-char ``0``/``1`` string compares lexicographically
exactly like its value as a big-endian uint32, so the tree stores each
dimension as uint32 and reproduces ``position_in_range``'s semantics
bit-for-bit — including the reference's sign-magnitude quirk for negative
coordinates (``normalize.py:position_in_range``): no re-decoding, no
float round-trips.

Why a real R-tree when the sorted dictionary already answers rectangles:
the Z-order scan walks every key in ``[interleave(rect_min),
interleave(rect_max)]`` — a superset that degrades badly for wide, flat
rectangles (a thin band across the map Z-covers nearly the whole
keyspace). The packed tree prunes by BOTH dimensions at every level, so
visited nodes track the rectangle's true selectivity. Measured on 200k
uniform points: a thin lat band with 390 hits makes the Z-scan visit
166,574 dictionary entries (83% of the keyspace, 427× the hit count,
each needing the per-key 2-dim filter) where the tree answers in 0.4 ms;
an aligned small box is the Z-scan's best case and the two tie.

Scale shape: the tree lives inside one partition's reader (bounded by the
partition's vocabulary), is built lazily on first rectangle query and
cached; query work is vectorized numpy over per-level bound arrays.
"""

from __future__ import annotations

import math

import numpy as np

_POW31 = None  # lazily built weights, kept module-level


def decode_dims(keys) -> tuple[np.ndarray, np.ndarray]:
    """De-interleave N 64-char position keys into (lat, lon) uint32 arrays.

    Accepts a list of str or an Arrow (large_)string array; for Arrow the
    decode reads the values buffer zero-copy (all keys are exactly 64
    ASCII chars, so the buffer slice is a dense (n, 64) byte matrix — no
    Python string materialization)."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.uint32), np.empty(0, np.uint32)
    try:
        import pyarrow as pa

        is_arrow = isinstance(keys, (pa.Array, pa.ChunkedArray))
    except ImportError:  # pragma: no cover
        is_arrow = False
    if is_arrow:
        import pyarrow as pa

        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        odt = np.int64 if pa.types.is_large_string(keys.type) else np.int32
        off = np.frombuffer(keys.buffers()[1], odt)[
            keys.offset:keys.offset + n + 1]
        if not bool((np.diff(off) == 64).all()):
            raise ValueError("position dictionary has a non-64-char key")
        values = np.frombuffer(keys.buffers()[2], np.uint8)
        buf = values[int(off[0]):int(off[-1])].reshape(n, 64)
    else:
        buf = np.frombuffer("".join(keys).encode("ascii"), np.uint8).reshape(n, 64)
    bits = (buf - ord("0")).astype(bool)
    lat = np.packbits(bits[:, 0::2], axis=1).view(">u4").ravel().astype(np.uint32)
    lon = np.packbits(bits[:, 1::2], axis=1).view(">u4").ravel().astype(np.uint32)
    return lat, lon


def decode_key(key: str) -> tuple[int, int]:
    """One interleaved key → (lat, lon) ints in dictionary keyspace order."""
    return int(key[0::2], 2), int(key[1::2], 2)


def _segmented_arange(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate arange(s, e) for each (s, e) pair — vectorized."""
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    base = np.repeat(starts, counts)
    csum = np.cumsum(counts) - counts
    return base + (np.arange(total, dtype=np.int64) - np.repeat(csum, counts))


class STRTree:
    """Packed R-tree: STR bulk load, implicit level arrays, vectorized
    top-down rectangle queries returning positions into the input arrays."""

    LEAF = 64     # points per leaf
    FANOUT = 16   # children per internal node

    def __init__(self, lat: np.ndarray, lon: np.ndarray):
        n = len(lat)
        self.n = n
        if n == 0:
            self.order = np.empty(0, np.int64)
            self.levels: list[tuple[np.ndarray, ...]] = []
            return
        # STR: sort by lat, cut into ~sqrt(n_leaves) vertical slices, sort
        # each slice by lon, chop into leaves of LEAF points
        n_leaves = math.ceil(n / self.LEAF)
        n_slices = max(1, math.ceil(math.sqrt(n_leaves)))
        slice_sz = math.ceil(n / n_slices)
        order = np.argsort(lat, kind="stable")
        for i in range(n_slices):
            sl = slice(i * slice_sz, min((i + 1) * slice_sz, n))
            sub = order[sl]
            order[sl] = sub[np.argsort(lon[sub], kind="stable")]
        self.order = order
        slat = lat[order].astype(np.uint32)
        slon = lon[order].astype(np.uint32)
        # leaf level bounds via reduceat over LEAF-sized runs
        starts = np.arange(0, n, self.LEAF)
        level = (np.minimum.reduceat(slat, starts), np.maximum.reduceat(slat, starts),
                 np.minimum.reduceat(slon, starts), np.maximum.reduceat(slon, starts))
        self.slat, self.slon = slat, slon
        self.levels = [level]
        while len(self.levels[-1][0]) > 1:
            lmin, lmax, omin, omax = self.levels[-1]
            starts = np.arange(0, len(lmin), self.FANOUT)
            self.levels.append((np.minimum.reduceat(lmin, starts),
                                np.maximum.reduceat(lmax, starts),
                                np.minimum.reduceat(omin, starts),
                                np.maximum.reduceat(omax, starts)))

    def query(self, lat_lo: int, lat_hi: int, lon_lo: int, lon_hi: int
              ) -> np.ndarray:
        """Positions (into the constructor arrays) of points inside the
        closed rectangle, ascending."""
        if self.n == 0 or lat_lo > lat_hi or lon_lo > lon_hi:
            return np.empty(0, np.int64)
        # descend from the root level to leaves, keeping intersecting nodes
        cand = np.zeros(1, np.int64)  # root index at the top level
        for li in range(len(self.levels) - 1, -1, -1):
            lmin, lmax, omin, omax = self.levels[li]
            hit = ((lmin[cand] <= lat_hi) & (lmax[cand] >= lat_lo)
                   & (omin[cand] <= lon_hi) & (omax[cand] >= lon_lo))
            cand = cand[hit]
            if not len(cand):
                return np.empty(0, np.int64)
            if li > 0:  # expand to children in the next level down
                n_next = len(self.levels[li - 1][0])
                starts = cand * self.FANOUT
                ends = np.minimum(starts + self.FANOUT, n_next)
                cand = _segmented_arange(starts, ends)
        # leaf candidates → point ranges → exact containment
        starts = cand * self.LEAF
        ends = np.minimum(starts + self.LEAF, self.n)
        pts = _segmented_arange(starts, ends)
        inside = ((self.slat[pts] >= lat_lo) & (self.slat[pts] <= lat_hi)
                  & (self.slon[pts] >= lon_lo) & (self.slon[pts] <= lon_hi))
        out = self.order[pts[inside]]
        out.sort()
        return out

    def query_keys(self, lb: str, ub: str) -> np.ndarray:
        """Rectangle spanned by two interleaved corner keys — the
        ``lookupRange k1 k2 = lookup (unionMBB k1 k2)`` semantics of
        ``RTreeIndex.hs:88-89``."""
        la0, lo0 = decode_key(lb)
        la1, lo1 = decode_key(ub)
        return self.query(min(la0, la1), max(la0, la1),
                          min(lo0, lo1), max(lo0, lo1))
