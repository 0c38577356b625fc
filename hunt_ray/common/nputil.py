"""Small shared numpy helpers for segmented (ragged) array work."""

from __future__ import annotations

import numpy as np


def gather_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Indices covering [starts[i], starts[i]+lengths[i]) per segment."""
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(lengths)
    offs = ends - lengths
    return (np.repeat(np.asarray(starts, np.int64), lengths)
            + (np.arange(total, dtype=np.int64) - np.repeat(offs, lengths)))


def ordinal_codes(dict_values: list, codes: np.ndarray) -> tuple[np.ndarray, list]:
    """Map dictionary codes to lexicographic-ordinal codes.

    Returns (ordinal array aligned with codes, values sorted lexicographically).
    """
    order = sorted(range(len(dict_values)), key=lambda i: dict_values[i])
    rank = np.empty(len(dict_values), dtype=np.int64)
    for r, i in enumerate(order):
        rank[i] = r
    return rank[codes], [dict_values[i] for i in order]
