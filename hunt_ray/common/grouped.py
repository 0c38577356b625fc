"""Whole-block grouped map: ``groupby(keys).map_groups`` without the
per-group UDF loop.

Ray Data's ``GroupedData.map_groups`` is internally ``sort(keys)`` (which
range-partitions so every key group lands whole inside one block) followed
by ``map_batches(batch_size=None)`` with a wrapper that slices the block
into per-group sub-tables and calls the UDF once per group. For
high-cardinality keys (per-document, per-user, per-LSH-bucket — billions
of groups at web scale) that wrapper is one Python call, one table slice
and one batch-format conversion PER GROUP, dwarfing the vectorized work
inside.

:func:`sorted_groups` keeps the identical co-location shuffle but hands
the WHOLE sorted block to a kernel that is vectorized across groups
(numpy ``lexsort``/``reduceat``/boundary masks). Every kernel passed here
must therefore be multi-group-safe: it derives group boundaries itself
and must not assume a single key value per batch.
"""

from __future__ import annotations

from typing import Callable, Sequence


def sorted_groups(ds, keys: str | Sequence[str], fn: Callable, *,
                  batch_format: str = "pyarrow", **map_kwargs):
    """``ds.sort(keys).map_batches(fn, batch_size=None)`` — the map_groups
    shuffle with a per-BLOCK vectorized kernel. ``fn`` receives blocks
    containing one or more complete key groups (never a split group)."""
    return ds.sort(keys).map_batches(
        fn, batch_size=None, batch_format=batch_format, **map_kwargs)
