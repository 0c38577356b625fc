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


def ensure_schema(ds, schema):
    """Contract guard for pipelines whose legitimate output can be EMPTY
    (no duplicate pairs, no contaminated docs, …): when every upstream
    row dies, Ray Data's all-to-all stages emit zero-row bundles with NO
    schema — map_batches never calls the UDF on them, ``Dataset.schema()``
    returns None, and a downstream ``to_pandas()`` silently loses the
    declared columns (caught by perturbed_sweep ``--mode empty --rate
    0.8``; even with typed 0-row blocks, ``Dataset.to_pandas()`` on a
    0-row dataset returns a COLUMN-LESS frame). No lazy in-plan repair
    exists (empty bundles bypass UDFs), and a bare schema peek would
    re-execute the plan for the real consumer — so materialize ONCE
    (these outputs are the REDUCED side of their pipelines: near-dup
    pairs, flagged docs, per-doc stats — orders smaller than the corpus,
    and the cached blocks serve every later read), and hand back the
    declared typed empty ``pa.Table`` whenever the result has no rows."""
    import pyarrow as pa

    assert isinstance(schema, pa.Schema)
    mat = ds.materialize()
    s = mat.schema()
    if s is None or not s.names or mat.count() == 0:
        return schema.empty_table()
    return mat


def as_dataset(x):
    """Lift a pipeline result back into a Dataset for further composition:
    :func:`ensure_schema` hands back a typed empty ``pa.Table`` when a
    stream produced no rows (the only representation whose ``to_pandas``
    keeps the declared columns — even a single-typed-empty-block Dataset
    loses them), so internal consumers that keep composing (union,
    map_batches, …) route through this."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(x) if isinstance(x, pa.Table) else x
