"""Direct tests of the ``sorted_groups`` co-location contract.

Every round-4 grouped fold (dedup attach/verify, bucket pairs, connected
components, sessionize, as-of, snapshot dedup, source caps) rides on one
invariant: after ``ds.sort(keys)``, a key group never spans two blocks, so
a whole-block kernel that derives group boundaries itself sees every group
complete. Ray guarantees this because the range partitioner assigns rows
to partitions by ``searchsorted(boundaries, key)`` — equal keys always
compare identically against every boundary. These tests pin the invariant
(and the helper's pass-through semantics) against adversarial inputs:
skewed key mass, many distinct keys across many small input blocks, and
empty inputs.

All kernels are defined INSIDE the tests: closures are pickled by value,
while module-level functions of a test file are pickled by reference to a
module Ray workers cannot import.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


def _make_ds(keys: np.ndarray, vals: np.ndarray, n_blocks: int):
    import ray.data as rd

    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    return rd.from_arrow(t).repartition(n_blocks)


def _audit_kernel():
    """Factory → closure: one row per key group in the block with its size
    and value-sum. If a group were split across blocks, the same key would
    surface from two audit rows and the uniqueness assert would fail."""

    def group_audit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.int64())})
        k = batch.column("k").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        assert bool(np.all(k[1:] >= k[:-1])), "block not sorted by key"
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        vsum = np.add.reduceat(v, starts)
        return pa.table({"k": pa.array(k[starts], pa.int64()),
                         "n": pa.array(ends - starts, pa.int64()),
                         "vsum": pa.array(vsum, pa.int64())})

    return group_audit


@pytest.mark.parametrize("dist", ["uniform", "skewed", "few_heavy"])
def test_groups_never_split_across_blocks(dist):
    from hunt_ray.common.grouped import sorted_groups

    rng = np.random.default_rng(11)
    n = 20_000
    if dist == "uniform":
        keys = rng.integers(0, 2_000, size=n)
    elif dist == "skewed":  # zipf-ish: a few keys own most of the mass
        keys = (rng.zipf(1.3, size=n) % 500).astype(np.int64)
    else:  # 3 heavy keys + a long unique tail
        keys = np.r_[np.repeat([7, 8, 9], 5_000),
                     np.arange(10_000, 10_000 + n - 15_000)]
    vals = rng.integers(0, 1_000, size=n).astype(np.int64)

    out = sorted_groups(_make_ds(keys, vals, 37), "k",
                        _audit_kernel()).to_pandas()

    # each key surfaces from exactly ONE block's audit row…
    assert out["k"].is_unique, "a key group was split across blocks"
    # …and the per-group size/sum equal the global truth (nothing lost)
    import pandas as pd

    want = (pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"]
            .agg(["size", "sum"]).reset_index())
    got = out.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n"].tolist() == want["size"].tolist()
    assert got["vsum"].tolist() == want["sum"].tolist()


def test_multi_key_groups_never_split():
    from hunt_ray.common.grouped import sorted_groups

    rng = np.random.default_rng(5)
    n = 10_000
    t = pa.table({
        "a": pa.array(rng.integers(0, 50, size=n), pa.int64()),
        "b": pa.array(rng.integers(0, 40, size=n), pa.int64()),
    })
    import ray.data as rd

    ds = rd.from_arrow(t).repartition(23)

    def audit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        ends = np.r_[starts[1:], len(a)]
        return pa.table({"a": pa.array(a[starts], pa.int64()),
                         "b": pa.array(b[starts], pa.int64()),
                         "n": pa.array(ends - starts, pa.int64())})

    out = sorted_groups(ds, ["a", "b"], audit).to_pandas()
    assert not out.duplicated(["a", "b"]).any(), \
        "a composite key group was split across blocks"
    assert int(out["n"].sum()) == n


def test_empty_and_single_group_inputs():
    from hunt_ray.common.grouped import sorted_groups

    empty = _make_ds(np.array([], np.int64), np.array([], np.int64), 1)
    assert sorted_groups(empty, "k", _audit_kernel()).count() == 0

    one = _make_ds(np.zeros(1_000, np.int64), np.arange(1_000), 8)
    out = sorted_groups(one, "k", _audit_kernel()).to_pandas()
    assert len(out) == 1 and int(out["n"][0]) == 1_000
