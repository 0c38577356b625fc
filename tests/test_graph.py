"""Link-graph pipelines (hunt_ray/pipelines/graph.py): degree rollup and
distributed PageRank, each against its DuckDB oracle plus structural
invariants (mass conservation, sink handling)."""

from __future__ import annotations

import importlib.util

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_graph", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _oracle(entry, key: str, sf: str = SF) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con.execute(entry.oracle_sql()[key]).df()


def _assert_matches(entry, key: str) -> pd.DataFrame:
    got = entry.queries()[key](SF).to_pandas()
    want = _oracle(entry, key)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    return got


def test_link_degree_matches_oracle(entry):
    got = _assert_matches(entry, "q_link_degree")
    # every doc derives 3 out-links, minus in-doc collisions; in-degree
    # redistributes but totals match
    assert got.out_degree.between(1, 3).all()
    assert got.out_degree.sum() == got.in_degree.sum()


def test_pagerank_matches_oracle(entry):
    got = _assert_matches(entry, "q_pagerank")
    # mass conservation: scaled ranks average 1.0 (no dangling loss)
    assert abs(got.pr_scaled.mean() - 1.0) < 1e-6
    assert (got.pr_scaled > 0).all()
    # the graph is non-regular, so ranks must actually spread
    assert got.pr_scaled.nunique() > 10


def test_pagerank_sink_gets_teleport_only():
    """A node nobody links to converges to the pure teleport share."""
    from hunt_ray.pipelines import graph

    got = graph.pagerank(SF, iterations=5).to_pandas()
    deg = graph.link_degree(SF).to_pandas()
    sinks = set(deg[deg.in_degree == 0].doc_id)
    if sinks:  # teleport-only rank, N-scaled: (1-d)
        vals = got[got.node.isin(sinks)].pr_scaled
        assert np.allclose(vals, 0.15, atol=1e-6)
