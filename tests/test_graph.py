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


# ----------------------------------------------- generic operator (r4)

# explicit edge table with real sinks: nodes 5 and 6 have NO out-edges
# (dangling); node 6 also has no in-edges (pure teleport + dangling share)
_EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 3), (4, 5), (1, 5)]
_N_NODES = 7


def _pagerank_oracle_df(iterations: int = 5, damping: float = 0.85) -> pd.DataFrame:
    """DuckDB unrolled-iteration oracle with dangling-mass redistribution."""
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(f"({s}, {d})" for s, d in _EDGES)
    con.execute(f"CREATE TABLE edges(src BIGINT, dst BIGINT); "
                f"INSERT INTO edges VALUES {vals}")
    con.execute("CREATE TABLE nodes AS SELECT unnest(range(0, "
                f"{_N_NODES})) AS node")
    it = f"SELECT node, 1.0/{_N_NODES} AS rank FROM nodes"
    for _ in range(iterations):
        it = f"""
WITH prev AS ({it}),
od AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY 1),
dang AS (SELECT coalesce(sum(p.rank), 0) AS mass FROM prev p
         LEFT JOIN od ON od.src = p.node WHERE od.src IS NULL)
SELECT n.node,
       (1-{damping})/{_N_NODES}
       + {damping} * ((SELECT mass FROM dang)/{_N_NODES}
                      + coalesce(sum(p.rank / od.deg), 0)) AS rank
FROM nodes n
LEFT JOIN edges e ON e.dst = n.node
LEFT JOIN prev p ON p.node = e.src
LEFT JOIN od ON od.src = e.src
GROUP BY n.node"""
    return con.execute(f"SELECT node, rank FROM ({it}) ORDER BY node").df()


def test_pagerank_edges_sinks_match_duckdb_oracle():
    """pagerank_edges over an explicit (src, dst) table with sinks must
    match the unrolled-CTE oracle including dangling-mass redistribution,
    and conserve total mass."""
    import pyarrow as pa
    import ray.data as rd

    from hunt_ray.pipelines.graph import pagerank_edges

    edges = rd.from_arrow(pa.table({
        "src": pa.array([s for s, _ in _EDGES], pa.int64()),
        "dst": pa.array([d for _, d in _EDGES], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(list(range(_N_NODES)), pa.int64())}))
    got = (pagerank_edges(edges, nodes=nodes, iterations=5)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = _pagerank_oracle_df(iterations=5)
    assert list(got.node) == list(want.node)
    assert np.allclose(got["rank"], want["rank"], atol=1e-12)
    # dangling redistribution keeps Σrank == 1
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # node 6 is isolated: teleport + its dangling share only
    assert got.loc[got.node == 6, "rank"].iloc[0] < got["rank"].mean()


def test_pagerank_edges_infers_node_universe():
    """Without an explicit nodes Dataset, the universe is distinct(src∪dst)
    — node 6 (isolated) is then absent but mass still conserves over the
    6 reachable nodes."""
    import pyarrow as pa
    import ray.data as rd

    from hunt_ray.pipelines.graph import pagerank_edges

    edges = rd.from_arrow(pa.table({
        "src": pa.array([s for s, _ in _EDGES], pa.int64()),
        "dst": pa.array([d for _, d in _EDGES], pa.int64())}))
    got = pagerank_edges(edges, iterations=3).to_pandas()
    assert sorted(got.node) == [0, 1, 2, 3, 4, 5]
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_fast_path_matches_generic():
    """The derived-graph one-shuffle wrapper and the generic attach-shuffle
    operator agree on the same graph (they share _spread_ranks but take
    different physical plans)."""
    import pyarrow.compute as pc

    from hunt_ray.pipelines import graph

    n = graph.n_docs(SF)
    edges = graph.link_edges(SF)
    generic = (graph.pagerank_edges(edges, iterations=3)
               .to_pandas().sort_values("node").reset_index(drop=True))
    fast = graph.pagerank(SF, iterations=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert list(generic.node) == list(fast.node)
    assert np.allclose(generic["rank"] * n, fast["pr_scaled"], atol=1e-6)


def test_n_docs_rejects_noncontiguous_ids(tmp_path):
    """The derived-edge invariant (doc_ids exactly 0..n-1) is enforced, not
    assumed (ADVICE r3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines import graph

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([0, 1, 5], pa.int64())}),
                   str(d / "documents.parquet"))
    with pytest.raises(ValueError, match="contiguous"):
        graph.n_docs(str(d))


def test_spread_ranks_empty_batch():
    """Ray can hand empty blocks to map_batches after shuffles; the spread
    kernel must pass them through (ADVICE r3)."""
    import pyarrow as pa

    from hunt_ray.pipelines.graph import _spread_ranks

    out = _spread_ranks(np.empty(0, np.int64), np.empty(0, np.float64),
                        np.empty(0, np.int64), np.empty(0, np.int64))
    assert out.num_rows == 0
    assert out.schema.names == ["node", "rank"]


def test_pagerank_edges_restricts_explicit_universe():
    """Edges to a dst outside an explicit node universe must not create
    phantom rank rows or leak teleport mass (restricted-PageRank)."""
    import pyarrow as pa
    import ray.data as rd

    from hunt_ray.pipelines.graph import pagerank_edges

    edges = rd.from_arrow(pa.table({"src": pa.array([0], pa.int64()),
                                    "dst": pa.array([2], pa.int64())}))
    nodes = rd.from_arrow(pa.table({"node": pa.array([0, 1], pa.int64())}))
    out = (pagerank_edges(edges, nodes=nodes, iterations=1).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert out["node"].tolist() == [0, 1]
    # node 0's only edge is dropped -> both nodes dangle -> uniform ranks
    assert abs(float(out["rank"].sum()) - 1.0) < 1e-12
    assert abs(out["rank"][0] - out["rank"][1]) < 1e-12
    # default universe (no nodes arg) still spans src ∪ dst
    out2 = pagerank_edges(edges, iterations=1).to_pandas()
    assert set(out2["node"]) == {0, 2}


def test_extract_links_matches_duckdb(pages_small):
    """Link extraction from stored html must equal an independent DuckDB
    regexp recomputation (same script-strip discipline), per page in
    document order."""
    import duckdb

    import pyarrow.parquet as pq

    from hunt_ray.analyze.html import extract_links

    t = pq.read_table(pages_small, columns=["url", "html"])
    got = dict(zip(t.column("url").to_pylist(),
                   extract_links(t.column("html")).to_pylist()))
    con = duckdb.connect()
    want = con.execute(f"""
SELECT url, regexp_extract_all(
         regexp_replace(decode(html),
                        '<(no)?script[^>]*>.*?</(no)?script>', ' ', 'gs'),
         '<a [^>]*?href="([^"]*)"', 1) AS links
FROM read_parquet('{pages_small}/*.parquet') ORDER BY url""").fetchall()
    assert len(want) == len(got)
    for url, links in want:
        assert got[url] == links, url
    # fixture shape: every page carries exactly LINK_MULT outlinks
    from hunt_ray.fixtures.pages import LINK_MULT
    assert all(len(v) == len(LINK_MULT) for v in got.values())


def test_html_link_edges_derivation(pages_small):
    """html_link_edges recovers exactly the deterministic fixture targets
    (g*m + c + 1) % n for every page."""
    from hunt_ray.fixtures.pages import LINK_MULT
    from hunt_ray.pipelines.graph import html_link_edges

    n = 300
    got = (html_link_edges(pages_small).to_pandas()
           .sort_values(["src", "dst"]).reset_index(drop=True))
    assert len(got) == n * len(LINK_MULT)
    want = sorted((g, (g * m + c + 1) % n)
                  for g in range(n) for c, m in enumerate(LINK_MULT))
    assert list(map(tuple, got[["src", "dst"]].to_numpy())) == want


def test_pagerank_html_matches_duckdb(pages_small):
    """End-to-end Common-Crawl path: stored html → extracted link graph →
    generic PageRank, vs a DuckDB oracle that re-extracts the edges with
    regexp and unrolls the iterations."""
    import duckdb

    from hunt_ray.pipelines.graph import pagerank_html

    n, damping, iterations = 300, 0.85, 4
    got = (pagerank_html(pages_small, iterations=iterations, round_to=None)
           .to_pandas().sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"""
CREATE TABLE edges AS
SELECT TRY_CAST(substr(url, 8) AS BIGINT) AS src,
       TRY_CAST(substr(dst_url, 8) AS BIGINT) AS dst
FROM (SELECT url, unnest(regexp_extract_all(decode(html),
             '<a [^>]*?href="([^"]*)"', 1)) AS dst_url
      FROM read_parquet('{pages_small}/*.parquet'))
WHERE TRY_CAST(substr(url, 8) AS BIGINT) IS NOT NULL
  AND TRY_CAST(substr(dst_url, 8) AS BIGINT) IS NOT NULL""")
    con.execute("CREATE TABLE nodes AS SELECT DISTINCT src AS node FROM edges "
                "UNION SELECT DISTINCT dst FROM edges")
    n_nodes = con.execute("SELECT count(*) FROM nodes").fetchone()[0]
    assert n_nodes == n
    it = f"SELECT node, 1.0/{n_nodes} AS rank FROM nodes"
    for _ in range(iterations):
        it = f"""
WITH prev AS ({it}),
od AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY 1),
dang AS (SELECT coalesce(sum(p.rank), 0) AS mass FROM prev p
         LEFT JOIN od ON od.src = p.node WHERE od.src IS NULL)
SELECT n.node,
       (1-{damping})/{n_nodes}
       + {damping} * ((SELECT mass FROM dang)/{n_nodes}
                      + coalesce(sum(p.rank / od.deg), 0)) AS rank
FROM nodes n
LEFT JOIN edges e ON e.dst = n.node
LEFT JOIN prev p ON p.node = e.src
LEFT JOIN od ON od.src = e.src
GROUP BY n.node"""
    want = con.execute(f"SELECT node, rank FROM ({it}) ORDER BY node").df()
    assert list(got.node) == list(want.node)
    assert np.allclose(got["rank"], want["rank"], atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_pregel_matches_dataset_path(pages_small):
    """The bucketed Pregel plan (edge state resident in the object store,
    only pre-combined (dst, contrib) rows move per iteration) is
    numerically equivalent to the pure-Dataset attach-shuffle plan, at
    one bucket and at several (cross-bucket contribution exchange)."""
    import ray.data as rd

    from hunt_ray.pipelines.graph import (html_link_edges, pagerank_edges,
                                          pagerank_pregel)

    want = (pagerank_edges(html_link_edges(pages_small), iterations=3)
            .to_pandas().sort_values("node").reset_index(drop=True))
    for n_buckets in (1, 5):
        got = (pagerank_pregel(html_link_edges(pages_small), iterations=3,
                               n_buckets=n_buckets)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert list(got.node) == list(want.node)
        assert np.allclose(got["rank"], want["rank"], rtol=1e-12, atol=0)
        assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_pregel_sinks_duplicates_selfloops():
    """Explicit edge list with a sink, a duplicate edge and a self-loop:
    pregel == dataset path (duplicate edges weight the spread, sink mass
    redistributes uniformly)."""
    import pyarrow as pa
    import ray.data as rd

    from hunt_ray.pipelines.graph import pagerank_edges, pagerank_pregel

    edges = pa.table({"src": pa.array([0, 0, 0, 1, 1, 2, 2, 4], pa.int64()),
                      "dst": pa.array([1, 1, 2, 2, 3, 2, 0, 3], pa.int64())})
    want = (pagerank_edges(rd.from_arrow(edges), iterations=5)
            .to_pandas().sort_values("node").reset_index(drop=True))
    got = (pagerank_pregel(rd.from_arrow(edges), iterations=5, n_buckets=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got.node) == list(want.node)
    assert np.allclose(got["rank"], want["rank"], rtol=1e-12, atol=0)
    # empty edge table degrades to an empty result, not a crash
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert pagerank_pregel(empty, iterations=2).count() == 0


def test_anchor_text_matches_duckdb(pages_small):
    """Inlink anchor-text rollup vs a DuckDB regexp oracle over the same
    stored html (same simple-anchor heuristic, exact counts)."""
    import duckdb

    from hunt_ray.pipelines.graph import anchor_text

    got = (anchor_text(pages_small).to_pandas()
           .sort_values(["dst", "anchor"]).reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute(f"""
WITH atags AS (
  SELECT unnest(regexp_extract_all(
         regexp_replace(decode(html),
                        '<(no)?script[^>]*>.*?</(no)?script>', ' ', 'gs'),
         '<a\\s[^>]*?href="[^">]*"[^>]*>[^<]*</a>')) AS atag
  FROM read_parquet('{pages_small}/*.parquet'))
SELECT TRY_CAST(substr(regexp_extract(atag, 'href="([^">]*)"', 1), 8) AS BIGINT) AS dst,
       regexp_extract(atag, '>([^<]*)</a>', 1) AS anchor,
       count(*)::BIGINT AS n_mentions
FROM atags
WHERE regexp_extract(atag, 'href="([^">]*)"', 1) LIKE 'test://%'
  AND TRY_CAST(substr(regexp_extract(atag, 'href="([^">]*)"', 1), 8) AS BIGINT) IS NOT NULL
GROUP BY 1, 2 ORDER BY dst, anchor""").df()
    assert len(got) == len(want)
    assert list(got.dst) == list(want.dst)
    assert list(got.anchor) == list(want.anchor)
    assert list(got.n_mentions) == list(want.n_mentions)


def test_anchor_context_end_to_end(ray_session, pages_small, tmp_path):
    """The full web-search anchor loop: aggregate inlink anchor text per
    target (`anchor_docs`), attach it to the pages table, index it as its
    own context via source="column:anchors", and find a page by a word
    that appears ONLY in other pages' links to it — never in its own
    text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.pipelines.graph import anchor_docs
    from hunt_ray.query.engine import SearchEngine

    ad = anchor_docs(pages_small).to_pandas()
    by_url = dict(zip(ad.url, ad.anchors))
    pages = pq.read_table(pages_small)
    texts = {u: t for u, t in zip(pages.column("url").to_pylist(),
                                  pages.column("text").to_pylist())}
    # a (target, word) where word ∈ inlink anchors but ∉ target's own text
    target = word = None
    for u, anchors in by_url.items():
        own = set(texts.get(u, "").lower().split())
        for w in anchors.lower().split():
            if w.isalpha() and len(w) > 3 and w not in own:
                target, word = u, w
                break
        if target:
            break
    assert target is not None, "fixture should yield an anchor-only word"

    aug = pages.append_column(
        "anchors", pa.array([by_url.get(u, "") for u in
                             pages.column("url").to_pylist()],
                            pa.large_string()))
    d = tmp_path / "pages_anchored"
    d.mkdir()
    pq.write_table(aug, str(d / "p.parquet"))
    schema = {
        "body": ContextSchema(type="text", weight=1.0, default=True,
                              source="text"),
        "anchor": ContextSchema(type="text", weight=2.0, default=True,
                                source="column:anchors"),
    }
    idx = str(tmp_path / "anchor_idx")
    build_index(str(d), idx, BuildConfig(schema=schema, num_partitions=2,
                                         batch_size=64,
                                         analyzer_concurrency=2))
    eng = SearchEngine(idx)
    hits = {h.url for h in eng.search(f'anchor:{word}', limit=0).result}
    assert target in hits
    # the word is genuinely anchor-only for the target: body-context
    # search must not return it
    body_hits = {h.url for h in eng.search(f'body:{word}', limit=0).result}
    assert target not in body_hits


def test_hits_pregel_matches_numpy_oracle(pages_small):
    """HITS over the extracted link graph vs an independent dense
    power-iteration oracle (adjacency with duplicate-edge multiplicity,
    L2 normalize per half-step), at one bucket and several."""
    import numpy as np

    from hunt_ray.pipelines.graph import hits_html, html_link_edges

    edges = html_link_edges(pages_small).to_pandas()
    nodes = np.unique(np.concatenate([edges.src.values, edges.dst.values]))
    pos = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in zip(edges.src.values, edges.dst.values):
        A[pos[s], pos[d]] += 1.0
    hub = np.ones(len(nodes))
    for _ in range(3):
        auth = A.T @ hub
        auth /= np.linalg.norm(auth) or 1.0
        hub = A @ auth
        hub /= np.linalg.norm(hub) or 1.0
    for n_buckets in (1, 5):
        got = (hits_html(pages_small, iterations=3, n_buckets=n_buckets)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert list(got.node) == list(nodes)
        assert np.allclose(got["auth"], auth, rtol=1e-10, atol=1e-14)
        assert np.allclose(got["hub"], hub, rtol=1e-10, atol=1e-14)


def test_hits_pregel_empty_and_sink():
    """Degenerates: empty edge table → empty result; a pure-sink node
    gets auth>0, hub=0 and a pure-source the reverse."""
    import pyarrow as pa
    import ray.data as rd

    from hunt_ray.pipelines.graph import hits_pregel

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert hits_pregel(empty, iterations=2).count() == 0
    # 0 -> 1 -> 2 chain: 0 is pure source (hub only), 2 pure sink (auth only)
    chain = rd.from_arrow(pa.table({"src": pa.array([0, 1], pa.int64()),
                                    "dst": pa.array([1, 2], pa.int64())}))
    df = (hits_pregel(chain, iterations=4, n_buckets=2).to_pandas()
          .set_index("node"))
    assert df.loc[0, "auth"] == 0.0 and df.loc[0, "hub"] > 0.0
    assert df.loc[2, "hub"] == 0.0 and df.loc[2, "auth"] > 0.0


def test_pagerank_seeded_personalization():
    """Personalized PageRank: teleport + dangling mass go to the seeds;
    nodes unreachable from any seed converge to 0; seeds = ALL nodes
    reproduces uniform PageRank; seeds outside the universe raise."""
    import pyarrow as pa
    import ray.data as rd

    from hunt_ray.pipelines.graph import pagerank_edges, pagerank_pregel

    # 0 -> 1 -> 2, and an isolated pair 3 -> 4 unreachable from seed 0
    edges = pa.table({"src": pa.array([0, 1, 3], pa.int64()),
                      "dst": pa.array([1, 2, 4], pa.int64())})
    seeded = (pagerank_pregel(rd.from_arrow(edges), iterations=8,
                              seeds=np.array([0]), n_buckets=2)
              .to_pandas().set_index("node"))
    assert abs(seeded["rank"].sum() - 1.0) < 1e-9     # mass conserved
    # the seed-reachable chain 0→1→2 carries all the mass...
    assert (seeded.loc[[0, 1, 2], "rank"] > 0).all()
    # ...and the component unreachable from the seed carries exactly none
    # (3 has no teleport and no inlinks → 0 from iteration 1; 4's only
    # inflow is d·rank(3) → 0 from iteration 2)
    assert seeded.loc[3, "rank"] == 0.0
    assert seeded.loc[4, "rank"] == 0.0
    # seeds = every node ≡ the uniform operator
    allseed = (pagerank_pregel(rd.from_arrow(edges), iterations=4,
                               seeds=np.arange(5), n_buckets=2)
               .to_pandas().sort_values("node").reset_index(drop=True))
    uniform = (pagerank_edges(rd.from_arrow(edges), iterations=4)
               .to_pandas().sort_values("node").reset_index(drop=True))
    assert np.allclose(allseed["rank"], uniform["rank"], rtol=1e-12)
    # a seed set disjoint from the universe is an error, not silence
    with pytest.raises(ValueError, match="universe"):
        pagerank_pregel(rd.from_arrow(edges), iterations=1,
                        seeds=np.array([99]))


def test_pagerank_seeded_matches_duckdb(entry):
    """Driver entry q_pagerank_seeded vs its seeded-teleport unrolled-CTE
    oracle (exact after the 1e-6 rounding of k-scaled values)."""
    got = _assert_matches(entry, "q_pagerank_seeded")
    # Σ rank = 1 ⇒ Σ (rank·k) = k = |{doc_id ≡ 0 mod 10}|
    k = -(-len(got) // 10)
    assert abs(got.ppr_scaled.sum() - k) < 1e-3
    seeds = set(range(0, len(got), 10))
    top = got.nlargest(10, "ppr_scaled").node
    # seeds dominate the top ranks under seed-restricted teleport
    assert sum(1 for v in top if v in seeds) >= 5
