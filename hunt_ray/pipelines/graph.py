"""Web-graph pipelines: link-graph degrees and distributed PageRank.

The web reality behind a Common-Crawl corpus is a link graph, and graph
centrality (PageRank / harmonic centrality) is the standard page-quality
signal used to weight or filter training data. The reference indexes
documents and has no graph surface; these follow the driver mandate for
training-data pipeline operators.

Operator layers:

- :func:`pagerank_edges` — the GENERIC Dataset operator over any
  ``(src, dst)`` edge ``Dataset`` (sinks allowed; dangling mass
  redistributed uniformly). Each iteration is two keyed shuffles: a
  src-keyed union+groupby that attaches a node's rank to its out-edges
  (the same attach pattern as ``dedup.minhash_dedup``'s verify — no
  driver-side joins, no broadcast of the rank vector, which at 10^12
  nodes is itself TB-scale), then a dst-keyed groupby summing
  contributions.
- :func:`pagerank_pregel` / :func:`hits_pregel` — the raw-Ray
  resident-state plans: the edge table is hash-bucketed into the object
  store ONCE and each iteration moves only pre-combined short rank
  rows (2·B tasks per step). The edge table never re-ships — the
  decisive trade at web scale where edges ≫ nodes, and the documented
  "raw Ray where the Dataset API can't express it" case
  (iteration-resident partitioned state).
- :func:`pagerank` — the fixture wrapper over the derived link graph,
  kept as the exactly-oracled driver entry. Edges derive
  deterministically from doc_id (three pseudo-random out-links per doc,
  distinct-deduped) so the DuckDB oracle recomputes the graph exactly —
  the same derivation trick as ``curate.snapshot_rows``. Because the
  edges are a pure function of the node id, they are derived IN the
  rank map — the co-partitioned fast path.
- :func:`html_link_edges` / :func:`anchor_text` / :func:`anchor_docs` —
  the REAL web-graph surface over stored html: link extraction, inlink
  anchor-text rollups, and the indexable per-target anchor document
  (``source="column:anchors"``).

Scale shapes (what matters at 100 TB):

- ``link_degree``: out-degree is local to each src's derivation batch;
  in-degree is a map-side partial count per dst (short int rows ride the
  shuffle), one small groupby. Classic count-combine.
- ``pagerank*``: per-iteration state is one short (node, rank) row per
  node — never the corpus; ranks materialize between iterations (the
  standard iterative checkpoint). Dangling mass is a per-group marker
  row folded by the same dst-keyed groupby, so the only driver-side
  value per iteration is one scalar.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

DAMPING = 0.85
# dst_c = (src * mult_c + c + 1) % n_docs — requires doc_ids to be exactly
# 0..n-1 (asserted in n_docs); a gap would create phantom dst nodes the
# oracle's FROM documents rollup drops, breaking q_link_degree/q_pagerank
EDGE_MULT = (31, 17, 13)


def _doc_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def n_docs(sf_dir: str) -> int:
    """Node count from parquet metadata — no data read. Verifies the
    contiguous-id invariant the edge derivation depends on via doc_id
    column statistics (still metadata-only)."""
    md = pq.ParquetFile(_doc_path(sf_dir)).metadata
    n = md.num_rows
    if n == 0 or md.num_row_groups == 0:
        return n
    idx = next((i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "doc_id"), None)
    stats = [md.row_group(g).column(idx).statistics
             for g in range(md.num_row_groups)] if idx is not None else []
    # foreign writers may omit column statistics — the check is then
    # unavailable, not failed (plan_merge applies the same rule)
    if idx is not None and all(s is not None for s in stats):
        lo = min(s.min for s in stats)
        hi = max(s.max for s in stats)
        if (lo, hi) != (0, n - 1):
            raise ValueError(
                f"derived link graph requires contiguous doc_ids 0..{n-1}, "
                f"got range [{lo}, {hi}] — use pagerank_edges() with an "
                "explicit edge table instead")
    return n


def edge_batch(batch: pa.Table, n: int) -> pa.Table:
    """Derive each doc's distinct out-edges (vectorized)."""
    src = batch.column("doc_id").to_numpy(zero_copy_only=False)
    srcs = np.tile(src, len(EDGE_MULT))
    dsts = np.concatenate(
        [(src * m + c + 1) % n for c, m in enumerate(EDGE_MULT)])
    df = pl.DataFrame({"src": srcs, "dst": dsts}).unique()
    return df.to_arrow().cast(pa.schema([("src", pa.int64()),
                                         ("dst", pa.int64())]))


def link_edges(sf_dir: str):
    import ray.data as rd

    n = n_docs(sf_dir)
    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id"])
    return ds.map_batches(lambda b: edge_batch(b, n), batch_format="pyarrow")


_DEG = pa.schema([("doc_id", pa.int64()), ("out_degree", pa.int64()),
                  ("in_degree", pa.int64())])


def link_degree(sf_dir: str):
    """Per-node out/in degree over the derived link graph. Out-degree is
    local (a src's edges are derived in one batch); in-degree rides a
    partial per-batch count + one small groupby. Docs nobody links to
    keep in_degree 0 via a zero base row."""
    import ray.data as rd

    n = n_docs(sf_dir)
    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        e = pl.from_arrow(edge_batch(batch, n))
        out = (e.group_by("src").agg(out_degree=pl.len().cast(pl.Int64),
                                     in_degree=pl.lit(0).cast(pl.Int64))
                .rename({"src": "doc_id"}))
        inc = (e.group_by("dst").agg(in_degree=pl.len().cast(pl.Int64))
                .with_columns(out_degree=pl.lit(0).cast(pl.Int64))
                .rename({"dst": "doc_id"})
                .select(["doc_id", "out_degree", "in_degree"]))
        return pl.concat([out.select(["doc_id", "out_degree", "in_degree"]),
                          inc]).to_arrow().cast(_DEG)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "out_degree": batch.column("sum(out_degree)"),
            "in_degree": batch.column("sum(in_degree)")}).cast(_DEG)

    # native vectorized sum aggregate — map_groups would pay one Python
    # call + table slice PER NODE in the reduce
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("doc_id").sum(["out_degree", "in_degree"])
            .map_batches(rename, batch_format="pyarrow"))


_PR = pa.schema([("node", pa.int64()), ("rank", pa.float64())])
# attach-shuffle row layout: rank rows carry dst = _RANK_ROW; the dangling
# marker emitted by the attach map targets the reserved _DANGLING node id
_RANK_ROW = np.int64(-1)
_DANGLING = np.int64(-2)
_ATT = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                  ("rank", pa.float64())])


def _state_blocks(n_rows: int, rows_per_block: int = 250_000) -> int:
    """Block count for the per-iteration rank/edge state: one block per
    ~250k short rows (node, rank ≈ 16 bytes → ~4 MB blocks). Ray's
    sort-shuffle cost has a per-block floor (sampling, one task per
    map/reduce partition), so a toy graph left on the input's natural
    32+ blocks pays ~10× the useful compute EVERY iteration; a 10^9-node
    graph still gets 4000 blocks. Coalesce-only: callers keep the
    upstream blocking when it is already ≤ this."""
    return max(1, -(-n_rows // rows_per_block))


def _coalesce(ds, n_rows: int):
    """Repartition a materialized per-iteration state dataset down to
    `_state_blocks(n_rows)` blocks (no-op when already at or below)."""
    target = _state_blocks(n_rows)
    if ds.num_blocks() > target:
        ds = ds.repartition(target).materialize()
    return ds


def _spread_ranks(node: np.ndarray, rk: np.ndarray,
                  src: np.ndarray, dst: np.ndarray) -> pa.Table:
    """Vectorized rank spread: each node's rank split over its out-edges.

    ``(src, dst)`` are this rank batch's out-edges (src ⊆ node). Returns
    (node=dst, rank=rank_src/outdeg_src) contribution rows plus ONE
    dangling-mass marker row (node=_DANGLING) carrying the summed rank of
    batch nodes with no out-edges, so the dst-keyed groupby folds dangling
    mass with no extra pass."""
    if len(node) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())}).cast(_PR)
    node_order = np.argsort(node, kind="stable")
    node_sorted, rk_sorted = node[node_order], rk[node_order]
    if len(src):
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        outdeg = np.diff(np.r_[starts, len(src)])
        pos = np.searchsorted(node_sorted, src[starts])
        # a src with no rank row here (edge src outside an explicit node
        # universe) contributes nothing — mask its whole edge group
        pos_c = np.minimum(pos, len(node_sorted) - 1)
        valid = node_sorted[pos_c] == src[starts]
        out_node = dst[np.repeat(valid, outdeg)]
        out_rank = np.repeat(rk_sorted[pos_c[valid]] / outdeg[valid],
                             outdeg[valid])
        # dangling = batch nodes that appear in no src group
        has_out = np.zeros(len(node_sorted), dtype=bool)
        has_out[pos_c[valid]] = True
    else:
        out_node = np.empty(0, np.int64)
        out_rank = np.empty(0, np.float64)
        has_out = np.zeros(len(node_sorted), dtype=bool)
    dangling = float(rk_sorted[~has_out].sum())
    if dangling > 0.0:
        out_node = np.r_[out_node, _DANGLING]
        out_rank = np.r_[out_rank, dangling]
    return pa.table({"node": pa.array(out_node, pa.int64()),
                     "rank": pa.array(out_rank, pa.float64())}).cast(_PR)


def pagerank_edges(edges, *, nodes=None, iterations: int = 5,
                   damping: float = DAMPING, round_to: int | None = None):
    """Generic distributed PageRank over an arbitrary ``(src, dst)`` edge
    ``Dataset`` (int64 node ids ≥ 0). Sinks (nodes with no out-edges) are
    handled with uniform dangling-mass redistribution — the standard
    PR formulation: PR'(v) = (1-d)/N + d·(Σ_{u→v} PR(u)/deg(u) + D/N)
    with D = Σ_{sinks u} PR(u).

    ``nodes`` (optional Dataset with a ``node`` column) pins the node
    universe; by default it is the distinct union of src and dst. With an
    explicit universe the graph is RESTRICTED to it: edges whose dst (or
    src) lies outside are dropped before degree derivation, so rank mass
    stays conserved inside the universe (restricted-PageRank semantics).

    Physical plan per iteration (attach-shuffle path — edges NOT assumed
    co-partitioned with ranks):
      1. union(rank rows, edge rows) → groupby(src).map_groups attaches
         each node's rank to its out-edges and spreads it (one keyed
         shuffle; rank rows are tagged dst=_RANK_ROW)
      2. groupby(node).sum over contribution rows + a per-group dangling
         marker + zero base rows (second keyed shuffle)
    The per-iteration materialized state is one short row per node. When
    the edge table IS co-partitioned with ranks (or edges derive from the
    node id), use the one-shuffle fast path — see :func:`pagerank`.
    """
    import ray.data as rd

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column("src").cast(pa.int64()),
            "dst": batch.column("dst").cast(pa.int64()),
            "rank": pa.array(np.full(batch.num_rows, np.nan), pa.float64()),
        }).cast(_ATT)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()
    edge_tagged = _coalesce(edge_tagged, edge_tagged.count())

    # node universe: explicit, or distinct(src ∪ dst)
    explicit_universe = nodes is not None
    if nodes is None:
        nodes = (edges.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays([
                b.column("src").cast(pa.int64()).combine_chunks(),
                b.column("dst").cast(pa.int64()).combine_chunks()])}),
            batch_format="pyarrow")
            .groupby("node").count()
            .select_columns(["node"]))
    nodes = nodes.materialize()
    n = nodes.count()
    if explicit_universe and n:
        # restrict the graph to the pinned universe: edges to a dst
        # outside it would otherwise materialize phantom rank rows that
        # receive teleport mass every iteration (mass non-conservation).
        # Restriction happens BEFORE degree derivation (degrees are
        # recomputed per attach from the surviving edge rows), matching
        # the standard restricted-PageRank semantics; srcs outside the
        # universe are already masked inside _spread_ranks. One dst-keyed
        # co-location sort, once, outside the iteration loop.
        markers = nodes.map_batches(
            lambda b: pa.table({
                "src": pa.array(np.full(b.num_rows, _RANK_ROW), pa.int64()),
                "dst": b.column("node").cast(pa.int64()),
                "rank": pa.array(np.full(b.num_rows, np.nan), pa.float64()),
            }).cast(_ATT), batch_format="pyarrow")

        def keep_known_dst(batch: pa.Table) -> pa.Table:
            """ALL dst groups of one sorted block: keep edge rows whose
            dst group contains a universe marker (src=_RANK_ROW)."""
            if batch.num_rows == 0:
                return _ATT.empty_table()
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            seg = np.cumsum(np.r_[True, dst[1:] != dst[:-1]]) - 1
            is_marker = src == _RANK_ROW
            known = np.zeros(seg[-1] + 1, dtype=bool)
            known[seg[is_marker]] = True
            keep = known[seg] & ~is_marker
            return batch.filter(pa.array(keep))

        from ..common.grouped import sorted_groups

        edge_tagged = sorted_groups(edge_tagged.union(markers), "dst",
                                    keep_known_dst).materialize()
        edge_tagged = _coalesce(edge_tagged, edge_tagged.count())
    if n == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))

    def base_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node").cast(pa.int64()),
                         "rank": pa.array(np.zeros(batch.num_rows), pa.float64())
                         }).cast(_PR)

    zeros = _coalesce(
        nodes.map_batches(base_rows, batch_format="pyarrow").materialize(), n)
    ranks = _coalesce(nodes.map_batches(
        lambda b: pa.table({
            "node": b.column("node").cast(pa.int64()),
            "rank": pa.array(np.full(b.num_rows, 1.0 / n))}).cast(_PR),
        batch_format="pyarrow").materialize(), n)

    def attach(batch: pa.Table) -> pa.Table:
        """ALL src groups of one src-sorted block: rank rows
        (dst=_RANK_ROW) + out-edge rows, spread vectorized in one call —
        `_spread_ranks` does the per-src grouping internally, so there is
        no per-group Python call or table slice (``map_groups`` would pay
        both PER NODE)."""
        if batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.float64())}).cast(_PR)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        src = batch.column("src").to_numpy(zero_copy_only=False)
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        is_rank = dst == _RANK_ROW
        return _spread_ranks(src[is_rank], rk[is_rank],
                             src[~is_rank], dst[~is_rank])

    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        rank_tagged = ranks.map_batches(
            lambda b: pa.table({
                "src": b.column("node"),
                "dst": pa.array(np.full(b.num_rows, _RANK_ROW), pa.int64()),
                "rank": b.column("rank")}).cast(_ATT),
            batch_format="pyarrow")
        # sort("src") is the same co-location shuffle map_groups uses
        # (each output block holds whole src groups); applying the
        # vectorized kernel per BLOCK replaces map_groups' per-group UDF
        # loop — at 10^9 nodes that loop is 10^9 Python calls + slices
        contrib = (rank_tagged.union(edge_tagged)
                   .sort("src")
                   .map_batches(attach, batch_size=None,
                                batch_format="pyarrow"))
        summed = contrib.union(zeros).groupby("node").sum("rank").materialize()
        # the dangling marker folds to one tiny row; its scalar is the only
        # driver-side value per iteration
        import pyarrow.compute as pc

        dangling = 0.0
        for b in summed.iter_batches(batch_format="pyarrow"):
            m = pc.equal(b.column("node"), pa.scalar(_DANGLING, pa.int64()))
            if pc.any(m).as_py():
                dangling = float(b.filter(m).column("sum(rank)")[0].as_py())
                break
        share = damping * dangling / n

        def new_ranks(b: pa.Table, _share=share) -> pa.Table:
            keep = pc.not_equal(b.column("node"), pa.scalar(_DANGLING, pa.int64()))
            b = b.filter(keep)
            return pa.table({
                "node": b.column("node"),
                "rank": pa.array(
                    teleport + _share + damping *
                    b.column("sum(rank)").to_numpy(zero_copy_only=False))
            }).cast(_PR)

        ranks = _coalesce(
            summed.map_batches(new_ranks, batch_format="pyarrow").materialize(), n)
    if round_to is not None:
        def rnd(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b.column("node"),
                "rank": pa.array(np.round(
                    b.column("rank").to_numpy(zero_copy_only=False), round_to))})
        ranks = ranks.map_batches(rnd, batch_format="pyarrow")
    return ranks


def pagerank(sf_dir: str, *, iterations: int = 5, damping: float = DAMPING):
    """PageRank over the derived link graph (the exactly-oracled driver
    entry); returns (node, pr_scaled) with pr_scaled = rank·n rounded to 6
    decimals (N-scaling keeps the rounded values O(1) at any corpus size,
    so the oracle comparison is scale-independent).

    This is the CO-PARTITIONED fast path of :func:`pagerank_edges`: each
    iteration is ONE dst-keyed shuffle, because the out-edges of a rank
    batch's nodes derive IN the map (the standard Pregel/vertex-program
    layout; on a real corpus this is an edge table hash-partitioned by
    src alongside the rank table, making the per-iteration attach
    partition-local). Every derived node keeps out-degree ≥ 1 by
    construction, so the dangling marker row never fires here — the
    kernel (``_spread_ranks``) is shared with the generic operator, which
    handles sinks.
    """
    import ray.data as rd

    n = n_docs(sf_dir)
    docs = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id"])

    def contribs(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        e = edge_batch(pa.table({"doc_id": pa.array(node)}), n)
        return _spread_ranks(node, rk,
                             e.column("src").to_numpy(zero_copy_only=False),
                             e.column("dst").to_numpy(zero_copy_only=False))

    def base_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id"),
                         "rank": pa.array(np.zeros(len(batch)), pa.float64())
                         }).cast(_PR)

    zeros = _coalesce(
        docs.map_batches(base_rows, batch_format="pyarrow").materialize(), n)
    ranks = _coalesce(docs.map_batches(
        lambda b: pa.table({
            "node": b.column("doc_id"),
            "rank": pa.array(np.full(len(b), 1.0 / n))}).cast(_PR),
        batch_format="pyarrow").materialize(), n)

    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        summed = (ranks.map_batches(contribs, batch_format="pyarrow")
                  .union(zeros)
                  .groupby("node").sum("rank"))
        ranks = _coalesce(summed.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "rank": pa.array(
                    teleport + damping *
                    b.column("sum(rank)").to_numpy(zero_copy_only=False))
            }).cast(_PR), batch_format="pyarrow").materialize(), n)

    def scale(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "pr_scaled": pa.array(np.round(r * n, 6))})

    return ranks.map_batches(scale, batch_format="pyarrow")


# ------------------------------------------- html-extracted link graph

def html_link_edges(pages_dir: str):
    """REAL link-graph edges from the corpus html: extract every
    ``<a href="test://N">`` target per page (``analyze.html.extract_links``)
    and emit one ``(src, dst)`` int64 row per link, duplicates kept.
    Feed to :func:`pagerank_edges` — the end-to-end
    "Common-Crawl html → link graph → centrality" path over the fixture
    corpus (urls are ``test://{int}`` by the input_hint fixture shape, so
    node ids parse from the url suffix; a production corpus would hash
    urls to ids the way ``common.hashing.mkDocId`` does for documents).

    Scale shape: pure per-batch map (one regex extract_all per block +
    vectorized suffix parse) — no shuffle; downstream PageRank owns its
    keyed exchanges.
    """
    import ray.data as rd

    from ..analyze.html import extract_links

    _EDGE = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EDGE.empty_table()
        links = extract_links(batch.column("html"))
        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        df = pl.from_arrow(pa.table({"src_url": urls, "dst_url": links})) \
               .explode("dst_url").drop_nulls("dst_url")
        # tolerant suffix parse: malformed urls/hrefs drop their edge
        # instead of failing the job (oracle mirrors with TRY_CAST)
        out = df.with_columns(
            src=pl.col("src_url").str.strip_prefix("test://")
                  .cast(pl.Int64, strict=False),
            dst=pl.col("dst_url").str.strip_prefix("test://")
                  .cast(pl.Int64, strict=False),
        ).select(["src", "dst"]).drop_nulls(["src", "dst"])
        return out.to_arrow().cast(_EDGE)

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])
    return ds.map_batches(edges, batch_format="pyarrow")


def pagerank_html(pages_dir: str, *, iterations: int = 5,
                  damping: float = DAMPING, round_to: int | None = 6,
                  mode: str = "pregel", n_buckets: int | None = None):
    """PageRank over the html-extracted link graph:
    :func:`html_link_edges` → :func:`pagerank_pregel` (edge state resident
    in the object store, only rank rows move per iteration) or, with
    ``mode="dataset"``, the pure-Dataset :func:`pagerank_edges`
    attach-shuffle path. Both DuckDB-oracled in tests/test_graph.py
    against an unrolled-CTE recomputation from the same stored html."""
    edges = html_link_edges(pages_dir)
    if mode == "pregel":
        return pagerank_pregel(edges, iterations=iterations,
                               damping=damping, round_to=round_to,
                               n_buckets=n_buckets)
    if mode != "dataset":
        raise ValueError(f"unknown pagerank_html mode {mode!r} "
                         "(expected 'pregel' or 'dataset')")
    if n_buckets is not None:
        raise ValueError("n_buckets only applies to mode='pregel'")
    return pagerank_edges(edges, iterations=iterations, damping=damping,
                          round_to=round_to)


_ANCH = pa.schema([("dst", pa.int64()), ("anchor", pa.large_string()),
                   ("n_mentions", pa.int64())])


def _anchor_pairs(batch: pa.Table) -> pa.Table:
    """(dst, anchor) pair per simple <a href="test://N">text</a> element
    of a pages batch — the per-batch map side of both anchor rollups."""
    from ..analyze.html import extract_anchors

    if batch.num_rows == 0:
        return pa.table({"dst": pa.array([], pa.int64()),
                         "anchor": pa.array([], pa.large_string())})
    hrefs, anchors = extract_anchors(batch.column("html"))
    df = (pl.from_arrow(pa.table({"href": hrefs, "anchor": anchors}))
            .explode(["href", "anchor"]).drop_nulls("href"))
    # tolerant suffix parse: a malformed href (e.g. test://about) is
    # dropped, not fatal — this is the real web-graph surface (the
    # DuckDB oracle mirrors with TRY_CAST)
    df = df.filter(pl.col("href").str.starts_with("test://")).with_columns(
        dst=pl.col("href").str.strip_prefix("test://")
              .cast(pl.Int64, strict=False)).drop_nulls("dst")
    return df.select(["dst", "anchor"]).to_arrow().cast(
        pa.schema([("dst", pa.int64()), ("anchor", pa.large_string())]))


def anchor_text(pages_dir: str):
    """Inlink anchor-text rollup: for every link target, how often each
    anchor string points at it → (dst, anchor, n_mentions). The classic
    web-search signal (anchor text describes the TARGET page in the
    linkers' words; search engines index it alongside the page's own
    text — see :func:`anchor_docs` for the indexable form).

    Scale shape: pure per-batch extract (one regex pass over stored
    html) emitting short (dst, anchor) rows; ONE keyed groupby count.
    The html never leaves its read task."""
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["html"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"dst": batch.column("dst"),
                         "anchor": batch.column("anchor"),
                         "n_mentions": batch.column("count()")}).cast(_ANCH)

    return (ds.map_batches(_anchor_pairs, batch_format="pyarrow")
            .groupby(["dst", "anchor"]).count()
            .map_batches(rename, batch_format="pyarrow"))


def anchor_docs(pages_dir: str):
    """Per TARGET page, all inlink anchor text as one space-joined,
    deterministically sorted string → (url, anchors). Join this back to
    the pages table and index it as its own context
    (``ContextSchema(source="column:anchors")``) — the end-to-end
    "index the inlink anchors" loop is pinned in
    tests/test_graph.py::test_anchor_context_end_to_end.

    One dst-keyed co-location sort; the whole-block kernel folds every
    dst group with vectorized polars (no per-group Python)."""
    import ray.data as rd

    from ..common.grouped import sorted_groups

    ds = rd.read_parquet(pages_dir, columns=["html"])
    pairs = ds.map_batches(_anchor_pairs, batch_format="pyarrow")

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"url": pa.array([], pa.large_string()),
                             "anchors": pa.array([], pa.large_string())})
        out = (pl.from_arrow(batch)
               .sort(["dst", "anchor"])
               .group_by("dst", maintain_order=True)
               .agg(anchors=pl.col("anchor").str.join(" "))
               .with_columns(url="test://" + pl.col("dst").cast(pl.String))
               .select(["url", "anchors"]))
        return out.to_arrow().cast(pa.schema([
            ("url", pa.large_string()), ("anchors", pa.large_string())]))

    return sorted_groups(pairs, "dst", fold)


def pagerank_seeded(sf_dir: str, *, iterations: int = 5,
                    damping: float = DAMPING, seed_mod: int = 10):
    """Personalized PageRank over the derived fixture graph with
    seeds = every doc_id ≡ 0 (mod ``seed_mod``) — exactly oracled (the
    seed set and graph both derive from doc_id, so DuckDB recomputes
    them). Returns (node, ppr_scaled), ppr_scaled = rank·|seeds| rounded
    to 6 decimals (O(1) values at any corpus size)."""
    n = n_docs(sf_dir)
    seeds = np.arange(0, n, seed_mod, dtype=np.int64)
    ranks = pagerank_pregel(link_edges(sf_dir), iterations=iterations,
                            damping=damping, seeds=seeds)
    k = len(seeds)

    def scale(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "ppr_scaled": pa.array(np.round(r * k, 6))})

    return ranks.map_batches(scale, batch_format="pyarrow")


def pagerank_derived_pregel(sf_dir: str, *, iterations: int = 5,
                            damping: float = DAMPING):
    """The derived fixture link graph through the bucketed Pregel plan —
    same output shape as :func:`pagerank` ((node, pr_scaled), pr_scaled =
    rank·n rounded to 6 decimals), so it shares q_pagerank's exact DuckDB
    oracle. Every derived node has out-degree ≥ 1 and appears as a src,
    so the src∪dst universe equals the oracle's documents rollup."""
    n = n_docs(sf_dir)
    ranks = pagerank_pregel(link_edges(sf_dir), iterations=iterations,
                            damping=damping)

    def scale(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "pr_scaled": pa.array(np.round(r * n, 6))})

    return ranks.map_batches(scale, batch_format="pyarrow")


# ------------------------------------------------ bucketed Pregel mode

# multiply-shift bucket hash (deterministic, balances structured id
# patterns like 0..n-1 or strided crawls across buckets)
_HASH_K = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    h = (ids.astype(np.uint64) * _HASH_K) >> np.uint64(33)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _pregel_remotes():
    """Remote functions for :func:`pagerank_pregel`, defined lazily so
    importing this module never touches Ray."""
    global _PREGEL
    try:
        return _PREGEL
    except NameError:
        pass
    import ray

    @ray.remote
    def partition_block(tbl: pa.Table, n_buckets: int):
        """One edge block → per-bucket (src,dst by h(src)) + node shards
        (src∪dst by h(node)). num_returns=n_buckets via .options."""
        src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        hb = _bucket_of(src, n_buckets)
        allnodes = np.unique(np.concatenate([src, dst]))
        hn = _bucket_of(allnodes, n_buckets)
        out = []
        for b in range(n_buckets):
            m = hb == b
            out.append((src[m], dst[m], allnodes[hn == b]))
        return tuple(out) if n_buckets > 1 else out[0]

    @ray.remote(num_returns=2)
    def build_bucket(n_buckets, *parts):
        """Fold one bucket's shards into CSR-ish resident state + the
        bucket's sorted node set. Everything iteration-invariant is
        precomputed here so ``spread`` is gather + reduceat only:
        the src CSR (usrc/outdeg), the dst-sort permutation and its
        group starts (dperm/dstarts/ud — a second, dst-sorted view of
        the same edges), the per-target-bucket index lists over ud
        (dst_sel), the rank-slot index of each usrc (src_idx) and the
        dangling slots (no_out)."""
        src = np.concatenate([p[0] for p in parts])
        dst = np.concatenate([p[1] for p in parts])
        nodes = np.unique(np.concatenate([p[2] for p in parts]))
        if len(src):
            order = np.argsort(src, kind="stable")
            src, dst = src[order], dst[order]
            starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
            usrc = src[starts]
            outdeg = np.diff(np.r_[starts, len(src)])
            dperm = np.argsort(dst, kind="stable")
            d_sorted = dst[dperm]
            dstarts = np.flatnonzero(
                np.r_[True, d_sorted[1:] != d_sorted[:-1]])
            ud = d_sorted[dstarts]
        else:
            usrc = np.empty(0, np.int64)
            outdeg = np.empty(0, np.int64)
            dperm = np.empty(0, np.int64)
            dstarts = np.empty(0, np.int64)
            ud = np.empty(0, np.int64)
        src_idx = np.searchsorted(nodes, usrc)  # usrc ⊆ nodes by h(src)=b
        has_out = np.zeros(len(nodes), dtype=bool)
        has_out[src_idx] = True
        hb = _bucket_of(ud, n_buckets)
        dst_sel = [np.flatnonzero(hb == t) for t in range(n_buckets)]
        return {"usrc": usrc, "outdeg": outdeg, "dperm": dperm,
                "dstarts": dstarts, "ud": ud, "dst_sel": dst_sel,
                "src_idx": src_idx,
                "no_out": np.flatnonzero(~has_out)}, nodes

    @ray.remote
    def shard_len(nodes: np.ndarray) -> int:
        return int(len(nodes))

    @ray.remote
    def init_ranks(nodes: np.ndarray, n_total: int) -> np.ndarray:
        return np.full(len(nodes), 1.0 / n_total, np.float64)

    @ray.remote
    def spread(state: dict, nodes: np.ndarray, ranks: np.ndarray):
        """Spread this bucket's ranks over its resident out-edges,
        pre-summed per dst (map-side combine), partitioned by h(dst).
        Returns len(dst_sel) (dst, contrib) partials + the dangling-mass
        partial scalar (num_returns=n_buckets+1 via .options). All the
        sort/searchsorted work is iteration-invariant and precomputed in
        ``build_bucket`` — this is gather + reduceat + slicing only."""
        usrc, outdeg, ud = state["usrc"], state["outdeg"], state["ud"]
        if len(usrc):
            per_edge = np.repeat(ranks[state["src_idx"]] / outdeg, outdeg)
            csum = np.add.reduceat(per_edge[state["dperm"]],
                                   state["dstarts"])
        else:
            csum = np.empty(0, np.float64)
        parts = [(ud[sel], csum[sel]) for sel in state["dst_sel"]]
        dangling = float(ranks[state["no_out"]].sum())
        return (*parts, dangling)

    @ray.remote
    def combine(nodes: np.ndarray, teleport: float, share: float,
                damping: float, *partials) -> np.ndarray:
        s = np.zeros(len(nodes), np.float64)
        for d, c in partials:
            if len(d):
                s[np.searchsorted(nodes, d)] += c  # d unique per partial
        return teleport + share + damping * s

    @ray.remote
    def emit(nodes: np.ndarray, ranks: np.ndarray,
             round_to: int | None) -> pa.Table:
        r = np.round(ranks, round_to) if round_to is not None else ranks
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rank": pa.array(r, pa.float64())}).cast(_PR)

    # --- personalized (seeded) variants: teleport AND dangling mass go to
    # the seed distribution s(v) = 1/|seeds ∩ universe| instead of 1/n.
    # The seed array is ray.put ONCE and turned into a per-bucket
    # 0/1 membership mask resident in the object store — per iteration
    # only the mask's ObjectRef travels, never the seed array itself.
    @ray.remote
    def seed_base(nodes: np.ndarray, seeds_sorted: np.ndarray) -> np.ndarray:
        return _seed_mask(nodes, seeds_sorted)

    @ray.remote
    def mask_sum(mask: np.ndarray) -> float:
        return float(mask.sum())

    @ray.remote
    def init_seeded(mask: np.ndarray, n_seeds: int) -> np.ndarray:
        return mask / n_seeds

    @ray.remote
    def combine_seeded(nodes: np.ndarray, mask: np.ndarray,
                       n_seeds: int, dangling: float, damping: float,
                       *partials) -> np.ndarray:
        s = np.zeros(len(nodes), np.float64)
        for d, c in partials:
            if len(d):
                s[np.searchsorted(nodes, d)] += c
        base = mask / n_seeds
        return (1.0 - damping) * base + damping * (s + dangling * base)

    _PREGEL = (partition_block, build_bucket, shard_len, init_ranks,
               spread, combine, emit, seed_base, mask_sum, init_seeded,
               combine_seeded)
    return _PREGEL


def _seed_mask(nodes: np.ndarray, seeds_sorted: np.ndarray) -> np.ndarray:
    """Float 0/1 membership of each node in the sorted seed array."""
    if not len(seeds_sorted) or not len(nodes):
        return np.zeros(len(nodes), np.float64)
    idx = np.minimum(np.searchsorted(seeds_sorted, nodes),
                     len(seeds_sorted) - 1)
    return (seeds_sorted[idx] == nodes).astype(np.float64)


def _bucketed_setup(edges, n_buckets: int | None, partition_block,
                    build_bucket):
    """Shared resident-state setup exchange for the Pregel-style graph
    operators: normalize (src, dst) to int64, materialize, hash-bucket
    every block via `partition_block` (M×B shard objects) and fold each
    bucket's shards with `build_bucket` (num_returns=2 → (state, nodes)).
    Returns (states, node_refs, B); B == 0 means an empty edge table."""

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("src").cast(pa.int64()),
                         "dst": batch.column("dst").cast(pa.int64())})

    emat = edges.map_batches(norm, batch_format="pyarrow").materialize()
    n_edges = emat.count()
    if n_edges == 0:
        return [], [], 0
    B = n_buckets or _state_blocks(n_edges)
    shard_cols: list[list] = [[] for _ in range(B)]
    for ref in emat.to_arrow_refs():
        outs = partition_block.options(num_returns=B).remote(ref, B) \
            if B > 1 else [partition_block.remote(ref, B)]
        for b in range(B):
            shard_cols[b].append(outs[b])
    states, node_refs = [], []
    for b in range(B):
        st, nd = build_bucket.remote(B, *shard_cols[b])
        states.append(st)
        node_refs.append(nd)
    return states, node_refs, B


def pagerank_pregel(edges, *, iterations: int = 5, damping: float = DAMPING,
                    round_to: int | None = None,
                    n_buckets: int | None = None,
                    seeds=None):
    """Bucketed Pregel PageRank over an arbitrary ``(src, dst)`` edge
    ``Dataset`` — same semantics as :func:`pagerank_edges` with the
    default node universe (distinct src ∪ dst; sinks get uniform
    dangling-mass redistribution), different physical plan:

    The edge table is hash-partitioned by ``h(src)`` into object-store-
    resident buckets ONCE (one manual two-stage exchange at setup); node
    shards live in bucket ``h(node)``, so a bucket holds ALL out-edges of
    its own nodes, pre-grouped (usrc/outdeg/dst). Each iteration is then
    2·B short raw-Ray tasks: ``spread`` (rank/outdeg over resident edges,
    pre-summed per dst — a map-side combine — partitioned by ``h(dst)``)
    and ``combine`` (searchsorted scatter-add + teleport/dangling terms).
    Per-iteration network traffic is only the pre-combined short
    (dst, contrib) rows — the edge table NEVER moves again, which is the
    whole game at web scale where edges ≫ nodes: the Dataset attach path
    re-ships every edge row through a sort shuffle each iteration. The
    driver holds B ObjectRefs and one dangling scalar per iteration.

    This is the documented "raw Ray tasks where the Dataset API can't
    express the semantics" case (iteration-resident partitioned state);
    results are asserted equivalent to :func:`pagerank_edges` and the
    DuckDB unrolled-CTE oracle in tests/test_graph.py.

    ``n_buckets`` defaults to ~1 bucket per 250k edge rows
    (`_state_blocks`) — at 10^9 edges that is 4000 buckets; a toy graph
    collapses to one bucket whose whole iteration is two tasks.

    ``seeds`` switches to PERSONALIZED PageRank (trusted-seed quality
    propagation, the standard web-curation signal): teleport and
    dangling mass go to the uniform distribution over
    seeds ∩ universe instead of all nodes —
    PR'(v) = (1-d)·s(v) + d·(Σ contribs + D·s(v)). Pages unreachable
    from any seed converge to rank 0. The seed array is broadcast once
    (it is small — trusted domains, not the corpus).
    """
    import ray
    import ray.data as rd

    (partition_block, build_bucket, shard_len, init_ranks, spread,
     combine, emit, seed_base, mask_sum, init_seeded,
     combine_seeded) = _pregel_remotes()

    states, node_refs, B = _bucketed_setup(edges, n_buckets,
                                           partition_block, build_bucket)
    if B == 0:
        return rd.from_arrow(_PR.empty_table())
    n = int(sum(ray.get([shard_len.remote(nd) for nd in node_refs])))
    if seeds is not None:
        # personalized PageRank: teleport AND dangling mass go to the
        # seed distribution (1/|seeds ∩ universe| on seeds, 0 elsewhere);
        # out-of-universe seeds carry no mass, by normalization. The
        # seed array is put in the object store ONCE; each bucket folds
        # it into a resident membership mask reused every iteration.
        seeds_sorted = np.unique(np.asarray(seeds, dtype=np.int64))
        seeds_ref = ray.put(seeds_sorted)
        masks = [seed_base.remote(nd, seeds_ref) for nd in node_refs]
        n_seeds = int(sum(ray.get([mask_sum.remote(m) for m in masks])))
        if n_seeds == 0:
            raise ValueError("no seed node is in the graph's node universe")
        ranks = [init_seeded.remote(m, n_seeds) for m in masks]
    else:
        ranks = [init_ranks.remote(nd, n) for nd in node_refs]

    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        outs = [spread.options(num_returns=B + 1).remote(
                    states[b], node_refs[b], ranks[b])
                for b in range(B)]
        dangling = float(sum(ray.get([outs[b][B] for b in range(B)])))
        if seeds is not None:
            ranks = [combine_seeded.remote(node_refs[b], masks[b],
                                           n_seeds, dangling, damping,
                                           *[outs[s][b] for s in range(B)])
                     for b in range(B)]
        else:
            share = damping * dangling / n
            ranks = [combine.remote(node_refs[b], teleport, share, damping,
                                    *[outs[s][b] for s in range(B)])
                     for b in range(B)]
    tables = [emit.remote(node_refs[b], ranks[b], round_to)
              for b in range(B)]
    return rd.from_arrow_refs(tables)


# ------------------------------------------------------ HITS (Kleinberg)

def _hits_remotes():
    """Remote functions for :func:`hits_pregel` (lazy — importing this
    module never touches Ray)."""
    global _HITS
    try:
        return _HITS
    except NameError:
        pass
    import ray

    @ray.remote
    def partition_block(tbl: pa.Table, n_buckets: int):
        """One edge block → per-bucket forward shard (by h(src)), reverse
        shard (by h(dst)) and node shard (by h(node))."""
        src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        hf, hr = _bucket_of(src, n_buckets), _bucket_of(dst, n_buckets)
        allnodes = np.unique(np.concatenate([src, dst]))
        hn = _bucket_of(allnodes, n_buckets)
        out = []
        for b in range(n_buckets):
            f, r = hf == b, hr == b
            out.append((src[f], dst[f], src[r], dst[r], allnodes[hn == b]))
        return tuple(out) if n_buckets > 1 else out[0]

    def _csr(key: np.ndarray, val: np.ndarray, nodes: np.ndarray,
             n_buckets: int) -> dict:
        """One orientation's iteration-invariant spread state: the key
        CSR (ukey/cnt + rank-slot index into nodes), the neighbor-sort
        permutation and its group starts (perm/nstarts/un — the
        reduceat plan), and per-target-bucket index lists over un."""
        if len(key):
            order = np.argsort(key, kind="stable")
            key, val = key[order], val[order]
            starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            ukey = key[starts]
            cnt = np.diff(np.r_[starts, len(key)])
            perm = np.argsort(val, kind="stable")
            v_sorted = val[perm]
            nstarts = np.flatnonzero(
                np.r_[True, v_sorted[1:] != v_sorted[:-1]])
            un = v_sorted[nstarts]
        else:
            ukey = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
            perm = np.empty(0, np.int64)
            nstarts = np.empty(0, np.int64)
            un = np.empty(0, np.int64)
        hb = _bucket_of(un, n_buckets)
        return {"ukey": ukey, "cnt": cnt,
                "kidx": np.searchsorted(nodes, ukey),  # ukey ⊆ nodes
                "perm": perm, "nstarts": nstarts, "un": un,
                "sel": [np.flatnonzero(hb == t) for t in range(n_buckets)]}

    @ray.remote(num_returns=2)
    def build_bucket(n_buckets, *parts):
        """Resident per-bucket state: forward plan keyed by src (spreads
        hub → auth) and reverse plan keyed by dst (spreads auth → hub),
        each with its sort/searchsorted work precomputed so ``spread``
        is gather + reduceat only."""
        fs = np.concatenate([p[0] for p in parts])
        fd = np.concatenate([p[1] for p in parts])
        rs = np.concatenate([p[2] for p in parts])
        rd_ = np.concatenate([p[3] for p in parts])
        nodes = np.unique(np.concatenate([p[4] for p in parts]))
        return {"f": _csr(fs, fd, nodes, n_buckets),
                "r": _csr(rd_, rs, nodes, n_buckets)}, nodes

    @ray.remote
    def ones(nodes: np.ndarray) -> np.ndarray:
        return np.ones(len(nodes), np.float64)

    @ray.remote
    def spread(state: dict, nodes: np.ndarray, values: np.ndarray,
               direction: str, n_buckets: int):
        """Each resident edge carries value[key] to its neighbor; pre-sum
        per neighbor (map-side combine), partition by h(neighbor). The
        sort/searchsorted plan is precomputed in ``build_bucket`` —
        gather + reduceat + slicing only."""
        plan = state["f" if direction == "fwd" else "r"]
        un = plan["un"]
        if len(plan["ukey"]):
            per_edge = np.repeat(values[plan["kidx"]], plan["cnt"])
            csum = np.add.reduceat(per_edge[plan["perm"]], plan["nstarts"])
        else:
            csum = np.empty(0, np.float64)
        parts = [(un[sel], csum[sel]) for sel in plan["sel"]]
        # num_returns=1 keeps a tuple whole — hand back the bare pair
        return parts[0] if n_buckets == 1 else tuple(parts)

    @ray.remote(num_returns=2)
    def combine(nodes: np.ndarray, *partials):
        raw = np.zeros(len(nodes), np.float64)
        for d, c in partials:
            if len(d):
                raw[np.searchsorted(nodes, d)] += c
        return raw, float((raw * raw).sum())

    @ray.remote
    def scale(raw: np.ndarray, norm: float) -> np.ndarray:
        return raw / norm if norm > 0.0 else raw

    @ray.remote
    def emit(nodes: np.ndarray, hub: np.ndarray, auth: np.ndarray,
             round_to: int | None) -> pa.Table:
        if round_to is not None:
            hub, auth = np.round(hub, round_to), np.round(auth, round_to)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "hub": pa.array(hub, pa.float64()),
                         "auth": pa.array(auth, pa.float64())})

    _HITS = (partition_block, build_bucket, ones, spread,
             combine, scale, emit)
    return _HITS


def hits_pregel(edges, *, iterations: int = 5, round_to: int | None = None,
                n_buckets: int | None = None):
    """Kleinberg's HITS over an arbitrary ``(src, dst)`` edge ``Dataset``
    → (node, hub, auth), L2-normalized per half-step (the standard
    power-iteration formulation: auth = Aᵀ·hub / ‖·‖₂ then
    hub = A·auth / ‖·‖₂, hub⁰ = 1).

    Same physical plan as :func:`pagerank_pregel` with BOTH edge
    orientations resident: setup builds a forward CSR (by h(src), spreads
    hub → auth) and a reverse CSR (by h(dst), spreads auth → hub) in the
    object store once; each half-step is B spread + B combine + B scale
    raw-Ray tasks moving only pre-combined short (node, contrib) rows and
    one Σx² scalar per bucket. Duplicate edges weight the sums, matching
    the adjacency-matrix semantics with integer multiplicities."""
    import ray
    import ray.data as rd

    (partition_block, build_bucket, ones, spread,
     combine, scale, emit) = _hits_remotes()

    states, node_refs, B = _bucketed_setup(edges, n_buckets,
                                           partition_block, build_bucket)
    if B == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "hub": pa.array([], pa.float64()),
                                       "auth": pa.array([], pa.float64())}))
    hub = [ones.remote(nd) for nd in node_refs]
    auth = hub

    def half_step(values, direction):
        outs = [spread.options(num_returns=B).remote(
                    states[b], node_refs[b], values[b], direction, B)
                for b in range(B)]
        outs = [o if B > 1 else [o] for o in outs]
        raws, sumsqs = [], []
        for b in range(B):
            raw, ss = combine.remote(node_refs[b],
                                     *[outs[s][b] for s in range(B)])
            raws.append(raw)
            sumsqs.append(ss)
        norm = float(np.sqrt(sum(ray.get(sumsqs))))
        return [scale.remote(r, norm) for r in raws]

    for _ in range(iterations):
        auth = half_step(hub, "fwd")
        hub = half_step(auth, "rev")
    tables = [emit.remote(node_refs[b], hub[b], auth[b], round_to)
              for b in range(B)]
    return rd.from_arrow_refs(tables)


def hits_html(pages_dir: str, *, iterations: int = 5,
              round_to: int | None = None, n_buckets: int | None = None):
    """HITS hubs/authorities over the html-extracted link graph — the
    companion centrality to :func:`pagerank_html`, same extraction, same
    resident-bucket plan."""
    return hits_pregel(html_link_edges(pages_dir), iterations=iterations,
                       round_to=round_to, n_buckets=n_buckets)
