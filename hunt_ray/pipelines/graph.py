"""Web-graph pipelines: link-graph degrees and distributed PageRank.

The web reality behind a Common-Crawl corpus is a link graph, and graph
centrality (PageRank / harmonic centrality) is the standard page-quality
signal used to weight or filter training data. The reference indexes
documents and has no graph surface; these follow the driver mandate for
training-data pipeline operators.

Edges derive deterministically from doc_id (three pseudo-random
out-links per doc, distinct-deduped) so the DuckDB oracle recomputes the
graph exactly — the same derivation trick as ``curate.snapshot_rows``
and the flagship pages corpus. The operators themselves are generic over
any (src, dst) edge Dataset.

Scale shapes (what matters at 100 TB):

- ``link_degree``: out-degree is local to each src's derivation batch;
  in-degree is a map-side partial count per dst (short int rows ride the
  shuffle), one small groupby. Classic count-combine.
- ``pagerank``: each iteration is (a) one src-keyed shuffle that
  co-locates a node's rank row with its out-edge rows (the union +
  groupby attach pattern from ``dedup.minhash_dedup``'s verify — no
  driver-side joins, no broadcast of the rank vector, which at 10^12
  nodes is itself TB-scale), then (b) one dst-keyed groupby summing
  contributions. Ranks materialize between iterations (the standard
  iterative checkpoint; the ranks table is one short row per node,
  never the corpus). Every node keeps out-degree ≥ 1 by construction,
  so there is no dangling mass and the per-iteration total stays 1.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

DAMPING = 0.85
EDGE_MULT = (31, 17, 13)  # dst_c = (src * mult_c + c + 1) % n_docs


def _doc_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def n_docs(sf_dir: str) -> int:
    """Node count from parquet metadata — no data read."""
    return pq.ParquetFile(_doc_path(sf_dir)).metadata.num_rows


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

    def final(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        return (df.group_by("doc_id")
                  .agg(out_degree=pl.col("out_degree").sum(),
                       in_degree=pl.col("in_degree").sum())
                  .to_arrow().cast(_DEG))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("doc_id").map_groups(final, batch_format="pyarrow"))


_PR = pa.schema([("node", pa.int64()), ("rank", pa.float64())])

def pagerank(sf_dir: str, *, iterations: int = 5, damping: float = DAMPING):
    """Distributed PageRank over the derived link graph; returns
    (node, pr_scaled) with pr_scaled = rank·n rounded to 6 decimals
    (N-scaling keeps the rounded values O(1) at any corpus size, so the
    oracle comparison is scale-independent).

    Each iteration is ONE dst-keyed shuffle: the out-edges of a rank
    batch's nodes are derived IN the map (edges co-partitioned with
    ranks — the standard Pregel/vertex-program layout; on a real corpus
    this is an edge table hash-partitioned by src alongside the rank
    table, so the per-iteration join is partition-local), each node's
    rank is spread over its out-degree vectorized, and a native
    groupby-sum folds contributions with a zero base row per node
    keeping sinks present. For an edge table that is NOT co-partitioned
    with ranks, the union + bucketed-groupby attach pattern
    (``dedup.minhash_dedup``'s verify; this module at commit 47894cc)
    adds the src-keyed co-location shuffle explicitly.
    """
    import ray.data as rd

    n = n_docs(sf_dir)
    docs = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id"])

    def contribs(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        e = edge_batch(pa.table({"doc_id": pa.array(node)}), n)
        src = e.column("src").to_numpy(zero_copy_only=False)
        dst = e.column("dst").to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        outdeg = np.diff(np.r_[starts, len(src)])
        pos = np.searchsorted(node[np.argsort(node)], src[starts])
        rk_sorted = rk[np.argsort(node)]
        per_src = rk_sorted[pos] / outdeg
        return pa.table({"node": pa.array(dst),
                         "rank": pa.array(np.repeat(per_src, outdeg))
                         }).cast(_PR)

    def base_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id"),
                         "rank": pa.array(np.zeros(len(batch)), pa.float64())
                         }).cast(_PR)

    zeros = docs.map_batches(base_rows, batch_format="pyarrow").materialize()
    ranks = docs.map_batches(
        lambda b: pa.table({
            "node": b.column("doc_id"),
            "rank": pa.array(np.full(len(b), 1.0 / n))}).cast(_PR),
        batch_format="pyarrow").materialize()

    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        summed = (ranks.map_batches(contribs, batch_format="pyarrow")
                  .union(zeros)
                  .groupby("node").sum("rank"))
        ranks = summed.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "rank": pa.array(
                    teleport + damping *
                    b.column("sum(rank)").to_numpy(zero_copy_only=False))
            }).cast(_PR), batch_format="pyarrow").materialize()

    def scale(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "pr_scaled": pa.array(np.round(r * n, 6))})

    return ranks.map_batches(scale, batch_format="pyarrow")
