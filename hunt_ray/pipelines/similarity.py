"""Similarity search over the ``embeddings`` table.

- ``knn_brute``: exact cosine top-k per query — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once). The baseline and the
  SQL-oracle-checkable path.
- ``knn_ivf``: IVF-style bucketed ANN — seeded k-means-lite centroids,
  per-batch bucket assignment, query probes the nprobe nearest buckets.
  The 100 TB scale path (bounded candidate sets instead of full scans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _load_queries(sf_dir: str, query_ids: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
    """Fetch just the query vectors via Parquet predicate pushdown.

    ``filters=`` prunes row groups by vec_id statistics, so the driver reads
    only the row groups containing the ≤|query_ids| query rows — never the
    full embeddings table (which at 100 TB would be corpus-sized)."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(query_ids))],
    )
    qids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    q = np.stack(tbl.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return qids, qn


def knn_brute(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3, 4), k: int = 10):
    """Exact cosine top-k: per-batch partial top-k, tiny driver merge.

    Each batch computes sims (batch × queries) in one matmul and emits its
    local top-k rows per query — the merge input is O(n_batches·k·q) rows,
    never the full corpus.
    """
    import ray
    import ray.data as rd

    qids, qn = _load_queries(sf_dir, query_ids)
    ref = ray.put((qids, qn))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_ = ray.get(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        bm = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = qn_ @ bm.T  # (q, batch)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(qids_)):
            row = sims[qi]
            mask = bids != qids_[qi]  # exclude self
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            kk = min(k, cand.size)
            top = cand[np.argpartition(-row[cand], kk - 1)[:kk]]
            out["query_id"].extend([int(qids_[qi])] * len(top))
            out["vec_id"].extend(bids[top].tolist())
            out["cosine"].extend(row[top].tolist())
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "cosine": pa.array(out["cosine"], pa.float64())})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    # driver merge: tiny (n_blocks × k × queries)
    out = {"query_id": [], "vec_id": [], "cosine": []}
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        out["query_id"].extend(grp["query_id"].tolist())
        out["vec_id"].extend(grp["vec_id"].tolist())
        out["cosine"].extend(np.round(grp["cosine"].to_numpy(), 6).tolist())
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "vec_id": pa.array(out["vec_id"], pa.int64()),
                     "cosine": pa.array(out["cosine"], pa.float64())})


# ------------------------------------------------------------------ IVF

def _kmeans_lite(mat: np.ndarray, n_clusters: int, seed: int = 13,
                 iters: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cents[c] = v / n
    return cents


def knn_ivf(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3, 4), k: int = 10,
            n_clusters: int = 16, nprobe: int = 4, seed: int = 13):
    """IVF-bucketed ANN: centroids from a driver-side sample, per-batch
    bucket assignment, probe only the nprobe closest buckets per query.

    Returns the same schema as knn_brute (+ per-query recall measurable in
    tests by comparison)."""
    import ray
    import ray.data as rd

    qids, qn = _load_queries(sf_dir, query_ids)
    # seeded RANDOM sample → centroids (driver holds ≤4096 rows; a
    # first-N slice would bias centroids toward the file's row order)
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    frac = min(1.0, 4096 * 1.25 / max(1, n_rows))
    sample_rows = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                   columns=["embedding"])
                   .random_sample(frac, seed=seed).limit(4096).take_all())
    smat = np.stack([r["embedding"] for r in sample_rows]).astype(np.float64)
    smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    cents = _kmeans_lite(smat, n_clusters, seed)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (q, nprobe)
    ref = ray.put((qids, qn, cents, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, cents_, probes_ = ray.get(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        bm = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        buckets = (bm @ cents_.T).argmax(axis=1)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(qids_)):
            cand_mask = np.isin(buckets, probes_[qi]) & (bids != qids_[qi])
            cand = np.flatnonzero(cand_mask)
            if cand.size == 0:
                continue
            row = bm[cand] @ qn_[qi]
            kk = min(k, cand.size)
            top = np.argpartition(-row, kk - 1)[:kk]
            out["query_id"].extend([int(qids_[qi])] * kk)
            out["vec_id"].extend(bids[cand[top]].tolist())
            out["cosine"].extend(row[top].tolist())
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "cosine": pa.array(out["cosine"], pa.float64())})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = {"query_id": [], "vec_id": [], "cosine": []}
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        out["query_id"].extend(grp["query_id"].tolist())
        out["vec_id"].extend(grp["vec_id"].tolist())
        out["cosine"].extend(np.round(grp["cosine"].to_numpy(), 6).tolist())
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "vec_id": pa.array(out["vec_id"], pa.int64()),
                     "cosine": pa.array(out["cosine"], pa.float64())})
