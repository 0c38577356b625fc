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



def _centroid_sample(sf_dir: str, seed: int, target: int = 4096) -> np.ndarray:
    """Deterministic, ORDER-INDEPENDENT ~target-row sample for centroid
    training: keep rows where (hash64(vec_id)+seed) % (n/target) == 0 —
    a distributed filter whose outcome does not depend on block layout or
    streaming order (Ray's random_sample does), so the transient and the
    persisted IVF paths train bit-identical centroids. Sorted by vec_id
    for a stable k-means input order; driver holds only the sample."""
    import ray.data as rd

    from ..common.hashing import hash64

    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    m = max(1, n_rows // target)

    def pick(batch: pa.Table) -> pa.Table:
        keys = pa.compute.cast(batch.column("vec_id"), pa.string())
        sel = (hash64(keys) + np.uint64(seed)) % np.uint64(m) == 0
        return batch.filter(pa.array(sel))

    rows = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
            .map_batches(pick, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: r["vec_id"])
    smat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    return smat


def knn_ivf(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3, 4), k: int = 10,
            n_clusters: int = 16, nprobe: int = 4, seed: int = 13):
    """IVF-bucketed ANN: centroids from a driver-side sample, per-batch
    bucket assignment, probe only the nprobe closest buckets per query.

    Returns the same schema as knn_brute (+ per-query recall measurable in
    tests by comparison)."""
    import ray
    import ray.data as rd

    qids, qn = _load_queries(sf_dir, query_ids)
    cents = _kmeans_lite(_centroid_sample(sf_dir, seed), n_clusters, seed)
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


# ------------------------------------------------------------------ persistent IVF

def ivf_build(sf_dir: str, index_dir: str, *, n_clusters: int = 16,
              seed: int = 13) -> str:
    """Build a PERSISTENT IVF index: centroids (tiny .npy + meta.json) and
    the embeddings rewritten hash-partitioned by bucket
    (``data/bucket=K/``) — the vector sibling of the inverted index's
    partitioned layout. A search then READS only its probed buckets'
    files (I/O pruning, not just in-batch compute masking, which is the
    part of IVF that matters at 100 TB). Resumable: a params-keyed marker
    skips a completed build; a crashed partial write is wiped first."""
    import json
    import os
    import shutil

    import ray.data as rd

    params = f"c{n_clusters}-s{seed}"
    marker = os.path.join(index_dir, f"_done-{params}")
    if os.path.exists(marker):
        return index_dir
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    cents = _kmeans_lite(_centroid_sample(sf_dir, seed), n_clusters, seed)
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_clusters": int(len(cents)), "seed": seed,
                   "n_rows": int(n_rows), "dim": int(cents.shape[1]),
                   "source": os.path.abspath(f"{sf_dir}/embeddings.parquet")}, f)

    import ray
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(ref)
        bm = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)
                      ).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        buckets = (bm @ cents_.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
     .map_batches(assign, batch_format="pyarrow")
     .write_parquet(os.path.join(index_dir, "data"),
                    partition_cols=["bucket"]))
    with open(marker, "w") as f:
        f.write("ok")
    return index_dir


def ivf_search(index_dir: str, sf_dir: str,
               query_ids: tuple[int, ...] = (0, 1, 2, 3, 4), k: int = 10,
               nprobe: int = 4) -> pa.Table:
    """ANN over a persisted IVF index: only the union of the queries'
    nprobe bucket directories is read (assert-tested); per-batch masking
    then restricts each query to ITS probes, so results equal the
    transient :func:`knn_ivf` with the same centroids bit-for-bit."""
    import os

    import ray
    import ray.data as rd

    import glob as globmod

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qids, qn = _load_queries(sf_dir, query_ids)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (q, nprobe)
    needed = sorted({int(b) for row in probes for b in row})
    paths = [f for b in needed for f in sorted(globmod.glob(
        os.path.join(index_dir, "data", f"bucket={b}", "*.parquet")))]
    tombs = _ivf_tombstones(index_dir)
    ref = ray.put((qids, qn, probes, cents, tombs))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, probes_, cents_, tombs_ = ray.get(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        bm = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)
                      ).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        # hive writes strip the partition column from data files; re-derive
        # the (deterministic) assignment with one tiny matmul per batch
        buckets = (bm @ cents_.T).argmax(axis=1)
        live = ~np.isin(bids.astype(np.uint64), tombs_) if tombs_.size \
            else np.ones(len(bids), bool)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(qids_)):
            cand_mask = live & np.isin(buckets, probes_[qi]) & (bids != qids_[qi])
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

    partials = (rd.read_parquet(paths, columns=["vec_id", "embedding"])
                .map_batches(partial_topk, batch_format="pyarrow").to_pandas())
    out = {"query_id": [], "vec_id": [], "cosine": []}
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", "vec_id"],
                              ascending=[False, True]).head(k)
        out["query_id"].extend(grp["query_id"].tolist())
        out["vec_id"].extend(grp["vec_id"].tolist())
        out["cosine"].extend(np.round(grp["cosine"].to_numpy(), 6).tolist())
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "vec_id": pa.array(out["vec_id"], pa.int64()),
                     "cosine": pa.array(out["cosine"], pa.float64())})


def knn_ivf_indexed(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
                    k: int = 10, n_clusters: int = 16, nprobe: int = 4,
                    seed: int = 13) -> pa.Table:
    """Driver entry: build-or-reuse the persistent IVF index under the
    cache root, then search it (equality with transient knn_ivf pinned in
    pytest)."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha256(f"{src}:{st.st_size}:{int(st.st_mtime)}".encode()
                         ).hexdigest()[:12]
    cache = os.environ.get("HUNT_RAY_CACHE", "/tmp/hunt_ray_cache")
    index_dir = os.path.join(cache, f"ivf-{key}-c{n_clusters}-s{seed}")
    ivf_build(sf_dir, index_dir, n_clusters=n_clusters, seed=seed)
    return ivf_search(index_dir, sf_dir, query_ids, k=k, nprobe=nprobe)


def ivf_add(index_dir: str, embeddings_parquet: str) -> int:
    """Incrementally add vectors to a persisted IVF index: assign each new
    row to a bucket under the index's FROZEN centroids and append new
    parquet files into the same ``data/bucket=K/`` layout (Ray writes
    uniquely-named files, so existing data is untouched — the immutable-
    segments pattern applied to vectors). Re-train (a fresh
    :func:`ivf_build`) when drift matters; returns rows added."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(ref)
        bm = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)
                      ).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        buckets = (bm @ cents_.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    ds = rd.read_parquet(embeddings_parquet, columns=["vec_id", "embedding"])
    n = ds.count()
    (ds.map_batches(assign, batch_format="pyarrow")
     .write_parquet(os.path.join(index_dir, "data"),
                    partition_cols=["bucket"]))
    return int(n)


def ivf_delete(index_dir: str, vec_ids) -> int:
    """Tombstone vectors in a persisted IVF index (the inverted index's
    per-segment tombstone idea, flattened: one sorted uint64 id set in
    ``tombstones.npy``, unioned on repeat calls). Search filters hits
    against it; data files stay immutable. Returns total tombstoned."""
    import os

    path = os.path.join(index_dir, "tombstones.npy")
    ids = np.asarray(sorted(set(int(v) for v in vec_ids)), dtype=np.uint64)
    if os.path.exists(path):
        ids = np.union1d(np.load(path), ids)
    np.save(path, ids)
    return int(ids.size)


def _ivf_tombstones(index_dir: str) -> np.ndarray:
    import os

    path = os.path.join(index_dir, "tombstones.npy")
    return np.load(path) if os.path.exists(path) else np.empty(0, np.uint64)
