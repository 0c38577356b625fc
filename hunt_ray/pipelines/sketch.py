"""Mergeable-sketch pipelines: KMV (k-minimum-values) distinct-count
estimation — the "novel sketch as a custom operator" pattern from the
driver mandate, chosen over HLL because KMV is DETERMINISTIC given the
hash, so the whole sketch has an exact SQL oracle (the k-th smallest
md5-derived hash is a pure function of the data).

Shape: the classic mergeable-summary topology. Each batch emits at most
k (key, hash) rows — its local k smallest distinct hashes — so the
shuffle moves O(k · n_batches) short rows regardless of corpus size; the
per-key merge unions the partials, re-takes the k smallest distinct, and
reads the estimate off the k-th value: est = (k−1) / (h_k / 2⁶⁴−1).
Correct because any hash among the global k smallest is necessarily
among its own batch's k smallest (KMV mergeability).

md5 over the distinct grams keeps the oracle byte-compatible (DuckDB
md5 — the same deliberate scalar-stage trade as ``dedup.md5_batch``);
production sketches should key on the vectorized ``hash64``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa

from .textstats import _flat_tokens

_M64 = 18446744073709551615.0  # 2^64 - 1, the hash-space normalizer


def distinct_bigrams_kmv(sf_dir: str, *, k: int = 64):
    """Estimated distinct adjacent-bigram count per language via a KMV
    sketch: one (lang, k, est_distinct) row per language. Exact when a
    language has ≤ k distinct bigrams (the sketch holds them all)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        if df.height == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "h": pa.array([], pa.uint64())})
        langs = pl.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "lang": pl.from_arrow(batch.column("lang").combine_chunks()
                                  if isinstance(batch.column("lang"), pa.ChunkedArray)
                                  else batch.column("lang")),
        })
        big = (df.with_columns(
                   bg=pl.col("term") + " " + pl.col("term").shift(-1).over("doc_id"))
               .drop_nulls("bg").join(langs, on="doc_id")
               .select(["lang", "bg"]).unique())
        out_lang, out_h = [], []
        for (lang,), grp in big.group_by("lang"):
            hs = np.fromiter(
                (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
                 for g in grp["bg"]), dtype=np.uint64, count=grp.height)
            hs = np.unique(hs)[:k]          # local k smallest distinct
            out_lang.extend([lang] * len(hs))
            out_h.append(hs)
        return pa.table({
            "lang": pa.array(out_lang, pa.string()),
            "h": pa.array(np.concatenate(out_h) if out_h
                          else np.empty(0, np.uint64), pa.uint64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        hs = np.unique(group.column("h").to_numpy(zero_copy_only=False))
        # STRICTLY fewer than k ⇒ no partial can have truncated ⇒ exact.
        # A FULL sketch (len == k) is ambiguous — the true count may be
        # anything ≥ k because partials keep only their k smallest — so
        # it must take the estimator, and the oracle mirrors with n < k
        # (caught by perturbed_sweep empty-0.95: a language whose true
        # distinct fell to 77 arrived as one truncated 64-value partial)
        if len(hs) < k:
            est = float(len(hs))
        else:
            est = round((k - 1) / (float(hs[k - 1]) / _M64), 4)
        return pa.table({
            "lang": group.column("lang").slice(0, 1),
            "k": pa.array([k], pa.int64()),
            "est_distinct": pa.array([est], pa.float64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").map_groups(merge, batch_format="pyarrow"))
