"""Boolean / phrase / prefix search over the ``documents`` table.

These mirror the inverted-index query semantics on the generic corpus in a
form DuckDB can oracle exactly: a doc matches a term iff the term appears
in ``regexp_extract_all(lower(text), '[a-z0-9_]+')``; a phrase matches iff
the space-joined token stream contains the space-joined phrase with token
alignment. All distributed work is vectorized map_batches; results are
plain doc_id sets (scores are the hunt-compat/BM25 engines' job).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _doc_path, _flat_tokens


def _token_string(batch: pa.Table) -> pa.Array:
    """' '-joined normalized token stream per doc, padded with spaces."""
    text = batch.column("text")
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    low = pc.utf8_lower(text)
    cleaned = pc.replace_substring_regex(low, pattern="[^a-z0-9_]+", replacement=" ")
    trimmed = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(cleaned, pattern=" +", replacement=" "))
    return pc.binary_join_element_wise(
        pa.array([" "] * batch.num_rows), trimmed, pa.array([" "] * batch.num_rows), "")


def _matching(sf_dir: str, fn):
    import ray.data as rd

    from ..common.grouped import ensure_schema

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    # a query matching NOTHING must still return a (doc_id) result — see
    # ensure_schema on Ray's empty-dataset column loss
    return ensure_schema(ds.map_batches(fn, batch_format="pyarrow"),
                         pa.schema([("doc_id", pa.int64())]))


def _has_term_in(s: pa.Array, term: str) -> np.ndarray:
    return pc.match_substring(s, f" {term} ").to_numpy(zero_copy_only=False).astype(bool)


def search_and(sf_dir: str, t1: str, t2: str):
    def fn(batch: pa.Table) -> pa.Table:
        s = _token_string(batch)  # one normalization pass per batch
        m = _has_term_in(s, t1) & _has_term_in(s, t2)
        return pa.table({"doc_id": batch.column("doc_id").filter(pa.array(m))})

    return _matching(sf_dir, fn)


def search_or(sf_dir: str, t1: str, t2: str):
    def fn(batch: pa.Table) -> pa.Table:
        s = _token_string(batch)
        m = _has_term_in(s, t1) | _has_term_in(s, t2)
        return pa.table({"doc_id": batch.column("doc_id").filter(pa.array(m))})

    return _matching(sf_dir, fn)


def search_and_not(sf_dir: str, t1: str, t2: str):
    def fn(batch: pa.Table) -> pa.Table:
        s = _token_string(batch)
        m = _has_term_in(s, t1) & ~_has_term_in(s, t2)
        return pa.table({"doc_id": batch.column("doc_id").filter(pa.array(m))})

    return _matching(sf_dir, fn)


def search_phrase(sf_dir: str, phrase: str):
    """Token-aligned phrase containment."""
    needle = " " + " ".join(phrase.lower().split()) + " "

    def fn(batch: pa.Table) -> pa.Table:
        s = _token_string(batch)
        m = pc.match_substring(s, needle).to_numpy(zero_copy_only=False).astype(bool)
        return pa.table({"doc_id": batch.column("doc_id").filter(pa.array(m))})

    return _matching(sf_dir, fn)


def search_prefix(sf_dir: str, prefix: str):
    """Docs containing any token with the given prefix."""

    def fn(batch: pa.Table) -> pa.Table:
        s = _token_string(batch)
        m = pc.match_substring(s, f" {prefix}").to_numpy(zero_copy_only=False).astype(bool)
        return pa.table({"doc_id": batch.column("doc_id").filter(pa.array(m))})

    return _matching(sf_dir, fn)


def term_doc_count(sf_dir: str, terms: tuple[str, ...]):
    """df for a fixed term list — one row per term (term, df)."""
    from ray.data.aggregate import Count

    terms_set = list(terms)

    def fn(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        sub = (df.filter(pl.col("term").is_in(terms_set))
               .unique(["term", "doc_id"]))
        return sub.select(["term", "doc_id"]).to_arrow()

    ds = _matching(sf_dir, fn)
    return ds.groupby("term").aggregate(Count(alias_name="df"))
