"""Corpus-curation pipelines for LLM training data: eval-set
decontamination, repetition (Gopher-style) quality stats, per-source doc
caps, deterministic stratified sampling, and token-budget mixture quotas.

Scale shapes (what matters at 100 TB):

- decontaminate: the eval side is tiny by construction (eval suites are
  KBs against a 100 TB corpus), so its distinct n-gram hashes are
  broadcast once (``ray.put``) and every corpus batch probes them with a
  vectorized ``np.isin`` — no shuffle at all; the corpus is read once.
- repetition: pure per-batch map, no shuffle.
- source_cap: partial per-batch top-k per source (each batch forwards at
  most k rows per source it sees), then one small groupby over the
  survivors — the shuffle moves ≤ k·n_batches short rows per source, never
  the text. Hot sources (domain skew, the web reality) are bounded by the
  same cap.
- sample_stratified: pure per-batch map keyed on a deterministic hash of
  doc_id — resumable and reproducible by construction (re-running a shard
  keeps the same sample).

The reference has no corpus-curation surface (it indexes what it is
given); these follow the driver mandate for training-data pipeline
operators, in the same vectorized map_batches style as
``pipelines/textstats.py``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa

from ..common.hashing import hash64
from .textstats import _flat_tokens

_NGMIX = (np.uint64(0x9E3779B185EBCA87), np.uint64(0xC2B2AE3D27D4EB4F),
          np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5),
          np.uint64(0x85EBCA77C2B2AE63))


def _doc_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


# ------------------------------------------------------------- decontaminate

def word_ngram_hashes(batch: pa.Table, n: int) -> tuple[np.ndarray, list]:
    """Per-doc DISTINCT word-n-gram hashes → (doc_ids, list of uint64
    arrays). Docs with fewer than n tokens contribute no grams — exactly
    the oracle's gram universe (unlike ``dedup.shingle_hashes``, which
    falls back to a whole-doc shingle for short docs).

    Vectorized over the batch: one ``hash64`` of all tokens, sliding
    windows mixed position-wise with doc boundaries masked, one lexsort
    for per-doc dedup.
    """
    df = _flat_tokens(batch)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    gmap: dict[int, np.ndarray] = {}
    m = df.height
    if m >= n:
        th = hash64(df["term"].to_arrow())
        d = df["doc_id"].to_numpy()
        with np.errstate(over="ignore"):
            w = np.lib.stride_tricks.sliding_window_view(th, n)
            g = np.zeros(len(w), dtype=np.uint64)
            for j in range(n):
                g ^= (w[:, j] + np.uint64(j + 1)) * _NGMIX[j % len(_NGMIX)]
        valid = d[: m - n + 1] == d[n - 1:]
        vd, vg = d[: m - n + 1][valid], g[valid]
        if vd.size:  # every window may straddle doc boundaries
            order = np.lexsort((vg, vd))
            vd, vg = vd[order], vg[order]
            keep = np.r_[True, (vd[1:] != vd[:-1]) | (vg[1:] != vg[:-1])]
            vd, vg = vd[keep], vg[keep]
            starts = np.flatnonzero(np.r_[True, vd[1:] != vd[:-1]])
            ends = np.r_[starts[1:], len(vd)]
            for lo, hi in zip(starts, ends):
                gmap[int(vd[lo])] = vg[lo:hi]
    return doc_ids, [gmap.get(int(did), np.empty(0, np.uint64))
                     for did in doc_ids]


def eval_gram_set(sf_dir: str, *, n: int, eval_mod: int) -> np.ndarray:
    """Distinct word-n-gram hashes of the eval slice (doc_id % eval_mod
    == 0), sorted — the small broadcast side of decontamination.

    In production the eval set is an external table of benchmark
    documents; here it is carved deterministically out of the corpus (the
    driver mandates no external data). Either way it is megabytes, so a
    streamed union on the driver is the right shape — the corpus-sized
    side never leaves the workers.
    """
    import ray.data as rd

    def grams(batch: pa.Table) -> pa.Table:
        mask = (batch.column("doc_id").to_numpy(zero_copy_only=False)
                % eval_mod) == 0
        _, hs = word_ngram_hashes(batch.filter(pa.array(mask)), n)
        flat = (np.unique(np.concatenate(hs)) if hs
                else np.empty(0, np.uint64))
        return pa.table({"gram": pa.array(flat, pa.uint64())})

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    parts = [b.column("gram").to_numpy(zero_copy_only=False)
             for b in ds.map_batches(grams, batch_format="pyarrow")
                        .iter_batches(batch_format="pyarrow")]
    return (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.uint64))


def decontaminate(sf_dir: str, *, n: int = 4, eval_mod: int = 19):
    """Flag corpus docs sharing ≥1 word-n-gram with the eval slice —
    the standard train/test decontamination pass (e.g. GPT-3 appendix C /
    Gopher's 13-gram rule; n is a parameter because the synthetic fixture
    docs are short).

    Returns (doc_id, n_hit_grams) for contaminated non-eval docs:
    n_hit_grams = number of DISTINCT shared n-grams. Matching is on 64-bit
    gram hashes — exact vs the string-matching oracle up to hash
    collisions (~10⁻¹¹ at this corpus size; at true web scale use 128-bit
    gram hashes for the same headroom the reference's 64-bit DocId cites,
    ``README.md:93-94``).
    """
    import ray
    import ray.data as rd

    ev = eval_gram_set(sf_dir, n=n, eval_mod=eval_mod)
    ev_ref = ray.put(ev)  # broadcast once, read per task — never re-shipped

    def probe(batch: pa.Table) -> pa.Table:
        ev_sorted = ray.get(ev_ref)
        ids, hs = word_ngram_hashes(batch, n)
        ids = np.asarray(ids, dtype=np.int64)
        counts = np.asarray([len(h) for h in hs], dtype=np.int64)
        flat = (np.concatenate(hs) if len(hs)
                else np.empty(0, np.uint64))
        hit = np.isin(flat, ev_sorted)  # one probe for the whole batch
        seg = np.repeat(np.arange(len(ids)), counts)
        nh = np.bincount(seg[hit], minlength=len(ids)).astype(np.int64) \
            if flat.size else np.zeros(len(ids), np.int64)
        keep = (nh > 0) & ((ids % eval_mod) != 0)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_hit_grams": pa.array(nh[keep], pa.int64())})

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------- repetition

def repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals (Gopher-style quality filters, all
    SQL-expressible): n_tokens, dup_token_ratio = 1 − distinct/total,
    top_bigram_n / top_bigram_frac = the most frequent adjacent bigram's
    count and share of all bigrams. One row per doc with ≥1 token."""
    df = _flat_tokens(batch)
    if df.height == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "dup_token_ratio": pa.array([], pa.float64()),
                         "top_bigram_n": pa.array([], pa.int64()),
                         "top_bigram_frac": pa.array([], pa.float64())})
    tok = df.group_by("doc_id").agg(
        n_tokens=pl.len().cast(pl.Int64),
        n_distinct=pl.col("term").n_unique().cast(pl.Int64))
    big = (df.with_columns(
               bg=pl.col("term") + " " + pl.col("term").shift(-1).over("doc_id"))
           .drop_nulls("bg")
           .group_by(["doc_id", "bg"]).len(name="c")
           .group_by("doc_id").agg(
               top_bigram_n=pl.col("c").max().cast(pl.Int64),
               n_bigrams=pl.col("c").sum().cast(pl.Int64)))
    out = (tok.join(big, on="doc_id", how="left")
           .with_columns(
               dup_token_ratio=(1.0 - pl.col("n_distinct") / pl.col("n_tokens")).round(6),
               top_bigram_n=pl.col("top_bigram_n").fill_null(0),
               top_bigram_frac=(pl.col("top_bigram_n") / pl.col("n_bigrams"))
                   .fill_null(0.0).round(6))
           .select(["doc_id", "n_tokens", "dup_token_ratio",
                    "top_bigram_n", "top_bigram_frac"])
           .sort("doc_id"))
    return out.to_arrow()


def repetition(sf_dir: str):
    """Per-doc repetition quality stats — pure map, no shuffle."""
    import ray.data as rd

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(repetition_batch, batch_format="pyarrow")


# ---------------------------------------------------------------- source cap

def source_cap(sf_dir: str, *, k: int = 20):
    """Keep at most k docs per source (lowest doc_id wins) — the domain
    cap every web corpus applies against hot-domain skew.

    Partial+final: each batch forwards only its own lowest-k (doc_id,
    source) rows per source, then one groupby over the survivors re-caps
    globally. The shuffle never moves text, and a source with millions of
    docs still contributes ≤ k rows per input batch.
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "source": pl.from_arrow(
                batch.column("source").combine_chunks()
                if isinstance(batch.column("source"), pa.ChunkedArray)
                else batch.column("source")),
        })
        out = (df.sort("doc_id").group_by("source", maintain_order=True)
                 .head(k))
        return out.select(["doc_id", "source"]).to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("source", pa.string())]))

    def final(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("doc_id").to_numpy(zero_copy_only=False),
                           kind="stable")[:k]
        return group.take(np.sort(order))

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "source"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .map_groups(final, batch_format="pyarrow"))


# ------------------------------------------------------------- sampling

def sample_stratified(sf_dir: str, *, rates: dict[str, int] | None = None,
                      default_rate: int = 32):
    """Deterministic per-language stratified sample: keep a doc iff the
    first byte of md5(doc_id) < rate[lang] (rates are x/256). Reproducible
    and resumable by construction — re-running any shard re-selects the
    same docs, and changing a language's rate re-uses the prior sample as
    a prefix (the keep rule is a threshold on a fixed per-doc draw).

    md5 over the decimal doc_id string keeps the oracle byte-compatible
    (DuckDB md5 — same deliberate scalar-stage trade as
    ``dedup.md5_batch``); production sampling should key on the
    vectorized ``hash64`` instead.
    """
    import ray.data as rd

    rates = rates if rates is not None else {"en": 128, "de": 64}

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pylist()
        draw = np.fromiter(
            (hashlib.md5(str(int(i)).encode()).digest()[0] for i in ids),
            dtype=np.int64, count=len(ids))
        thr = np.fromiter((rates.get(l, default_rate) for l in langs),
                          dtype=np.int64, count=len(langs))
        return batch.filter(pa.array(draw < thr))

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "lang"])
    return ds.map_batches(pick, batch_format="pyarrow")


# ------------------------------------------------------------- token quotas

def quota_by_lang(sf_dir: str, *, budgets: dict[str, int] | None = None,
                  default_budget: int = 800):
    """Token-budget mixture sampling: per language, keep docs in a
    deterministic draw order (md5(doc_id), doc_id) until the kept docs'
    token total reaches the language's budget — how a training mixture is
    actually assembled ("N tokens of lang X"). Greedy fill: a doc is kept
    iff the tokens of previously kept docs are still under budget, so the
    total lands in [budget, budget + one doc).

    Shape: token counts in-map (one short row per doc rides the shuffle),
    then ``groupby(lang).map_groups`` with a vectorized sort + cumsum.
    Per-group state is one language's (doc_id, tokens, draw) rows — at
    web scale, pre-aggregate the draw axis into quantile buckets and fill
    bucket-by-bucket so no group materializes a whole language (the same
    two-level refinement as the head-term salting in the index build).
    Deterministic and resumable: the draw is a pure function of doc_id.
    """
    import ray.data as rd

    budgets = budgets if budgets is not None else {"en": 4000, "de": 1500}

    def doc_rows(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        cnt = df.group_by("doc_id").agg(n_tokens=pl.len().cast(pl.Int64))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        base = pl.DataFrame({
            "doc_id": ids,
            "lang": pl.from_arrow(batch.column("lang").combine_chunks()
                                  if isinstance(batch.column("lang"), pa.ChunkedArray)
                                  else batch.column("lang")),
            "draw": [hashlib.md5(str(int(i)).encode()).hexdigest()
                     for i in ids],
        })
        out = base.join(cnt, on="doc_id", how="left").fill_null(0)
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("lang", pa.string()),
            ("draw", pa.string()), ("n_tokens", pa.int64())]))

    def fill(group: pa.Table) -> pa.Table:
        lang = group.column("lang")[0].as_py()
        budget = budgets.get(lang, default_budget)
        draw = np.asarray(group.column("draw").to_pylist())
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        toks = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, draw))
        prior = np.cumsum(toks[order]) - toks[order]
        keep = np.sort(order[prior < budget])
        return group.take(keep).select(["doc_id", "lang", "n_tokens"])

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text", "lang"])
    return (ds.map_batches(doc_rows, batch_format="pyarrow")
            .groupby("lang").map_groups(fill, batch_format="pyarrow"))
