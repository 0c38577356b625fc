"""Text-analysis pipelines over the generic ``documents`` table.

All stages are Ray Data ``map_batches`` with vectorized Arrow/polars
kernels; aggregations pre-combine per batch before the (small) global
groupby — the partial+final pattern, so the shuffle moves one row per
(key, batch) instead of one per token.

The tokenizer here is deliberately ``[a-z0-9_]+`` over ``lower(text)`` —
exactly expressible in DuckDB (``regexp_extract_all(lower(text),
'[a-z0-9_]+')``) so every aggregate has an exact SQL oracle.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ..common.hashing import hash64

TOKEN_SQL_PATTERN = "[a-z0-9_]+"
STOPWORDS = ("the", "a", "of", "and", "to")


def _doc_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def _flat_tokens(batch: pa.Table) -> pl.DataFrame:
    """(doc_id, term) rows for a batch — ASCII tokens of lower(text)."""
    text = batch.column("text")
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    low = pc.utf8_lower(text)
    cleaned = pc.replace_substring_regex(low, pattern="[^a-z0-9_]+", replacement=" ")
    lists = pc.ascii_split_whitespace(cleaned)
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    flat = lists.flatten()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    rep = np.repeat(doc_ids, counts)
    # split_whitespace emits "" for leading/trailing runs — drop vectorized
    df = pl.DataFrame({"doc_id": rep, "term": pl.from_arrow(flat)})
    return df.filter(pl.col("term").str.len_bytes() > 0)


# ------------------------------------------------------------------ postings

def postings_batch(batch: pa.Table) -> pa.Table:
    """(term, doc_id, tf) triples — the flat inverted-index feed."""
    df = _flat_tokens(batch)
    out = (df.group_by(["term", "doc_id"]).agg(tf=pl.len())
             .sort(["term", "doc_id"]))
    return out.to_arrow().cast(pa.schema([
        ("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())]))


def postings(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(postings_batch, batch_format="pyarrow")


# ------------------------------------------------------------------ term stats

def term_df(sf_dir: str):
    """Per-term document frequency + collection frequency.

    Partial combine inside map_batches (docs are unique per batch so the
    per-batch (term, doc) grouping already collapses token repeats), then a
    small groupby over (term, partial) rows.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    partial = ds.map_batches(postings_batch, batch_format="pyarrow")
    return (partial.groupby("term")
            .aggregate(Count(alias_name="df"), Sum("tf", alias_name="cf")))


def top_terms(sf_dir: str, k: int = 100):
    """Top-k terms by collection frequency (cf desc, term asc)."""
    ds = term_df(sf_dir)
    return ds.sort(["cf", "term"], descending=[True, False]).limit(k)


def doc_stats(sf_dir: str):
    """Per-doc token counts — no shuffle, pure map."""
    import ray.data as rd

    def stats(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        agg = df.group_by("doc_id").agg(
            n_tokens=pl.len(), n_unique_terms=pl.col("term").n_unique())
        # docs with zero tokens keep a row
        all_ids = pl.DataFrame({"doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False)})
        out = all_ids.join(agg, on="doc_id", how="left").fill_null(0).sort("doc_id")
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_unique_terms", pa.int64())]))

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(stats, batch_format="pyarrow")


def token_count_by_lang(sf_dir: str):
    """Σ tokens and doc counts per language (partial combine per batch)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        cnt = df.group_by("doc_id").agg(n=pl.len())
        langs = pl.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "lang": pl.Series(batch.column("lang").to_pylist(), dtype=pl.String),
        })
        j = langs.join(cnt, on="doc_id", how="left").fill_null(0)
        out = j.group_by("lang").agg(n_tokens=pl.col("n").sum(), n_docs=pl.len())
        return out.to_arrow().cast(pa.schema([
            ("lang", pa.string()), ("n_tokens", pa.int64()), ("n_docs", pa.int64())]))

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text", "lang"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_docs", alias_name="n_docs")))


# ------------------------------------------------------------------ quality

def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality signals (all SQL-expressible for the oracle):
    n_chars, n_tokens, mean token length, stopword ratio."""
    df = _flat_tokens(batch)
    lens = df.with_columns(l=pl.col("term").str.len_chars())
    agg = lens.group_by("doc_id").agg(
        n_tokens=pl.len(),
        sum_len=pl.col("l").sum().cast(pl.Int64),
        n_stop=pl.col("term").is_in(list(STOPWORDS)).sum().cast(pl.Int64),
    )
    ids = pl.DataFrame({
        "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
        "n_chars": pc.utf8_length(batch.column("text").combine_chunks()
                                  if isinstance(batch.column("text"), pa.ChunkedArray)
                                  else batch.column("text")).to_numpy(zero_copy_only=False).astype(np.int64),
    })
    out = (ids.join(agg, on="doc_id", how="left").fill_null(0)
           .with_columns(
               mean_token_len=(pl.col("sum_len") / pl.max_horizontal(pl.col("n_tokens"), 1)).round(6),
               stopword_ratio=(pl.col("n_stop") / pl.max_horizontal(pl.col("n_tokens"), 1)).round(6))
           .select(["doc_id", "n_chars", "n_tokens", "mean_token_len", "stopword_ratio"])
           .sort("doc_id"))
    return out.to_arrow()


def quality(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(quality_batch, batch_format="pyarrow")


# ------------------------------------------------------------------ bm25 (documents table)

def bm25_topk(sf_dir: str, query_terms: tuple[str, ...], k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """BM25 top-k over the ``documents`` table with the exact formula the
    DuckDB oracle uses (idf = ln(1 + (N−df+0.5)/(df+0.5)), float64).

    Fully distributed: posting rows for the query terms carry their doc's
    length out of the same tokenizing map (no doc-stats join); per-row
    scores are vectorized; a groupby-doc_id sum then a per-block partial
    top-k leave only scalars, |q| df rows and n_blocks·k candidate rows on
    the driver. The input is read twice (df pass + score pass) — both
    passes stream. Ranking is (round(score, 6) desc, doc_id asc), matching
    the oracle's ORDER BY over the rounded alias.
    """
    import pyarrow.compute as _pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    terms = list(dict.fromkeys(query_terms))

    # global scalars via streaming aggregate — two numbers on the driver
    st = doc_stats(sf_dir).aggregate(Count(alias_name="n"),
                                     Sum("n_tokens", alias_name="tok"))
    N = int(st["n"])
    avgdl = (float(st["tok"] or 0.0) / N) if N else 1.0

    def term_filter(batch: pa.Table) -> pa.Table:
        """Posting rows (term, doc_id, tf, dl) for the query terms only."""
        p = postings_batch(batch)
        toks = _flat_tokens(batch)
        cnt = (toks.group_by("doc_id").agg(n=pl.len())
               if toks.height
               # typed empty: a bare {"doc_id": []} frame is Null-dtype and
               # the Int64 join below raises (caught by perturbed_sweep
               # empty-0.95 — an ALL-blank batch reaches this path)
               else pl.DataFrame(schema={"doc_id": pl.Int64,
                                         "n": pl.UInt32}))
        ids = pl.DataFrame({"doc_id": batch.column("doc_id")
                            .to_numpy(zero_copy_only=False)})
        dlm = (ids.join(cnt, on="doc_id", how="left").fill_null(0)
               .sort("doc_id"))
        sel = p.filter(_pc.is_in(p.column("term"), value_set=pa.array(terms)))
        rows = np.searchsorted(dlm["doc_id"].to_numpy(),
                               sel.column("doc_id").to_numpy(zero_copy_only=False))
        dl = dlm["n"].to_numpy().astype(np.float64)[rows] if sel.num_rows \
            else np.empty(0, np.float64)
        return sel.append_column("dl", pa.array(dl, pa.float64()))

    def post_ds():
        return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
                 .map_batches(term_filter, batch_format="pyarrow")

    # per-term document frequency: |q| rows reach the driver
    df_rows = post_ds().groupby("term").aggregate(Count(alias_name="df")).take_all()
    idf = {r["term"]: float(np.log(1.0 + (N - r["df"] + 0.5) / (r["df"] + 0.5)))
           for r in df_rows}
    if not idf:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})

    def row_score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        idfv = np.asarray([idf[t] for t in batch.column("term").to_pylist()])
        sc = idfv * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "s": pa.array(sc, pa.float64())})

    scored = (post_ds().map_batches(row_score, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum("s", alias_name="score")))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sc = np.round(batch.column("score").to_numpy(zero_copy_only=False), 6)
        top = np.lexsort((ids, -sc))[: min(k, len(ids))]
        return pa.table({"doc_id": pa.array(ids[top], pa.int64()),
                         "score": pa.array(sc[top], pa.float64())})

    cand = scored.map_batches(partial_topk, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["score"], r["doc_id"]))
    cand = cand[:k]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in cand], pa.int64()),
        "score": pa.array([r["score"] for r in cand], pa.float64()),
    })


# ------------------------------------------------------------------ language id

_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu"},
    "es": {"el", "la", "los", "que", "de", "un", "una", "por"},
    "fr": {"le", "la", "les", "et", "des", "une", "est", "que"},
}


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: argmax of per-language stopword hit ratio,
    'und' (undetermined) when nothing matches. Rows-only oracle (the
    heuristic is not reasonably SQL-expressible)."""
    df = _flat_tokens(batch)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    per = df.group_by("doc_id").agg(
        **{f"hit_{lang}": pl.col("term").is_in(sorted(words)).sum()
           for lang, words in _LANG_STOPWORDS.items()},
        n=pl.len(),
    )
    ids = pl.DataFrame({"doc_id": doc_ids})
    j = ids.join(per, on="doc_id", how="left").fill_null(0)
    hits = np.stack([j[f"hit_{lang}"].to_numpy() for lang in _LANG_STOPWORDS], axis=1)
    langs = np.asarray(list(_LANG_STOPWORDS), dtype=object)
    best = hits.argmax(axis=1)
    pred = langs[best]
    pred[hits.max(axis=1) == 0] = "und"
    return pa.table({
        "doc_id": pa.array(j["doc_id"].to_numpy(), pa.int64()),
        "pred_lang": pa.array(pred, pa.string()),
    })


def lang_id(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(lang_id_batch, batch_format="pyarrow")


# ------------------------------------------------------------------ fingerprint

FP_BASE = np.uint64(1099511628211)   # FNV prime — rolling polynomial base
FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Deterministic 64-bit document fingerprint: order-sensitive rolling
    hash of the token stream (mod 2^64). Token hash = md5 top-8-bytes, so
    the whole fingerprint is SQL-reproducible (exact DuckDB oracle).

    The rolling recurrence fp = fp·B + h_i unrolls to
    ``FP_OFFSET·Bⁿ + Σ h_i·Bⁿ⁻ⁱ`` — computed as one segmented Horner over
    the whole batch: per-token power weights from a cumprod table and a
    per-doc ``np.add.reduceat``, no per-token Python loop. mod-2^64
    wraparound is the point — numpy's overflow note is silenced.
    """
    from ..common.hashing import md5_hash64

    df = _flat_tokens(batch)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    out = np.full(len(doc_ids), FP_OFFSET, dtype=np.uint64)
    if df.height:
        th = md5_hash64(df["term"].to_numpy())
        d = df["doc_id"].to_numpy()
        # docs are contiguous segments in stream order (np.repeat layout)
        change = np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(change)
        seg_len = np.diff(np.r_[starts, len(d)])
        seg_id = np.cumsum(change) - 1
        pos_in_doc = np.arange(len(d), dtype=np.int64) - starts[seg_id]
        exp = seg_len[seg_id] - 1 - pos_in_doc
        maxn = int(seg_len.max())
        pows = np.ones(maxn + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            np.multiply.accumulate(np.full(maxn, FP_BASE, dtype=np.uint64),
                                   out=pows[1:])
            fps = np.add.reduceat(th * pows[exp], starts) + FP_OFFSET * pows[seg_len]
        idmap = {int(x): i for i, x in enumerate(doc_ids)}
        rows = np.fromiter((idmap[int(x)] for x in d[starts]), dtype=np.int64,
                           count=len(starts))
        out[rows] = fps
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "fingerprint": pa.array(out, pa.uint64()),
    })


def fingerprint(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(fingerprint_batch, batch_format="pyarrow")


# ------------------------------------------------------------------ corpus clean

def corpus_clean(sf_dir: str, *, min_tokens: int = 20,
                 max_stopword_ratio: float = 0.15,
                 langs: tuple[str, ...] = ("en", "es", "fr", "de"),
                 key_chars: int = 64):
    """The cleaning pass a training-data pipeline actually ships, as ONE
    streaming job: quality filter (token count + stopword ratio) and
    language filter pruned INSIDE the map stage (rows die before any
    shuffle), then a single groupby on a cheap text-prefix fingerprint
    keeps each duplicate group's smallest doc_id (with its copy count).
    Prefix-keying is the standard cheap first pass — exact md5 dedup and
    MinHash (pipelines/dedup.py) are the stronger follow-up passes.

    Scale shape: the only shuffle moves one short row per SURVIVING doc,
    keyed by hash64(prefix) — never the text. Exactly SQL-reproducible
    (q_corpus_clean; hash64 grouping equals the oracle's
    substr-partitioning up to 64-bit collisions)."""
    import ray.data as rd

    from ..common.hashing import hash64

    def clean_batch(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        agg = df.group_by("doc_id").agg(
            n_tokens=pl.len().cast(pl.Int64),
            n_stop=pl.col("term").is_in(list(STOPWORDS)).sum().cast(pl.Float64),
        )
        texts = batch.column("text").combine_chunks() \
            if isinstance(batch.column("text"), pa.ChunkedArray) else batch.column("text")
        lang_s = pl.from_arrow(batch.column("lang").combine_chunks()
                               if isinstance(batch.column("lang"), pa.ChunkedArray)
                               else batch.column("lang"))
        ids = pl.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "lang": lang_s,
            "gkey": hash64(pc.utf8_slice_codeunits(texts, 0, key_chars)).astype(np.int64),
        })
        out = (ids.join(agg, on="doc_id", how="inner")
               .filter((pl.col("n_tokens") >= min_tokens)
                       & (pl.col("n_stop") / pl.col("n_tokens") <= max_stopword_ratio)
                       & pl.col("lang").is_in(list(langs)))
               .with_columns(stopword_ratio=(pl.col("n_stop")
                                             / pl.col("n_tokens")).round(6))
               .select(["gkey", "doc_id", "lang", "n_tokens", "stopword_ratio"]))
        return out.to_arrow()

    _OUT = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                      ("n_tokens", pa.int64()),
                      ("stopword_ratio", pa.float64()),
                      ("n_copies", pa.int64())])

    def keep_min(batch: pa.Table) -> pa.Table:
        """ALL gkey groups of one sorted block: keep each duplicate
        group's smallest doc_id with its copy count — one Rust hash
        group_by over the block, no per-fingerprint Python call (the key
        is near-per-document cardinality at web scale)."""
        if batch.num_rows == 0:
            return _OUT.empty_table()
        out = (pl.from_arrow(batch).sort("doc_id")
               .group_by("gkey")
               .agg(doc_id=pl.col("doc_id").first(),
                    lang=pl.col("lang").first(),
                    n_tokens=pl.col("n_tokens").first(),
                    stopword_ratio=pl.col("stopword_ratio").first(),
                    n_copies=pl.len().cast(pl.Int64))
               .drop("gkey"))
        return out.to_arrow().cast(_OUT)

    from ..common.grouped import sorted_groups

    return sorted_groups(
        rd.read_parquet(_doc_path(sf_dir),
                        columns=["doc_id", "text", "lang"])
        .map_batches(clean_batch, batch_format="pyarrow"),
        "gkey", keep_min).sort("doc_id")


# ------------------------------------------------------------------ BPE-ish token counts

# GPT-2-style pre-tokenizer shape, restricted to RE2-safe constructs (no
# lookahead) so polars' Rust regex and the DuckDB oracle's RE2 agree
# token-for-token (both leftmost-first)
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(sf_dir: str):
    """Per-doc token counts under two tokenizations a training-data budget
    needs: whitespace tokens and a BPE-ish pre-tokenizer split (the
    GPT-2-shaped regex above). Vectorized polars extract_all per batch;
    exact SQL oracle via the same pattern."""
    import ray.data as rd

    def counts(batch: pa.Table) -> pa.Table:
        tcol = batch.column("text").combine_chunks() \
            if isinstance(batch.column("text"), pa.ChunkedArray) else batch.column("text")
        texts = pl.from_arrow(tcol)  # nulls propagate like the SQL oracle
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_ws_tokens": (texts.str.extract_all(r"\S+").list.len()
                            .cast(pl.Int64).to_arrow()),
            "n_bpe_tokens": (texts.str.extract_all(BPE_PATTERN).list.len()
                             .cast(pl.Int64).to_arrow()),
        })

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(counts, batch_format="pyarrow")


# ------------------------------------------------------------------ unigram-LM perplexity

def lm_perplexity(sf_dir: str, *, vocab_top: int | None = None):
    """Per-doc perplexity under a unigram LM trained on the corpus itself
    — the CCNet-style LM quality signal (docs whose token distribution is
    far from the corpus LM score high and get filtered or bucketed; at
    production scale the LM is usually frozen from a reference corpus,
    which only changes where the cf table comes from).

    Two streaming passes:
      1. collection frequencies via the partial+final ``term_df`` pattern
         (the shuffle moves one short row per (term, batch)); the
         vocabulary-sized (term, cf) result and the Σcf scalar are
         broadcast ONCE with ``ray.put`` — never re-shipped per batch.
         ``vocab_top=K`` keeps only the K most frequent terms and pools
         the remaining mass into a single OOV bucket (the standard fixed-
         vocab LM practice; bounds the broadcast at web scale). The
         default (None) keeps the full vocabulary — the exact-oracle mode.
      2. a pure map scores each doc: token → ln p lookups through one
         ``searchsorted`` on the broadcast hash-sorted vocab (hash64 keys,
         collision-free on real vocabularies for 64-bit), per-doc mean by
         ``np.add.reduceat`` over the batch's doc-contiguous token runs,
         ppl = round(exp(−mean lnp), 6) float64 — the exact expression the
         DuckDB oracle computes.

    Docs with zero tokens produce no row (matching the SQL oracle's
    GROUP BY over the token stream). Returns (doc_id, n_tokens, ppl).
    """
    import ray
    import ray.data as rd

    cf_rows = term_df(sf_dir).take_all()  # vocabulary-sized, bounded
    if not cf_rows:
        return rd.from_arrow(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("ppl", pa.float64())]).empty_table())
    terms = np.asarray([r["term"] for r in cf_rows], dtype=object)
    cf = np.asarray([r["cf"] for r in cf_rows], dtype=np.float64)
    total = float(cf.sum())
    if vocab_top is not None and vocab_top < len(cf):
        keep = np.argsort(-cf, kind="stable")[:vocab_top]
        oov_mass = total - float(cf[keep].sum())
        terms, cf = terms[keep], cf[keep]
    else:
        oov_mass = 0.0
    keys = hash64(pa.array(terms.tolist(), pa.string()))
    order = np.argsort(keys)
    # ln p per vocab term, same float64 expression as the oracle: ln(c/T)
    lnp_sorted = np.log(cf[order] / total)
    # unseen tokens (only possible with vocab_top) share the pooled mass
    lnp_oov = np.log(max(oov_mass, 1e-12) / total)
    ref = ray.put((keys[order], lnp_sorted))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "ppl": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        df = _flat_tokens(batch)
        if df.height == 0:
            return empty
        k, lnp = ray.get(ref)
        th = hash64(df["term"].to_arrow())
        pos = np.searchsorted(k, th)
        pos_c = np.minimum(pos, len(k) - 1)
        tok_lnp = np.where(k[pos_c] == th, lnp[pos_c], lnp_oov)
        d = df["doc_id"].to_numpy()  # doc-contiguous by construction
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        n_tok = np.diff(np.r_[starts, len(d)])
        mean_lnp = np.add.reduceat(tok_lnp, starts) / n_tok
        return pa.table({
            "doc_id": pa.array(d[starts], pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "ppl": pa.array(np.round(np.exp(-mean_lnp), 6), pa.float64()),
        })

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(score, batch_format="pyarrow")


def lm_perplexity_filter(sf_dir: str, *, max_ppl: float,
                         vocab_top: int | None = None):
    """Keep docs whose unigram-LM perplexity ≤ ``max_ppl`` (the CCNet
    head/middle cut as a threshold filter — pure map after the bounded
    LM broadcast, no shuffle)."""
    ds = lm_perplexity(sf_dir, vocab_top=vocab_top)
    return ds.filter(expr=f"ppl <= {float(max_ppl)!r}")


# ------------------------------------------------------------------ quantiles

def token_quantiles(sf_dir: str,
                    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """Exact distributed quantiles of per-doc token counts — the
    threshold-calibration primitive (Gopher length cuts, quality-score
    percentile buckets) a 100 TB curation run needs before it can pick
    filter constants.

    Scale path: each batch collapses its docs to a (n_tokens, n_docs)
    value-count partial, the groupby moves one short row per (value,
    batch), and only the O(distinct doclens) histogram — thousands of
    rows regardless of corpus size — reaches the driver. No sort, no
    per-doc rows off the workers. Selection matches DuckDB
    ``quantile_disc``: sorted value at index ceil(q·N)−1 (verified over
    n∈{3..10} grids; ties collapse into one histogram bucket so the
    cumsum lookup is exact, not approximate).
    """
    import math

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        agg = df.group_by("doc_id").agg(n_tokens=pl.len())
        all_ids = pl.DataFrame(
            {"doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False)})
        j = all_ids.join(agg, on="doc_id", how="left").fill_null(0)
        out = j.group_by("n_tokens").agg(n_docs=pl.len())
        return out.to_arrow().cast(pa.schema([
            ("n_tokens", pa.int64()), ("n_docs", pa.int64())]))

    hist = (rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("n_tokens")
              .aggregate(Sum("n_docs", alias_name="n_docs"))
              .to_pandas()
              .sort_values("n_tokens").reset_index(drop=True))
    cum = hist["n_docs"].to_numpy().cumsum()
    vals = hist["n_tokens"].to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for q in qs:
        idx = max(0, math.ceil(q * total) - 1)
        rows.append((float(q), int(vals[np.searchsorted(cum, idx + 1)])))
    return pd.DataFrame(rows, columns=["q", "n_tokens_q"])


# ------------------------------------------------------------------ DSIR

def _dsir_buckets(terms: pa.Array, n_buckets: int, hash: str) -> np.ndarray:
    """Hashed-unigram feature bucket per term. ``hash="md5"`` matches the
    DuckDB oracle byte for byte (``('0x' || substring(md5(term), 1,
    16))::UBIGINT % B``, the :func:`curate.shuffle_assign` key
    convention) — md5 runs once per UNIQUE term, so the scalar stage is
    vocabulary-bounded, not token-bounded. ``hash="fast"`` is the
    production sibling: vectorized ``hash64 % B``, same distribution,
    no oracle."""
    if hash == "fast":
        return (hash64(terms) % np.uint64(n_buckets)).astype(np.int64)
    import hashlib

    uniq, inv = np.unique(np.asarray(terms, dtype=object),
                          return_inverse=True)
    ub = np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % n_buckets
         for t in uniq),
        dtype=np.int64, count=len(uniq))
    return ub[inv]


def dsir_weights(sf_dir: str, *, eval_mod: int = 19, n_buckets: int = 1024,
                 alpha: float = 1.0, hash: str = "md5"):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw doc
    by how target-like its hashed-unigram distribution is. Target = the
    synthetic eval slice (``doc_id % eval_mod == 0``, the same slice
    :func:`curate.decontaminate` excludes); raw = everything else. The
    per-doc weight is Σ_tokens λ[bucket(token)] with λ[b] =
    ln p̂_target[b] − ln p̂_raw[b] under add-``alpha`` smoothing — the
    paper's log importance ratio over a hashed n-gram feature space.

    Scale shape (the :func:`lm_perplexity` recipe): pass 1 collapses each
    batch to ≤ ``n_buckets`` (bucket, target_cnt, raw_cnt) partial rows,
    the groupby moves one short row per (bucket, batch), and only the
    B-row histogram reaches the driver; the B-float λ vector broadcasts
    ONCE via ``ray.put``; pass 2 is a pure map — bucket lookup is direct
    indexing, per-doc sums via ``np.add.reduceat`` over doc-contiguous
    token runs. Nothing corpus-sized touches the driver or re-ships per
    batch. Returns (doc_id, n_tokens, weight) for raw docs with ≥1 token,
    weight rounded to 6 decimals (float64, oracle-identical).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    B = int(n_buckets)

    def count_partial(batch: pa.Table) -> pa.Table:
        df = _flat_tokens(batch)
        if df.height == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "tc": pa.array([], pa.int64()),
                             "rc": pa.array([], pa.int64())})
        bk = _dsir_buckets(df["term"].to_arrow(), B, hash)
        is_t = (df["doc_id"].to_numpy() % eval_mod) == 0
        out = (pl.DataFrame({"bucket": bk, "t": is_t})
               .group_by("bucket")
               .agg(tc=pl.col("t").sum().cast(pl.Int64),
                    rc=(~pl.col("t")).sum().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("bucket", pa.int64()), ("tc", pa.int64()), ("rc", pa.int64())]))

    hist = (rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
            .map_batches(count_partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("tc", alias_name="tc"), Sum("rc", alias_name="rc"))
            .to_pandas())
    tc = np.zeros(B, np.float64)
    rc = np.zeros(B, np.float64)
    if len(hist):
        tc[hist["bucket"].to_numpy()] = hist["tc"].to_numpy()
        rc[hist["bucket"].to_numpy()] = hist["rc"].to_numpy()
    a = float(alpha)
    lam = (np.log((tc + a) / (tc.sum() + a * B))
           - np.log((rc + a) / (rc.sum() + a * B)))
    lam_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "weight": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % eval_mod != 0))
        df = _flat_tokens(batch)
        if df.height == 0:
            return empty
        lm = ray.get(lam_ref)
        tok_lam = lm[_dsir_buckets(df["term"].to_arrow(), B, hash)]
        d = df["doc_id"].to_numpy()  # doc-contiguous by construction
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        n_tok = np.diff(np.r_[starts, len(d)])
        w = np.add.reduceat(tok_lam, starts)
        return pa.table({
            "doc_id": pa.array(d[starts], pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "weight": pa.array(np.round(w, 6), pa.float64()),
        })

    return rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
             .map_batches(score, batch_format="pyarrow")


def dsir_select(sf_dir: str, k: int = 100, **kw):
    """Top-``k`` raw docs by DSIR importance weight (desc, doc_id asc
    tiebreak) — the deterministic-selection variant of the paper's
    Gumbel resampling (weight order is the decision boundary either
    way; seeded-noise resampling is :func:`curate.sample_stratified`'s
    draw mechanic applied to these weights)."""
    return dsir_weights(sf_dir, **kw).sort(
        ["weight", "doc_id"], descending=[True, False]).limit(int(k))
