"""Corpus-curation pipelines for LLM training data: eval-set
decontamination, repetition (Gopher-style) quality stats, per-source doc
caps, deterministic stratified sampling, token-budget mixture quotas,
PII redaction, and per-source quality rollups/filters.

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
- redact_pii: pure per-batch map (compiled-regex replace_all in polars'
  Rust regex engine), no shuffle; count-then-replace on each batch.
- source_rollup / source_filter: partial per-batch per-source sums (a few
  short rows per source per batch ride the shuffle, never the text), one
  small groupby; the filter broadcasts the tiny passing-source set and
  re-streams the corpus once.

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

from ..common.grouped import ensure_schema

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
    return ensure_schema(ds.map_batches(probe, batch_format="pyarrow"),
                         pa.schema([("doc_id", pa.int64()), ("n_hit_grams", pa.int64())]))


# ------------------------------------------------------- repeated passages

def repeated_ngrams(sf_dir: str, *, n: int = 6, num_buckets: int = 32):
    """Cross-document repeated-passage detection (the corpus-vs-corpus
    sibling of :func:`decontaminate`, à la Lee et al. "Deduplicating
    Training Data Makes Language Models Better"): for every doc, count its
    distinct word-n-grams that also occur in ≥1 *other* doc — the signal
    behind passage-level dedup and boilerplate stripping.

    Shape: one pass emits distinct (gram-hash, doc_id) rows; grams are
    hash-bucketed (``gram % num_buckets``) so each ``map_groups`` call
    holds one bucket (a gram never straddles buckets — per-gram df is
    exact bucket-locally); per-doc partial counts from each bucket then
    sum through one tiny ``groupby(doc_id)``. Nothing corpus-sized on the
    driver; bucket count scales with the gram-row estimate (same sizing
    hazard as n-gram Jaccard, see ``_auto_num_buckets``).

    Matching is on 64-bit gram hashes — exact vs the string-matching
    oracle up to ~1e-11 collision odds at fixture size (use 128-bit at
    true web scale).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    P = max(2, num_buckets)

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids, hs = word_ngram_hashes(batch, n)
        counts = np.asarray([len(h) for h in hs], dtype=np.int64)
        flat = (np.concatenate(hs) if len(hs) else np.empty(0, np.uint64))
        dids = np.repeat(np.asarray(ids, dtype=np.int64), counts)
        return pa.table({
            "bucket": pa.array((flat % np.uint64(P)).astype(np.int64), pa.int64()),
            "gram": pa.array(flat, pa.uint64()),
            "doc_id": pa.array(dids, pa.int64())})

    def bucket_partial(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.select(["gram", "doc_id"]))
        rep = (df.group_by("gram").agg(df_g=pl.len())
               .filter(pl.col("df_g") >= 2))
        out = (df.join(rep, on="gram", how="inner")
               .group_by("doc_id").agg(n_rep=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_rep", pa.int64())]))

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ensure_schema(
        ds.map_batches(gram_rows, batch_format="pyarrow")
          .groupby("bucket").map_groups(bucket_partial, batch_format="pyarrow")
          .groupby("doc_id")
          .aggregate(Sum("n_rep", alias_name="n_repeated_grams")),
        pa.schema([("doc_id", pa.int64()), ("n_repeated_grams", pa.int64())]))


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

    def final(batch: pa.Table) -> pa.Table:
        """ALL source groups of one sorted block: global re-cap to the
        lowest-k doc_ids per source — the same Rust group_by head as the
        partial, never one Python call per domain (millions of domains
        at web scale)."""
        if batch.num_rows == 0:
            return batch
        return partial(batch)

    from ..common.grouped import sorted_groups

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "source"])
    return sorted_groups(ds.map_batches(partial, batch_format="pyarrow"),
                         "source", final)


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


# ------------------------------------------------------------- PII redaction

# One pattern string per PII class, shared verbatim between polars (Rust
# regex) and the DuckDB oracle (RE2): no lookarounds, no backrefs — the
# common leftmost-first subset where both engines match identically.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
)


def synth_pii_expr_sql() -> str:
    """The SQL twin of :func:`_with_synthetic_pii` (kept adjacent so the
    two stay in lockstep)."""
    return ("text || ' contact doc' || doc_id || '@mail.example.com from 10.' "
            "|| (doc_id % 256) || '.0.' || (doc_id % 100) "
            "|| ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')")


def _with_synthetic_pii(df: pl.DataFrame) -> pl.DataFrame:
    """Append deterministic synthetic PII derived from doc_id. The fixture
    corpus contains no PII by construction (and the driver mandates no
    external data), so the driver-visible probe injects one email, one
    IPv4 and one phone number per doc — identically on the engine and the
    oracle side — to exercise the redaction kernel non-vacuously."""
    did = pl.col("doc_id")
    return df.with_columns(
        text=pl.col("text") + " contact doc" + did.cast(pl.String)
        + "@mail.example.com from 10." + (did % 256).cast(pl.String)
        + ".0." + (did % 100).cast(pl.String) + " call +1-555-"
        + (did % 10000).cast(pl.String).str.zfill(4))


def redact_pii_batch(batch: pa.Table, *, synthesize: bool = False) -> pa.Table:
    """Count-then-replace each PII class (order: email, ip, phone — the
    replacement tokens contain no digits or '@', so no pass can create a
    match for a later one). Returns per-doc counts plus md5 of the
    redacted text (the oracle-compat scalar stage, like ``md5_batch``) —
    production redaction would write the redacted text column itself."""
    df = pl.DataFrame({
        "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
        "text": pl.from_arrow(batch.column("text").combine_chunks()
                              if isinstance(batch.column("text"), pa.ChunkedArray)
                              else batch.column("text")),
    })
    if synthesize:
        df = _with_synthetic_pii(df)
    red = pl.col("text")
    counts = {}
    for name, pat, tok in PII_PATTERNS:
        counts[f"n_{name}s"] = pl.col("text").str.count_matches(pat).cast(pl.Int64)
        red = red.str.replace_all(pat, tok)
    out = df.with_columns(redacted=red, **counts)
    md5 = [hashlib.md5(t.encode()).hexdigest()
           for t in out["redacted"].to_list()]
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
        "n_emails": out["n_emails"].to_arrow(),
        "n_ips": out["n_ips"].to_arrow(),
        "n_phones": out["n_phones"].to_arrow(),
        "redacted_md5": pa.array(md5, pa.string()),
    })


def redact_pii(sf_dir: str, *, synthesize: bool = True):
    """PII redaction pass over the corpus — pure map, no shuffle. With
    ``synthesize`` (the driver probe) deterministic PII is injected first;
    on a real corpus pass ``synthesize=False``."""
    import ray.data as rd

    from functools import partial

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(partial(redact_pii_batch, synthesize=synthesize),
                          batch_format="pyarrow")


# ---------------------------------------------------- per-source quality

def _source_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-source partial sums (docs, tokens, stopword hits) —
    the combiner half of the rollup; a few short rows per source per
    batch, never the text."""
    from .textstats import STOPWORDS

    df = _flat_tokens(batch)
    tok = df.group_by("doc_id").agg(
        n_tokens=pl.len().cast(pl.Int64),
        n_stop=pl.col("term").is_in(list(STOPWORDS)).sum().cast(pl.Int64))
    base = pl.DataFrame({
        "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
        "source": pl.from_arrow(batch.column("source").combine_chunks()
                                if isinstance(batch.column("source"), pa.ChunkedArray)
                                else batch.column("source")),
    })
    out = (base.join(tok, on="doc_id", how="left").fill_null(0)
           .group_by("source").agg(
               n_docs=pl.len().cast(pl.Int64),
               n_tokens=pl.col("n_tokens").sum().cast(pl.Int64),
               n_stop=pl.col("n_stop").sum().cast(pl.Int64)))
    return out.to_arrow().cast(pa.schema([
        ("source", pa.string()), ("n_docs", pa.int64()),
        ("n_tokens", pa.int64()), ("n_stop", pa.int64())]))


def source_rollup(sf_dir: str):
    """Per-source quality rollup: n_docs, total tokens, micro-averaged
    stopword ratio (Σstop/Σtokens) — the per-host statistics behind
    C4/RefinedWeb-style domain filtering. Partial sums per batch, one
    small groupby over (sources × batches) short rows."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    def ratio(batch: pa.Table) -> pa.Table:
        """Fold the native per-source sums into the rollup row — pure
        vectorized map; the groupby itself is Ray's aggregate (no
        per-domain Python call at any cardinality)."""
        nd = batch.column("n_docs").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        ns = batch.column("n_stop").to_numpy(zero_copy_only=False)
        r = np.where(nt > 0, np.round(ns / np.maximum(nt, 1), 6), 0.0)
        return pa.table({
            "source": batch.column("source"),
            "n_docs": pa.array(nd.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(nt.astype(np.int64), pa.int64()),
            "stopword_ratio": pa.array(r, pa.float64())})

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text", "source"])
    return (ds.map_batches(_source_partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_stop", alias_name="n_stop"))
            .map_batches(ratio, batch_format="pyarrow"))


def source_filter(sf_dir: str, *, min_docs: int = 1,
                  max_stopword_ratio: float = 0.065):
    """Keep docs only from sources whose rollup passes (n_docs ≥ min_docs
    and stopword_ratio ≤ max_stopword_ratio) — domain-level filtering.
    The passing-source set is tiny (hosts, not docs): collected on the
    driver, broadcast once via ``ray.put``, then the corpus streams
    through one vectorized membership filter."""
    import ray
    import ray.data as rd

    roll = source_rollup(sf_dir)
    passing = []
    for b in roll.iter_batches(batch_format="pyarrow"):
        m = (np.asarray(b.column("n_docs").to_numpy(zero_copy_only=False))
             >= min_docs) & \
            (np.asarray(b.column("stopword_ratio").to_numpy(zero_copy_only=False))
             <= max_stopword_ratio)
        passing.extend(s for s, ok in zip(b.column("source").to_pylist(), m) if ok)
    ok_ref = ray.put(np.asarray(sorted(set(passing)), dtype=object))

    def keep(batch: pa.Table) -> pa.Table:
        ok = ray.get(ok_ref)
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        return batch.filter(pa.array(np.isin(src, ok)))

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "source", "lang"])
    return ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------- URL snapshot dedup

# canonicalization rules applied in order to lower(url); each is a
# first-match regex replace with identical semantics in polars (Rust
# regex) and DuckDB (RE2): strip scheme, strip leading www., drop
# query+fragment, strip trailing slashes
SNAP_CANON_RULES = (r"^https?://", r"^www\.", r"[?#].*$", r"/+$")


def canonicalize_urls(urls: pl.Series) -> pl.Series:
    s = urls.str.to_lowercase()
    for pat in SNAP_CANON_RULES:
        s = s.str.replace(pat, "")
    return s


def snapshot_rows(batch: pa.Table) -> pa.Table:
    """Derive recrawl snapshots deterministically from doc_id (so the
    DuckDB oracle recomputes them exactly — same trick as the flagship
    pages corpus): every doc has a base snapshot, every 3rd a later
    trailing-slash http recrawl, every 5th an earlier tracking-params
    variant. All three canonicalize to ``example.com/p/<id>``."""
    df = pl.DataFrame({"doc_id": pl.from_arrow(
        batch.column("doc_id").combine_chunks()
        if isinstance(batch.column("doc_id"), pa.ChunkedArray)
        else batch.column("doc_id"))})
    variants = [
        df.select(
            url=pl.format("https://www.example.com/p/{}", pl.col("doc_id")),
            warc_ts=pl.col("doc_id") * 10,
            variant=pl.lit(0).cast(pl.Int64)),
        df.filter(pl.col("doc_id") % 3 == 0).select(
            url=pl.format("http://example.com/p/{}/", pl.col("doc_id")),
            warc_ts=pl.col("doc_id") * 10 + 5,
            variant=pl.lit(1).cast(pl.Int64)),
        df.filter(pl.col("doc_id") % 5 == 0).select(
            url=pl.format("https://example.com/p/{}?utm_source=feed#frag",
                          pl.col("doc_id")),
            warc_ts=pl.col("doc_id") * 10 + 3,
            variant=pl.lit(2).cast(pl.Int64)),
    ]
    snaps = pl.concat(variants).with_columns(
        canonical_url=canonicalize_urls(pl.col("url")))
    return snaps.to_arrow().cast(pa.schema([
        ("url", pa.string()), ("warc_ts", pa.int64()),
        ("variant", pa.int64()), ("canonical_url", pa.string())]))


_SNAP_OUT = pa.schema([
    ("canonical_url", pa.string()), ("n_snapshots", pa.int64()),
    ("warc_ts_kept", pa.int64()), ("variant_kept", pa.int64())])


def snapshot_dedup(sf_dir: str):
    """Common-Crawl-style snapshot dedup: canonicalize url variants
    (scheme / www. / query+fragment / trailing slash), keep the NEWEST
    ``warc_ts`` snapshot per canonical url, count how many were folded.

    Scale shape: per-batch partial keep-latest (each batch forwards ONE
    short row per canonical url it sees — never html/text), then a small
    groupby over the survivors. At 100 TB the shuffle volume is one row
    per (batch, url), and hot urls (recrawled every snapshot) still
    contribute ≤ 1 row per batch. Reference parity: Hunt enforces URI
    uniqueness by rejecting duplicate inserts with a 409 error
    (``hunt-searchengine/src/Hunt/Interpreter.hs`` ~419-480,
    ``execInsertList``'s duplicate-URI check); this operator is the
    batch-world generalization — resolve duplicates by keeping the
    newest crawl snapshot instead of erroring.
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch)
                .sort("warc_ts", descending=True)
                .group_by("canonical_url", maintain_order=True)
                .agg(n_snapshots=pl.len().cast(pl.Int64),
                     warc_ts_kept=pl.col("warc_ts").first(),
                     variant_kept=pl.col("variant").first()))
        return df.to_arrow().cast(_SNAP_OUT)

    def final(batch: pa.Table) -> pa.Table:
        """ALL canonical urls of one sorted block: keep-newest + snapshot
        count folded in one Rust hash group_by — no per-url Python call
        (url cardinality ≈ corpus size at web scale)."""
        if batch.num_rows == 0:
            return _SNAP_OUT.empty_table()
        out = (pl.from_arrow(batch)
               .sort("warc_ts_kept", descending=True)
               .group_by("canonical_url")
               .agg(n_snapshots=pl.col("n_snapshots").sum().cast(pl.Int64),
                    warc_ts_kept=pl.col("warc_ts_kept").first(),
                    variant_kept=pl.col("variant_kept").first()))
        return out.to_arrow().cast(_SNAP_OUT)

    from ..common.grouped import sorted_groups

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id"])
    return sorted_groups(
        ds.map_batches(snapshot_rows, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow"),
        "canonical_url", final)


# --------------------------------------------- unicode text normalization

# shared Rust-regex / RE2 subset (same discipline as redact_pii): ASCII
# control chars minus \t\n\r handled by the whitespace pass; explicit
# ASCII whitespace class (RE2's \s) so both engines agree byte-for-byte
NORM_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
NORM_WS_RE = r"[ \t\n\r\f]+"


def normalize_text_batch(batch: pa.Table, *, synthesize: bool = False) -> pa.Table:
    """NFC-normalize → strip control chars → collapse whitespace runs →
    trim — the standard first cleaning pass over scraped web text. With
    ``synthesize``, deterministic mess (decomposed accents, a control
    char, doubled spaces — keyed on doc_id % 4, mirrored in the SQL
    oracle via chr()) is appended first, since the fixture corpus is
    already clean."""
    df = pl.from_arrow(batch).rename({"text": "t"})
    if synthesize:
        df = df.with_columns(
            t=pl.when(pl.col("doc_id") % 4 == 1)
              .then(pl.col("t") + pl.lit(" cafe\u0301"))
              .when(pl.col("doc_id") % 4 == 2)
              .then(pl.col("t") + pl.lit("\x07bell"))
              .when(pl.col("doc_id") % 4 == 3)
              .then(pl.col("t") + pl.lit("  double  space "))
              .otherwise(pl.col("t")))
    out = df.with_columns(
        text_norm=pl.col("t").str.normalize("NFC")
                   .str.replace_all(NORM_CTRL_RE, "")
                   .str.replace_all(NORM_WS_RE, " ")
                   .str.strip_chars(" ")
    ).with_columns(changed=(pl.col("text_norm") != pl.col("t")).cast(pl.Int64))
    return out.select(["doc_id", "text_norm", "changed"]).to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("text_norm", pa.string()),
                   ("changed", pa.int64())]))


def normalize_text(sf_dir: str, *, synthesize: bool = True):
    """Pure per-batch map — no shuffle; at 100 TB this streams the corpus
    once through vectorized Rust-regex/NFC kernels."""
    import ray.data as rd

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: normalize_text_batch(b, synthesize=synthesize),
        batch_format="pyarrow")


# --------------------------------------------- paragraph-level dedup (CCNet)

# deterministic boilerplate paragraphs for the synthesize mode (the fixture
# text has no newlines, so without injection every page is one paragraph and
# the operator would be vacuous — same discipline as redact_pii's synthetic
# PII); mirrored in the SQL oracle via chr(10) concatenation
PAR_BOILER_HEAD = "accept cookies to continue"
PAR_BOILER_TAIL = "subscribe to our newsletter"


def _par_synthesize(df: pl.DataFrame) -> pl.DataFrame:
    return df.with_columns(
        t=pl.when(pl.col("doc_id") % 3 == 0)
          .then(pl.lit(PAR_BOILER_HEAD + "\n") + pl.col("t"))
          .otherwise(pl.col("t"))
    ).with_columns(
        t=pl.when(pl.col("doc_id") % 5 == 0)
          .then(pl.col("t") + pl.lit("\n" + PAR_BOILER_TAIL))
          .otherwise(pl.col("t")))


_PAR_ROW = pa.schema([
    ("bucket", pa.int64()), ("phash", pa.int64()),
    ("doc_id", pa.int64()), ("ord", pa.int64()),
])
_PAR_UNION = pa.schema([
    ("doc_id", pa.int64()), ("ord", pa.int64()), ("t", pa.large_string()),
])
_PAR_OUT = pa.schema([
    ("doc_id", pa.int64()), ("n_pars", pa.int64()),
    ("n_removed", pa.int64()), ("clean_text", pa.large_string()),
])


def paragraph_dedup(sf_dir: str, *, min_df: int = 2, num_buckets: int = 32,
                    synthesize: bool = True):
    """CCNet-style paragraph-level dedup (Wenzek et al. 2020, §3.1): split
    each page into paragraphs on newlines, drop every paragraph that occurs
    in ``min_df``-or-more distinct documents (boilerplate: cookie banners,
    nav bars, newsletter footers — and whole bodies of exact-dup pages),
    and reassemble the survivors in original order.

    Output: one row per doc — (doc_id, n_pars, n_removed, clean_text) with
    ``clean_text = ''`` when everything was boilerplate.

    Scale shape: the df exchange is THIN — the first co-location sort
    moves only (bucket, hash64(par), doc_id, ord) rows (~32 B/paragraph;
    the df kernel never needs the text), and only the *dropped* ordinals
    come back out of it. Reassembly is a second doc_id-keyed co-location
    sort of the union {doc text rows (ord = -1)} ∪ {dropped (doc_id, ord)
    rows}, so the text rides exactly ONE exchange (1× corpus bytes —
    inherent to reassembly) instead of two. df groups on the 64-bit
    paragraph hash, not the string — same collision caveat as
    ``repeated_ngrams``/``decontaminate`` (P(any collision) ≈ n²/2⁶⁵,
    negligible even at 10⁹ distinct paragraphs; a collision can only
    over-drop). Bucket count scales with the corpus exactly like
    ``repeated_ngrams``; no bucket ever holds more than its share of
    *distinct* paragraphs, and df counting is linear in the block.

    The reference has no paragraph surface (documents are opaque to its
    analyzer chain, `hunt-searchengine/src/Hunt/Analyzer.hs`); this is a
    driver-mandate training-data operator.
    """
    import ray.data as rd

    from ..common.grouped import sorted_groups

    def _split_pars(docs: pl.DataFrame) -> pl.DataFrame:
        """(doc_id, t) → exploded (doc_id, ord, par), ord 1-based —
        shared by both sides so the ordinals always line up."""
        if synthesize:
            docs = _par_synthesize(docs)
        return (docs.with_columns(par=pl.col("t").str.split("\n"))
                    .select(["doc_id", "par"])
                    .explode("par")
                    .with_columns(
                        ord=pl.col("par").cum_count().over("doc_id")
                              .cast(pl.Int64)))

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PAR_ROW.empty_table()
        pars = _split_pars(pl.from_arrow(batch).rename({"text": "t"}))
        ph = hash64(pars["par"].to_arrow())
        bucket = (ph % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            "phash": pa.array(ph.view(np.int64), pa.int64()),
            "doc_id": pars["doc_id"].to_arrow(),
            "ord": pars["ord"].to_arrow(),
        }).cast(_PAR_ROW)

    def drops(batch: pa.Table) -> pa.Table:
        """Whole hash groups per block: emit ONLY the dropped ordinals."""
        if batch.num_rows == 0:
            return _PAR_UNION.empty_table()
        df = (pl.from_arrow(batch)
                .filter(pl.col("doc_id").n_unique().over("phash")
                        >= min_df)
                .select(["doc_id", "ord"])
                .with_columns(t=pl.lit(None, dtype=pl.String)))
        return df.to_arrow().cast(_PAR_UNION)

    def doc_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PAR_UNION.empty_table()
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "ord": pa.array(np.full(batch.num_rows, -1), pa.int64()),
            "t": batch.column("text").cast(pa.large_string()),
        }).cast(_PAR_UNION)

    def rebuild(batch: pa.Table) -> pa.Table:
        """Doc groups whole per block: re-split each doc's text (cheap,
        local) and filter out the attached dropped ordinals."""
        if batch.num_rows == 0:
            return _PAR_OUT.empty_table()
        df = pl.from_arrow(batch)
        pars = _split_pars(df.filter(pl.col("ord") == -1)
                             .select(["doc_id", "t"]))
        dropped = (df.filter(pl.col("ord") >= 0)
                     .select(["doc_id", "ord"])
                     .with_columns(dropped=pl.lit(True)))
        out = (pars.join(dropped, on=["doc_id", "ord"], how="left")
                   .sort(["doc_id", "ord"])
                   .group_by("doc_id", maintain_order=True)
                   .agg(n_pars=pl.len().cast(pl.Int64),
                        n_removed=pl.col("dropped").fill_null(False)
                                    .sum().cast(pl.Int64),
                        clean_text=pl.col("par")
                                     .filter(pl.col("dropped").is_null())
                                     .str.join("\n")))
        return out.to_arrow().cast(_PAR_OUT)

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    thin = ds.map_batches(explode, batch_format="pyarrow")
    drop_rows = sorted_groups(thin, "bucket", drops)
    text_rows = ds.map_batches(doc_rows, batch_format="pyarrow")
    return sorted_groups(text_rows.union(drop_rows), "doc_id", rebuild)


# ------------------------------------------------------------------ shuffle-export shards

def _shuffle_keys(batch: pa.Table, seed: int, n_shards: int,
                  hash: str) -> pa.Table:
    """(doc_id, shard, skey_sortable) rows for one batch.

    ``hash="md5"`` is the oracle mode (DuckDB recomputes the identical
    key: first 16 hex chars of md5('<seed>:<doc_id>') as UBIGINT) —
    per-row hashlib like the other md5 oracle siblings. ``hash="fast"``
    is the production mode: vectorized hash64 over the same key strings.
    The emitted ``skey`` is the uint64 key with the sign bit flipped and
    viewed as int64 — order-isomorphic to the unsigned key, so Ray's
    int64 sort reproduces unsigned (UBIGINT) order without touching the
    uint64-overflow path in its sort kernels.
    """
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    strs = [f"{seed}:{i}" for i in ids]
    if hash == "md5":
        keys = np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:16], 16) for s in strs),
            dtype=np.uint64, count=len(strs))
    else:
        keys = hash64(pa.array(strs, pa.string()))
    shard = (keys % np.uint64(n_shards)).astype(np.int64)
    sortable = (keys ^ np.uint64(1 << 63)).view(np.int64)
    return pa.table({
        "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
        "shard": pa.array(shard, pa.int64()),
        "skey": pa.array(sortable, pa.int64()),
    })


def shuffle_assign(sf_dir: str, *, n_shards: int = 8, seed: int = 13,
                   hash: str = "md5"):
    """Deterministic seeded global shuffle → training-shard assignment:
    every doc gets (shard, pos) where ``shard`` spreads docs near-evenly
    by a seeded hash and ``pos`` is the doc's rank inside its shard in
    shuffle-key order — the canonical last stage before training (a
    reproducible random order that is independent of the corpus' storage
    layout, re-derivable for any doc without re-running the shuffle).

    Scale shape: one pure map emits 24-byte rows (never the text), one
    co-location sort on ``shard`` — the same single all-to-all any global
    shuffle pays — then a whole-block kernel enumerates positions
    vectorized across every shard segment. Nothing corpus-sized lands on
    the driver. A shard group must fit in one worker block, so size
    ``n_shards`` the way training exports do anyway: one shard ≈ one
    output file (100–500 MB ⇒ 10⁴–10⁶ shards at web scale), never a
    handful of corpus-sized shards.
    """
    import ray.data as rd

    from ..common.grouped import sorted_groups

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id"])
    keyed = ds.map_batches(
        lambda b: _shuffle_keys(b, seed, n_shards, hash),
        batch_format="pyarrow")

    def enumerate_pos(batch: pa.Table) -> pa.Table:
        """Whole shard groups per block (co-location key is ``shard``
        ALONE — a composite sort key would range-partition on the full
        tuple and can split a shard across blocks); the shuffle order is
        established here by one in-block lexsort on (skey, doc_id)."""
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        sh = batch.column("shard").to_numpy(zero_copy_only=False)
        sk = batch.column("skey").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sk, sh))
        sh, ids = sh[order], ids[order]
        n = len(sh)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shard": pa.array(sh, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    return sorted_groups(keyed, "shard", enumerate_pos)


def shuffle_export(sf_dir: str, out_dir: str, *, n_shards: int = 8,
                   seed: int = 13, hash: str = "fast"):
    """Materialize the shuffled shards: ``out_dir/shard=K/part-K.parquet``
    holds that shard's docs (id + text) in ``pos`` order — resumable
    layout (one directory per shard, re-derivable assignment) and
    deterministic bytes for a given (seed, n_shards).

    The text rides exactly one doc-keyed co-location sort (attach) and
    one (shard, skey) sort — 2 all-to-alls, the floor for a global
    shuffle that must also co-locate payloads. Returns one manifest row
    per shard (shard, rows, path).
    """
    import os

    import ray.data as rd

    from ..common.grouped import sorted_groups

    os.makedirs(out_dir, exist_ok=True)
    assign = shuffle_assign(sf_dir, n_shards=n_shards, seed=seed, hash=hash)
    docs = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])

    # attach text by doc_id: both sides emit (doc_id, ...) rows, one
    # co-location sort brings assignment + payload together
    a = assign.map_batches(
        lambda b: b.append_column("text", pa.array([None] * b.num_rows,
                                                   pa.string())),
        batch_format="pyarrow")
    d = docs.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "shard": pa.array(np.full(b.num_rows, -1), pa.int64()),
            "pos": pa.array(np.full(b.num_rows, -1), pa.int64()),
            "text": b.column("text")}),
        batch_format="pyarrow")

    def fuse(batch: pa.Table) -> pa.Table:
        """ALL doc_id groups of one sorted block: each group has one
        assignment row (-1-free) and one carrier row — fuse vectorized."""
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("shard").to_numpy(zero_copy_only=False)
        po = batch.column("pos").to_numpy(zero_copy_only=False)
        is_assign = sh >= 0
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        # scatter each group's max(shard)/max(pos) (carrier rows are -1)
        seg = np.cumsum(np.r_[True, ids[1:] != ids[:-1]]) - 1
        gsh = np.full(len(starts), -1, np.int64)
        gpo = np.full(len(starts), -1, np.int64)
        np.maximum.at(gsh, seg, sh)
        np.maximum.at(gpo, seg, po)
        keep = ~is_assign  # carrier rows hold the text
        kseg = seg[keep]
        t = batch.column("text")
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "shard": pa.array(gsh[kseg], pa.int64()),
            "pos": pa.array(gpo[kseg], pa.int64()),
            "text": t.filter(pa.array(keep)),
        })

    fused = sorted_groups(a.union(d), "doc_id", fuse)

    def write_shards(batch: pa.Table) -> pa.Table:
        """Whole shard groups per block (key = ``shard`` alone — see
        enumerate_pos): order by pos in-block, write one parquet per
        shard, emit manifest rows (a per-SHARD loop, not per-row)."""
        import pyarrow.parquet as pq

        if batch.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string())})
        sh = batch.column("shard").to_numpy(zero_copy_only=False)
        po = batch.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((po, sh))
        batch = batch.take(pa.array(order))
        sh = sh[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], len(sh)]
        shards, rows, paths = [], [], []
        for lo, hi in zip(starts, ends):
            k = int(sh[lo])
            sdir = os.path.join(out_dir, f"shard={k}")
            os.makedirs(sdir, exist_ok=True)
            path = os.path.join(sdir, f"part-{k}.parquet")
            pq.write_table(batch.slice(lo, hi - lo)
                           .select(["doc_id", "pos", "text"]), path)
            shards.append(k); rows.append(hi - lo); paths.append(path)
        return pa.table({"shard": pa.array(shards, pa.int64()),
                         "rows": pa.array(rows, pa.int64()),
                         "path": pa.array(paths, pa.string())})

    return sorted_groups(fused, "shard", write_shards).sort("shard")


def pack_sequences(sf_dir: str, *, seq_len: int = 2048, n_shards: int = 8,
                   seed: int = 13, hash: str = "md5"):
    """Fixed-length sequence packing — the last mile of a training-data
    pipeline: concatenate each shard's docs in the deterministic
    :func:`shuffle_assign` order and cut the token stream into
    ``seq_len``-token training rows (no padding; sequences straddle doc
    boundaries, the packing norm). Emits one row per doc with its packed
    coordinates — (doc_id, shard, pos, n_tokens, start_tok, first_seq,
    last_seq) — enough for a loader to place every doc, and for any doc
    to be located, without re-running the shuffle.

    Scale shape: identical to shuffle_assign — one pure map emits short
    rows (doc_id, shard, skey, n_tokens; never the text), ONE
    co-location sort on ``shard``, then a whole-block kernel enumerates
    positions AND the per-shard exclusive running token sum vectorized
    (lexsort + cumsum per shard segment). Nothing corpus-sized reaches
    the driver; the same shard-sizing regime as shuffle_assign applies
    (a shard group must fit one worker block — shards are output-file
    sized by construction).
    """
    import ray.data as rd

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _pack_docs(ds, seq_len=seq_len, n_shards=n_shards, seed=seed,
                      hash=hash)


def _keyed_for_pack(batch: pa.Table, seed: int, n_shards: int,
                    hash: str) -> pa.Table:
    """One (doc_id, text) batch → the short packing rows
    (doc_id, shard, skey, n_tokens); the text dies here, before any
    exchange."""
    keys = _shuffle_keys(batch, seed, n_shards, hash)
    text = batch.column("text")
    text = (text.combine_chunks()
            if isinstance(text, pa.ChunkedArray) else text)
    import pyarrow.compute as pc
    low = pl.from_arrow(pc.utf8_lower(text))
    nt = (low.str.count_matches("[a-z0-9_]+")
          .cast(pl.Int64).fill_null(0))
    return keys.append_column("n_tokens", nt.to_arrow())


def _pack_docs(ds, *, seq_len: int, n_shards: int, seed: int, hash: str):
    """Packing core over any (doc_id, text) Dataset — see
    :func:`pack_sequences` for semantics and scale shape."""
    keyed_ds = ds.map_batches(
        lambda b: _keyed_for_pack(b, seed, n_shards, hash),
        batch_format="pyarrow")
    return _pack_keyed(keyed_ds, seq_len=seq_len)


def _pack_keyed(keyed_ds, *, seq_len: int):
    """The pack stage proper: one shard-keyed co-location sort of the
    short (doc_id, shard, skey, n_tokens) rows, then the whole-block
    position/token-cumsum kernel."""
    from ..common.grouped import sorted_groups

    L = int(seq_len)

    def pack(batch: pa.Table) -> pa.Table:
        cols = ["doc_id", "shard", "pos", "n_tokens", "start_tok",
                "first_seq", "last_seq"]
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        sh = batch.column("shard").to_numpy(zero_copy_only=False)
        sk = batch.column("skey").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sk, sh))
        sh, ids, nt = sh[order], ids[order], nt[order].astype(np.int64)
        n = len(sh)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        excl = np.cumsum(nt) - nt
        start_tok = excl - np.repeat(excl[starts], lens)
        first_seq = start_tok // L
        last_seq = (start_tok + np.maximum(nt, 1) - 1) // L
        vals = (ids, sh, pos, nt, start_tok, first_seq, last_seq)
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in zip(cols, vals)})

    return sorted_groups(keyed_ds, "shard", pack)


def training_recipe(sf_dir: str, *, min_tokens: int = 20,
                    max_stopword_ratio: float = 0.15,
                    langs: tuple[str, ...] = ("en", "es", "fr", "de"),
                    dedup_threshold: float = 0.75, decontam_n: int = 4,
                    eval_mod: int = 19, seq_len: int = 512,
                    n_shards: int = 8, seed: int = 13, hash: str = "md5",
                    pair_source: str = "exact"):
    """The end-to-end training-data recipe, composed from this repo's
    oracled stages: quality/language clean → near-dup cluster-loser
    removal → eval-set exclusion + n-gram decontamination → seeded
    global shuffle → fixed-length sequence packing. Returns the packed
    coordinates (doc_id, shard, pos, n_tokens, start_tok, first_seq,
    last_seq) of every SURVIVING doc — the manifest a training run
    loads from.

    Scale shape: the quality/lang predicate prunes in-map (rows die
    before any shuffle, as in ``textstats.corpus_clean``) and the text
    dies in the same map — survivors leave it as short
    (doc_id, shard, skey, n_tokens) rows; the drop sets (near-dup
    cluster losers, contaminated docs) stay DATASETS of bare doc_id
    rows and are removed by a distributed doc_id-keyed co-location
    anti-join — nothing corpus-proportional ever lands on the driver
    (at 100 TB the loser set is billions of ids; the former
    ``to_pandas()``→``ray.put`` broadcast was the last driver-sized
    object in the tree). Packing then pays shuffle_assign's single
    shard-keyed sort; both exchanges move ≤40-byte rows. The corpus
    streams exactly twice (once into the pair finder, once here).
    ``pair_source="exact"`` (Σ df(g)² shingle Jaccard) keeps the whole
    recipe DuckDB-oracled end to end; ``pair_source="minhash"`` is the
    web-scale swap (``dedup.minhash_components`` — same loser-set
    contract, probabilistic pair recall measured in q_dedup_recall).
    """
    import ray.data as rd

    from ..common.grouped import sorted_groups
    from .dedup import dedup_components, minhash_components
    from .textstats import STOPWORDS

    comp = (minhash_components(sf_dir, threshold=dedup_threshold)
            if pair_source == "minhash"
            else dedup_components(sf_dir, threshold=dedup_threshold))

    def _drop_rows(ids: np.ndarray) -> pa.Table:
        z = pa.array(np.zeros(len(ids), np.int64))
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "shard": z, "skey": z, "n_tokens": z,
            "role": pa.array(np.ones(len(ids), np.int64)),
        })

    def tag_losers(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        return _drop_rows(ids[ids != cl])

    def tag_cont(batch: pa.Table) -> pa.Table:
        return _drop_rows(
            batch.column("doc_id").to_numpy(zero_copy_only=False))

    stop = list(STOPWORDS)
    lang_set = list(langs)

    def keep_keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = _flat_tokens(batch)
        agg = (df.group_by("doc_id")
               .agg(n_tokens=pl.len().cast(pl.Int64),
                    n_stop=pl.col("term").is_in(stop).sum()
                    .cast(pl.Float64))
               .sort("doc_id"))
        aid = agg["doc_id"].to_numpy()
        at = agg["n_tokens"].to_numpy()
        ast = agg["n_stop"].to_numpy()
        pos = np.searchsorted(aid, ids)
        pos_c = np.minimum(pos, max(len(aid) - 1, 0))
        found = (pos < len(aid)) & (aid[pos_c] == ids) if len(aid) \
            else np.zeros(len(ids), bool)
        nt = np.where(found, at[pos_c] if len(aid) else 0, 0)
        nst = np.where(found, ast[pos_c] if len(aid) else 0.0, 0.0)
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        ratio = np.divide(nst, nt, out=np.ones_like(nst), where=nt > 0)
        mask = ((nt >= min_tokens) & (ratio <= max_stopword_ratio)
                & np.isin(lang, lang_set) & (ids % eval_mod != 0))
        kept = batch.filter(pa.array(mask))
        keys = _keyed_for_pack(kept, seed, n_shards, hash)
        return keys.append_column(
            "role", pa.array(np.zeros(keys.num_rows, np.int64)))

    def anti(batch: pa.Table) -> pa.Table:
        """doc_id-sorted block of complete groups: drop every group
        containing a role-1 (loser/contaminated) row, keep the role-0
        survivors."""
        if batch.num_rows == 0:
            return batch.drop_columns(["role"])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        role = batch.column("role").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        lens = np.diff(np.r_[starts, len(ids)])
        gmax = np.repeat(np.maximum.reduceat(role, starts), lens)
        return batch.filter(pa.array((gmax == 0) & (role == 0))) \
            .drop_columns(["role"])

    from ..common.grouped import as_dataset
    drops = (as_dataset(comp).map_batches(tag_losers, batch_format="pyarrow")
             .union(as_dataset(decontaminate(sf_dir, n=decontam_n,
                                             eval_mod=eval_mod))
                    .map_batches(tag_cont, batch_format="pyarrow")))
    corpus = (rd.read_parquet(_doc_path(sf_dir),
                              columns=["doc_id", "text", "lang"])
              .map_batches(keep_keyed, batch_format="pyarrow"))
    survivors = sorted_groups(corpus.union(drops), "doc_id", anti)
    return _pack_keyed(survivors, seq_len=seq_len)


# ----------------------------------- Bloom decontamination (the scale mode)

_BLOOM_A1 = np.uint64(0x9E3779B185EBCA87)
_BLOOM_A2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_bases(grams: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Two independent log2(m)-bit base hashes via multiply-shift (high
    bits of two odd-constant products). Taking ``(h1 + i*h2) & (m-1)``
    directly off the raw 64-bit hash would use only its LOW log2(m) bits
    for BOTH bases — every pair of grams agreeing on those bits would
    share the entire probe sequence, collapsing the false-positive rate
    to n/m (measured: 3% at n=4k, m=2^17) instead of ~0.5^k."""
    b = int(m).bit_length() - 1
    sh = np.uint64(64 - b)
    g = grams.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (g * _BLOOM_A1) >> sh
        h2 = ((g * _BLOOM_A2) >> sh) | np.uint64(1)
    return h1, h2


def bloom_build(grams: np.ndarray, bits_per_gram: int = 24
                ) -> tuple[np.ndarray, int, int]:
    """Bloom bit array over uint64 gram hashes → (byte array, m bits, k).

    Double hashing (Kirsch–Mitzenmacher): position_i = (h1 + i·h2) mod m
    with h1 = the gram hash, h2 = an odd remix — no per-probe rehash. m is
    rounded up to a power of two so the mod is a mask; k = ln2·m/n.
    """
    n = max(1, int(len(grams)))
    m = 1 << int(np.ceil(np.log2(max(64, n * bits_per_gram))))
    k = max(1, int(round(np.log(2) * m / n)))
    arr = np.zeros(m >> 3, np.uint8)
    if len(grams):
        h1, h2 = _bloom_bases(grams, m)
        mask = np.uint64(m - 1)
        for i in range(k):
            with np.errstate(over="ignore"):
                idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                arr, (idx >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return arr, m, k


def bloom_probe(arr: np.ndarray, m: int, k: int,
                grams: np.ndarray) -> np.ndarray:
    """Vectorized membership probe → bool array (no false negatives)."""
    if not len(grams):
        return np.zeros(0, bool)
    hit = np.ones(len(grams), bool)
    h1, h2 = _bloom_bases(grams, m)
    mask = np.uint64(m - 1)
    for i in range(k):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) & mask
        bit = (arr[(idx >> np.uint64(3)).astype(np.int64)]
               >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        hit &= bit.astype(bool)
        if not hit.any():
            break
    return hit


def decontaminate_bloom(sf_dir: str, *, n: int = 4, eval_mod: int = 19,
                        bits_per_gram: int = 24):
    """:func:`decontaminate`'s web-scale sibling: the broadcast side is a
    Bloom filter over the eval gram hashes instead of the sorted hash
    array — bits_per_gram bits per gram instead of 64, O(k) bit probes
    instead of a log-n binary search per gram. Guarantees NO false
    negatives (every truly contaminated doc is flagged); false positives
    over-flag at ~0.5^k per gram (≈8e-6 at the default 24 bits/gram), the
    safe direction for decontamination — audited by
    :func:`decontaminate_bloom_audit`.

    Same output shape as :func:`decontaminate`: (doc_id, n_hit_grams) for
    flagged non-eval docs; n_hit_grams counts Bloom-positive grams (≥ the
    exact count, equal when no gram false-positives hit the doc).
    """
    import ray
    import ray.data as rd

    arr, m, k = bloom_build(eval_gram_set(sf_dir, n=n, eval_mod=eval_mod),
                            bits_per_gram)
    arr_ref = ray.put(arr)  # broadcast once; m, k are closure scalars

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(arr_ref)
        ids, hs = word_ngram_hashes(batch, n)
        ids = np.asarray(ids, dtype=np.int64)
        counts = np.asarray([len(h) for h in hs], dtype=np.int64)
        flat = (np.concatenate(hs) if len(hs)
                else np.empty(0, np.uint64))
        hit = bloom_probe(bits, m, k, flat)
        seg = np.repeat(np.arange(len(ids)), counts)
        nh = np.bincount(seg[hit], minlength=len(ids)).astype(np.int64) \
            if flat.size else np.zeros(len(ids), np.int64)
        keep = (nh > 0) & ((ids % eval_mod) != 0)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_hit_grams": pa.array(nh[keep], pa.int64())})

    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ensure_schema(ds.map_batches(probe, batch_format="pyarrow"),
                         pa.schema([("doc_id", pa.int64()), ("n_hit_grams", pa.int64())]))


def decontaminate_bloom_audit(sf_dir: str, *, n: int = 4,
                              eval_mod: int = 19,
                              bits_per_gram: int = 24) -> pa.Table:
    """Self-check row for the Bloom mode vs the exact mode: flagged-doc
    counts both ways, missed docs (MUST be 0 — Bloom has no false
    negatives), over-flagged docs, the doc-level false-positive rate, and
    a boolean verdict. Driver-visible like q_dedup_recall."""
    exact = set(decontaminate(sf_dir, n=n, eval_mod=eval_mod)
                .to_pandas()["doc_id"])
    bloom = set(decontaminate_bloom(sf_dir, n=n, eval_mod=eval_mod,
                                    bits_per_gram=bits_per_gram)
                .to_pandas()["doc_id"])
    missed = len(exact - bloom)
    extra = len(bloom - exact)
    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(_doc_path(sf_dir)).num_rows
    clean = max(1, n_docs - len(exact))
    return pa.table({
        "exact_docs": pa.array([len(exact)], pa.int64()),
        "bloom_docs": pa.array([len(bloom)], pa.int64()),
        "missed_docs": pa.array([missed], pa.int64()),
        "extra_docs": pa.array([extra], pa.int64()),
        "doc_fp_rate": pa.array([round(extra / clean, 6)], pa.float64()),
        "no_false_negatives": pa.array([missed == 0], pa.bool_()),
    })
