"""Vectorized tokenization + analysis, mirroring Hunt's analyzer exactly.

Hunt's ``toDocAndWords'`` (``Hunt/Index/Schema/Analyze.hs:47-85``) does, per
document and context, in this order:

1. tokenize by the schema regex (``scanTextRE``, Analyze.hs:91-92)
2. drop tokens failing the context-type validator
3. assign 1-based positions over the *remaining* tokens
4. apply the normalizer chain to each token
5. group into ``Map Word [Position]`` (positions stay ascending)

We preserve that order exactly; steps 1–4 are Arrow/numpy kernels over the
whole batch (tokens never become Python objects), step 5 is a polars
group_by (Rust hash-group, keeps within-group row order → positions
ascending).

The text tokenizer is ``\\w+`` runs (RE2 semantics), the vectorized
equivalent of Hunt's XML-Schema ``\\w*`` scanner for our corpus;
html-hunter's index-side "non-alphanumeric → space" filter
(``html-hunter/HtmlHunter.hs:315-328``) is subsumed by tokenizing word runs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from .normalize import NORMALIZERS, VALIDATORS, apply_normalizer_chain
from .schema import ContextSchema

_TEXT_PATTERNS = (r"\w+",)  # patterns with a fast Arrow split path


@dataclass
class TokenStream:
    """Flat token stream for one context over a batch of documents."""

    doc_idx: np.ndarray   # int64, index into the batch
    tokens: pa.Array      # string array of normalized tokens
    positions: np.ndarray  # uint32, 1-based position among valid raw tokens

    def tokens_list(self) -> list[str]:
        return self.tokens.to_pylist()


def _flat_tokens_fast(texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized \\w+ tokenization via Arrow kernels (no per-row Python)."""
    cleaned = pc.replace_substring_regex(texts, pattern=r"[^\w]+", replacement=" ")
    lists = pc.ascii_split_whitespace(cleaned)
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    flat = lists.flatten()
    n_docs = len(texts)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    # the split can emit empty tokens at boundaries; Hunt drops them via the
    # non-empty validator BEFORE assigning positions (Analyze.hs:62-66).
    # positions = rank among non-empty tokens within the doc, computed with
    # one cumsum (no run detection)
    lengths = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    nonempty = lengths > 0
    c = np.cumsum(nonempty, dtype=np.int64)
    starts_tok = np.cumsum(counts) - counts
    base = (c - nonempty)[starts_tok] if len(c) else np.zeros(0, np.int64)
    positions_all = c - np.repeat(base, counts)
    if not nonempty.all():
        keep = np.flatnonzero(nonempty)
        flat = flat.take(pa.array(keep))
        doc_idx = doc_idx[keep]
        positions = positions_all[keep].astype(np.uint32)
    else:
        positions = positions_all.astype(np.uint32)
    return doc_idx, flat, positions


def _flat_tokens_regex(texts: pa.Array, pattern: str) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized regex scan for non-\\w+ tokenizers (int/date/geo
    contexts): polars ``str.extract_all`` (Rust regex crate, leftmost-first
    alternation like Python ``re``) over the whole column. Patterns the
    Rust engine rejects (lookaround, backrefs) fall back to a per-row
    Python findall."""
    s = pl.from_arrow(texts)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    try:
        lists = s.str.extract_all(pattern)
    except Exception:  # unsupported pattern features → slow path
        return _flat_tokens_regex_py(texts, pattern)
    counts = lists.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = lists.explode().drop_nulls()  # empty/null docs explode to null rows
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    positions = _positions_within(doc_idx)
    tokens = flat.to_arrow()
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    return doc_idx, tokens, positions


def _flat_tokens_regex_py(texts: pa.Array, pattern: str) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Per-doc Python findall fallback (NOTE: with capturing groups Python
    ``findall`` returns group contents — use non-capturing groups)."""
    rex = re.compile(pattern)
    tokens_l: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    py = texts.to_pylist()
    for i, t in enumerate(py):
        if not t:
            continue
        toks = rex.findall(t)
        if toks:
            counts[i] = len(toks)
            tokens_l.extend(toks)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    positions = _positions_within(doc_idx)
    return doc_idx, pa.array(tokens_l, type=pa.large_string()), positions


def tokenize_context(texts: pa.Array | pa.ChunkedArray, cschema: ContextSchema) -> TokenStream:
    """Steps 1–4 of the analyzer for one context over a batch of texts."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    pattern = cschema.token_pattern
    if pattern in _TEXT_PATTERNS:
        doc_idx, tokens, positions = _flat_tokens_fast(texts)
    else:
        doc_idx, tokens, positions = _flat_tokens_regex(texts, pattern)

    # 2. validator filter (the fast tokenizer only emits non-empty tokens,
    # so the text validator is a no-op; int/date can drop tokens and
    # positions are re-assigned over the survivors)
    if cschema.ctype.validator not in ("text", "text-small") and len(tokens):
        mask = VALIDATORS[cschema.ctype.validator](tokens)
        if not mask.all():
            keep = np.flatnonzero(mask)
            doc_idx = doc_idx[keep]
            tokens = tokens.take(pa.array(keep))
            positions = _positions_within(doc_idx)
    # 3. positions already assigned; 4. normalizer chain, then key proxy
    if len(tokens):
        tokens = apply_normalizer_chain(list(cschema.normalizers), tokens)
        if cschema.ctype.key_normalizer:
            tokens = NORMALIZERS[cschema.ctype.key_normalizer](tokens)
    return TokenStream(doc_idx=doc_idx, tokens=tokens, positions=positions)


def _positions_within(sorted_doc_idx: np.ndarray) -> np.ndarray:
    """1-based rank within runs of equal doc_idx (doc_idx is run-sorted)."""
    n = len(sorted_doc_idx)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    np.not_equal(sorted_doc_idx[1:], sorted_doc_idx[:-1], out=new_run[1:])
    run_ids = np.cumsum(new_run) - 1
    run_starts_at = np.flatnonzero(new_run)
    idx = np.arange(n, dtype=np.int64)
    return (idx - run_starts_at[run_ids] + 1).astype(np.uint32)


_POSTINGS_SCHEMA = pl.Schema({
    "term": pl.String,
    "doc_id": pl.UInt64,
    "tf": pl.UInt32,
    "positions": pl.List(pl.UInt32),
})


def group_postings(stream: TokenStream, doc_ids: np.ndarray) -> pl.DataFrame:
    """Step 5: group the flat stream into per-(doc, term) posting rows.

    Returns a polars frame with columns
    ``term (str), doc_id (u64), tf (u32), positions (list[u32])``; positions
    ascending within each row (Hunt's ``toWordList`` DList-snoc order,
    Analyze.hs:73-85).
    """
    if len(stream.tokens) == 0:
        return pl.DataFrame(schema=_POSTINGS_SCHEMA)
    terms = pl.from_arrow(stream.tokens)
    if isinstance(terms, pl.DataFrame):
        terms = terms.to_series()
    df = pl.DataFrame(
        {
            "term": terms.cast(pl.String),
            "doc_id": pl.Series(doc_ids[stream.doc_idx], dtype=pl.UInt64),
            "positions": pl.Series(stream.positions, dtype=pl.UInt32),
        }
    )
    return (
        df.group_by(["term", "doc_id"])
        .agg(tf=pl.len().cast(pl.UInt32), positions=pl.col("positions"))
        .select(["term", "doc_id", "tf", "positions"])
    )


def token_counts(texts: pa.Array | pa.ChunkedArray, cschema: ContextSchema) -> np.ndarray:
    """Per-doc count of valid tokens (document length) — no grouping."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    stream = tokenize_context(texts, cschema)
    return np.bincount(stream.doc_idx, minlength=len(texts)).astype(np.uint32)
