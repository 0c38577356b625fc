"""Unicode parity between the engine kernels (Rust regex / Arrow
utf8proc) and the DuckDB oracles (its own lower + RE2) on the operators
whose definitions the unicode perturbation sweep caught diverging:

- char-gram jaccard: Python str.lower() is context-sensitive (final
  sigma, İ → i+dot) → engine now lowers with Arrow utf8_lower (utf8proc
  simple 1:1 mapping, DuckDB-compatible);
- substring_stats: engine grams are utf-8 BYTE windows → the oracle
  grams over hex(encode(text)) so substring() is byte-exact;
- token_count_bpe: Rust `\\s` is Unicode White_Space, RE2 `\\s` is
  ASCII → the oracle spells the White_Space class explicitly;
- index bm25: the analyzer tokenizes raw ASCII `\\w+` runs THEN
  lowercases → the oracle does the same instead of lower-then-extract
  (lower('İ')='i' and lower('K')='k' land INSIDE [a-z], inventing
  tokens the index never saw).

Each test runs the real driver query against its real oracle on a tiny
corpus stuffed with the landmine characters.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

GAUNTLET = [
    "CAFÉ naïve Ångström café again",
    "İstanbul ıı İİ and ascii tail",
    "STRAẞE größe ßß words",
    "KELVIN K sign 2K here",
    "ΣΙΣΥΦΟΣ "
    "σίσυφος sigma",
    "nbsp mid ideo　space nelbr thin sp",
    "emoji \U0001f389 mix42 ｍｉｘ fullwidth",
]


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_unicode", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _mk_docs(tmp_path, texts):
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _compare(entry, sf, name, sort_keys):
    got = (entry.queries()[name](sf).to_pandas()
           .sort_values(sort_keys).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(entry.oracle_sql()[name]).df()
            .sort_values(sort_keys).reset_index(drop=True)[got.columns])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_exact=True)
    return got


def test_token_count_bpe_unicode_whitespace(entry, tmp_path):
    got = _compare(entry, _mk_docs(tmp_path, GAUNTLET),
                   "q_token_count_bpe", ["doc_id"])
    # NBSP / ideographic space / NEL / thin space all split ws tokens
    row = got.set_index("doc_id").loc[5]
    assert row["n_ws_tokens"] == 8


def test_ngram_jaccard_unicode_lower(entry, tmp_path):
    # near-identical pairs that differ only in case of landmine chars:
    # utf8proc simple lower maps them identically on both sides
    texts = [t for t in GAUNTLET for _ in (0, 1)]
    texts[1] = texts[1].lower()  # python lower ≠ utf8proc on É? (same)
    got = _compare(entry, _mk_docs(tmp_path, texts),
                   "q_ngram_jaccard", ["doc_a", "doc_b"])
    # every adjacent duplicate pair must appear with jaccard 1.0-ish
    assert len(got) >= len(GAUNTLET)


def test_substring_stats_byte_grams(entry, tmp_path):
    # multi-byte chars: 40-char docs are >40 bytes; duplicate one doc so
    # dup_grams fires; byte-gram counts must match the hex oracle
    texts = [(g * 8)[:60] for g in GAUNTLET] + [(GAUNTLET[0] * 8)[:60]]
    got = _compare(entry, _mk_docs(tmp_path, texts),
                   "q_substring_stats", ["doc_id"])
    a = got.set_index("doc_id")
    assert a.loc[0, "dup_grams"] == a.loc[0, "n_grams"]  # exact dup doc
    # byte count, not char count: 60 chars of doc 0 are >60 bytes
    assert a.loc[0, "n_grams"] > 60 - 40 + 1


def test_index_bm25_tokenize_then_lower(entry, tmp_path):
    # 'İstanbul' must NOT produce token 'istanbul' (the analyzer sees
    # raw '\w+' runs: 'stanbul'), and 2K (Kelvin) must not become '2k'
    texts = [("document search engine " + g) for g in GAUNTLET]
    _compare(entry, _mk_docs(tmp_path, texts),
             "q_index_bm25", ["query", "rank"])
