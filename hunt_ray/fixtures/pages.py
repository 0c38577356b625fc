"""Deterministic synthetic `pages` corpus (input_hint shape; FIXTURES.md §1).

Schema: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``. Everything is a pure function of ``(seed, n_rows)`` — no
external data. The html embeds ``<script>``/``<noscript>`` blocks that the
extractor must drop (ref: html-hunter/HtmlHunter.hs:262-267), and ``text``
is composed *independently* of the extractor so the byte-identity invariant
``extract_body(html) == text`` is a real test.

Rows 0..2 are canon documents modeled on the reference test fixtures
(``hunt-searchengine/test/Hunt/TestHelper.hs:225-271``): a "Brain" doc with
the planted phrase "take over the world", a date doc (2013-01-01), an int
doc (6443264).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# bump when the generated corpus changes shape/content, so external caches
# (e.g. flagship.rank_identity's /tmp pages dir) invalidate
FIXTURE_VERSION = 3

# every page carries three <a href> outlinks to test://{(g*m + c + 1) %
# n_total} (g = global row index) wrapped around existing body words at
# these token slots — anchors add only tags, so the byte-identity
# invariant extract_body(html) == text is untouched (tags → space →
# whitespace collapse). Dangling/duplicate targets are allowed, like the
# real web; analyze.html.extract_links recovers the edge list.
LINK_MULT = (31, 17, 13)
LINK_SLOTS = (10, 17, 24)

BASE_TS_US = 1356998400000000  # 2013-01-01T00:00:00Z in microseconds
TS_STEP_US = 37_000_000

_SYLLABLES = [
    "ba", "ra", "ta", "mo", "li", "zen", "kor", "ve", "shi", "dun",
    "pa", "go", "ne", "xu", "fra", "mi", "sol", "ter", "qui", "lum",
]

PLANTED_PHRASE = "take over the world"
HEAD_TERM = "the"


def build_vocab(seed: int = 42, size: int = 10_000) -> list[str]:
    """Deterministic vocabulary: function words, synthetic words (a few
    Capitalized), date- and int-shaped tokens."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = [
        "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
        "take", "over", "world", "brain", "Brain", "pinky", "Pinky",
        "mission", "tonight", "data", "text", "search", "index", "query",
        "2013-01-01", "2013-02-15", "2013-06-30", "2014-11-11",
        "6443264", "42", "1024", "-17",
        # geo-position tokens (reference geoDoc canon "53.60000-10.00000",
        # TestHelper.hs:258-265)
        "53.6-10.0", "1-1", "25.5-7.25", "-3.25-100.5",
    ]
    seen = set(vocab)
    while len(vocab) < size:
        n = rng.integers(2, 5)
        w = "".join(_SYLLABLES[i] for i in rng.integers(0, len(_SYLLABLES), n))
        if rng.random() < 0.02:
            w = w.capitalize()
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab[:size]


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _mk_html(title: str, headline: str, para: str, h2: str | None = None,
             para_html: str | None = None) -> str:
    h2_part = f"<h2>{_escape(h2)}</h2>" if h2 else ""
    return (
        "<html><head>"
        f"<title>{_escape(title)}</title>"
        "<script type=\"text/javascript\">var ignored = 'SCRIPTNOISE';</script>"
        "</head><body>"
        f"<h1>{_escape(headline)}</h1>"
        f"{h2_part}"
        "<script>console.log('SCRIPTNOISE2');</script>"
        f"<p>{para_html if para_html is not None else _escape(para)}</p>"
        "<noscript>NOSCRIPTNOISE</noscript>"
        "</body></html>"
    )


def _para_html_with_links(toks: list[str], hrefs: list[str]) -> str:
    """Escape tokens and wrap the LINK_SLOTS words in anchors — identical
    extracted text to ``_escape(" ".join(toks))`` (tags become spaces and
    collapse), so the byte-identity invariant holds."""
    esc = [_escape(t) for t in toks]
    for slot, href in zip(LINK_SLOTS, hrefs):
        if slot < len(esc):
            esc[slot] = f'<a href="{href}">{esc[slot]}</a>'
    return " ".join(esc)


def _body_text(headline: str, para: str, h2: str | None = None) -> str:
    """The composition extract_body must reproduce byte-identically."""
    parts = [headline] + ([h2] if h2 else []) + [para]
    return " ".join(" ".join(p.split()) for p in parts if p)


def generate_pages(seed: int = 42, n_rows: int = 2000, url_offset: int = 0,
                   n_total: int | None = None) -> pa.Table:
    """Deterministic pages chunk; ``url_offset`` shifts urls/timestamps so
    independently-generated chunks form one corpus (canon docs only in the
    offset-0 chunk). ``n_total`` bounds the outlink target space (defaults
    to ``url_offset + n_rows``; chunked callers pass the full corpus size
    so link targets span it)."""
    rng = np.random.default_rng(seed + 1)
    vocab = np.asarray(build_vocab(42), dtype=object)
    probs = _zipf_probs(len(vocab))

    n_tokens = rng.integers(50, 401, size=n_rows)
    total = int(n_tokens.sum())
    flat = rng.choice(len(vocab), size=total, p=probs)
    ends = np.cumsum(n_tokens)
    starts = ends - n_tokens

    urls, htmls, texts, langs = [], [], [], []
    for i in range(n_rows):
        toks = list(vocab[flat[starts[i]:ends[i]]])
        if url_offset:
            i_kind = 3  # no canon docs outside the first chunk
        else:
            i_kind = i
        if i_kind == 0:
            title, headline = "Brain", "Pinky and the Brain"
            toks[:8] = ["brain", "mission", "take", "over", "the", "world", "tonight", "pinky"]
        elif i_kind == 1:
            title, headline = "Date doc", "history 2013-01-01"
            toks[:3] = ["on", "2013-01-01", "something"]
        elif i_kind == 2:
            title, headline = "Int doc", "numbers"
            toks[:2] = ["int", "6443264"]
        elif i_kind == 3:
            # canon geo doc (geoDoc, TestHelper.hs:258-265)
            title, headline = "Geo doc", "geo location hamburg"
            toks[:3] = ["at", "53.6-10.0", "today"]
        else:
            title = " ".join(vocab[rng.choice(len(vocab), size=2, p=probs)])
            headline = " ".join(vocab[rng.choice(len(vocab), size=3, p=probs)])
            if rng.random() < 0.05:
                # plant the canonical phrase at a token-aligned slot
                at = int(rng.integers(0, max(1, len(toks) - 4)))
                toks[at:at + 4] = PLANTED_PHRASE.split()
            if rng.random() < 0.03:
                toks[int(rng.integers(0, len(toks)))] = "&"  # entity round-trip
        para = " ".join(toks)
        h2 = "notes" if i % 7 == 3 else None
        g = url_offset + i
        n_tot = n_total if n_total is not None else url_offset + n_rows
        hrefs = [f"test://{(g * m + c + 1) % n_tot}"
                 for c, m in enumerate(LINK_MULT)]
        urls.append(f"test://{g}")
        htmls.append(_mk_html(
            title, headline, para, h2,
            para_html=_para_html_with_links(toks, hrefs)).encode("utf-8"))
        texts.append(_body_text(headline, para, h2))
        langs.append("de" if (i % 10) == 9 else "en")

    ts = (BASE_TS_US + TS_STEP_US * (url_offset + np.arange(n_rows, dtype=np.int64)))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_pages(out_dir: str, seed: int = 42, n_rows: int = 2000,
                rows_per_file: int = 1000) -> str:
    """Write the corpus as multiple parquet files (multiple Ray read blocks)."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_pages(seed, n_rows)
    k = 0
    for lo in range(0, n_rows, rows_per_file):
        chunk = table.slice(lo, min(rows_per_file, n_rows - lo))
        pq.write_table(chunk, os.path.join(out_dir, f"pages-{k:05d}.parquet"))
        k += 1
    return out_dir


def pages_from_documents(documents_parquet: str, out_dir: str,
                         rows_per_file: int = 4096) -> str:
    """Derive an input_hint-shaped pages table from the driver's generic
    ``documents`` table (TESTDATA.md) — deterministic, no external data.

    Used by bench.py so the benchmark corpus scales with $GRAFT_SF_DIR.
    """
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(documents_parquet, columns=["doc_id", "text", "lang"])
    doc_ids = src.column("doc_id").to_pylist()
    doc_texts = src.column("text").to_pylist()
    doc_langs = src.column("lang").to_pylist()
    n = len(doc_ids)
    urls, htmls, texts, langs = [], [], [], []
    for i in range(n):
        did = doc_ids[i]
        title = f"document {did}"
        headline = f"doc {did} heading"
        para = doc_texts[i] or ""
        urls.append(f"doc://{did}")
        htmls.append(_mk_html(title, headline, para).encode("utf-8"))
        texts.append(_body_text(headline, para))
        langs.append(doc_langs[i] or "en")
    ts = (BASE_TS_US + TS_STEP_US * np.arange(n, dtype=np.int64))
    table = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    k = 0
    for lo in range(0, n, rows_per_file):
        chunk = table.slice(lo, min(rows_per_file, n - lo))
        pq.write_table(chunk, os.path.join(out_dir, f"pages-{k:05d}.parquet"))
        k += 1
    return out_dir
