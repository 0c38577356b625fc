"""HTML → text extraction, mirroring html-hunter's pipeline.

The reference extracts per-context text from parsed HTML
(``html-hunter/HtmlHunter.hs``): script/noscript subtrees are dropped
(HtmlHunter.hs:262-267), per-context selections take the text nodes of
``body`` / ``title`` / ``h1..h6`` (HtmlHunter.hs:288-335), and whitespace is
normalized with ``unwords . words`` (HtmlHunter.hs:315-328,403-410).

We reimplement this with vectorized RE2 kernels over the whole Arrow column.
A general HTML5 parser is *not* byte-compatible with HXT on arbitrary web
HTML; the fixture generator (hunt_ray.fixtures.pages) emits well-formed HTML
for which this extraction is exact, and the per-row invariant
``extract_body(html) == text`` is enforced on that corpus (tests +
``validate_text_invariant``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must come last
]


def _as_string_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_string() if pa.types.is_large_binary(arr.type) else pa.string())
    return arr


def _unescape(arr: pa.Array) -> pa.Array:
    for ent, rep in _ENTITIES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=rep)
    return arr


def _normalize_ws(arr: pa.Array) -> pa.Array:
    """unwords . words — collapse whitespace runs, trim."""
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(arr)


def _drop_scripts(arr: pa.Array) -> pa.Array:
    arr = pc.replace_substring_regex(
        arr, pattern=r"(?s)<script[^>]*>.*?</script>", replacement=" "
    )
    return pc.replace_substring_regex(
        arr, pattern=r"(?s)<noscript[^>]*>.*?</noscript>", replacement=" "
    )


def extract_body(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """All text nodes of <body>, space-joined, whitespace-normalized."""
    arr = _drop_scripts(_as_string_array(html))
    st = pc.extract_regex(arr, pattern=r"(?s)<body[^>]*>(?P<b>.*)</body>")
    body = pc.struct_field(st, "b")
    body = pc.if_else(pc.is_null(body), pa.scalar("", type=body.type), body)
    body = pc.replace_substring_regex(body, pattern=r"<[^>]*>", replacement=" ")
    return _normalize_ws(_unescape(body))


def extract_title(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    arr = _as_string_array(html)
    st = pc.extract_regex(arr, pattern=r"(?s)<title[^>]*>(?P<t>.*?)</title>")
    title = pc.struct_field(st, "t")
    title = pc.if_else(pc.is_null(title), pa.scalar("", type=title.type), title)
    return _normalize_ws(_unescape(title))


def extract_headlines(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Text of all h1..h6 elements, space-joined (HtmlHunter.hs:330-335).

    Vectorized: one Rust-regex extract_all over the column, headline
    elements joined per row, tags stripped, whitespace-normalized (the
    join+strip order yields the same normalized text as per-match
    stripping)."""
    import polars as pl

    arr = _drop_scripts(_as_string_array(html))
    s = pl.from_arrow(arr)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    joined = (s.str.extract_all(r"(?s)<h[1-6][^>]*>.*?</h[1-6]>")
              .list.join(" ").fill_null(""))
    res = joined.to_arrow()
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    res = pc.replace_substring_regex(res, pattern=r"<[^>]*>", replacement=" ")
    return _normalize_ws(_unescape(res)).cast(pa.string())


def extract_links(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """All <a href="..."> targets per page, document order, duplicates
    kept (the real web repeats links) → list<large_string>.

    Vectorized: scripts dropped first (script bodies can quote hrefs),
    then one Rust-regex extract_all over the column and a per-element
    group extract. The reference's crawler collects links from parsed
    documents the same way (hunt-crawler/src/Holumbus/Crawler/Html.hs,
    `getHtmlReferences`); here link extraction is an analysis kernel over
    the stored html column instead of a fetch loop."""
    import polars as pl

    arr = _drop_scripts(_as_string_array(html))
    s = pl.from_arrow(arr)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    links = (s.str.extract_all(r'<a\s[^>]*?href="([^"]*)"')
              .list.eval(pl.element().str.extract(r'href="([^"]*)"', 1)))
    res = links.to_arrow()
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    return res


def extract_anchors(html: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Per page, the (href, anchor-text) of every simple ``<a href>``
    element, document order, duplicates kept — two ALIGNED
    ``list<large_string>`` arrays. Anchor text is the classic inlink
    relevance signal (it describes the TARGET page in the linker's
    words); aggregate per target with ``graph.anchor_text`` /
    ``graph.anchor_docs``.

    Heuristic like the reference crawler's tagsoup pass
    (hunt-crawler/src/Holumbus/Crawler/Html.hs `getHtmlReferences`): only
    anchors whose inner text contains no nested markup (``[^<]*``) are
    captured — same rule a DuckDB ``regexp_extract_all`` oracle can
    replicate exactly."""
    import polars as pl

    arr = _drop_scripts(_as_string_array(html))
    s = pl.from_arrow(arr)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    # '>' is disallowed inside the href value ([^">]*): with [^"]* an
    # href like test://5>x would make the outer [^>]*> close early and
    # the anchor capture swallow the attribute tail ('x">real text').
    full = s.str.extract_all(r'<a\s[^>]*?href="[^">]*"[^>]*>[^<]*</a>')
    hrefs = full.list.eval(pl.element().str.extract(r'href="([^">]*)"', 1))
    anchors = full.list.eval(pl.element().str.extract(r'>([^<]*)</a>', 1))
    out = []
    for col in (hrefs, anchors):
        a = col.to_arrow()
        out.append(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
    return out[0], out[1]


EXTRACTORS = {
    "text": None,  # use the `text` column directly (input_hint invariant)
    "body": extract_body,
    "title": extract_title,
    "headlines": extract_headlines,
}


def context_text(batch: pa.Table, source: str) -> pa.Array:
    """Resolve a context's source text for a pages batch.

    ``source="text"`` uses the precomputed ``text`` column (byte-identical to
    ``extract_body(html)`` by the input invariant); other sources extract
    from ``html`` on the fly.
    """
    if source == "text":
        col = batch.column("text")
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if source.startswith("column:"):
        # direct per-context content column (ApiDocument ingest: the adIndex
        # map provides raw text per context, ApiDocument.hs:33-42)
        col = batch.column(source[len("column:"):])
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return EXTRACTORS[source](batch.column("html"))


def validate_text_invariant(batch: pa.Table) -> np.ndarray:
    """Boolean mask: extract_body(html) == text, per row (input_hint)."""
    extracted = extract_body(batch.column("html"))
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pc.equal(extracted, text).to_numpy(zero_copy_only=False).astype(bool)
