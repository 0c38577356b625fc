"""ApiDocument ingest + the reference's interpreter-test canon.

Replicates test/Hunt/InterpreterTests.hs:150-240 over our engine: insert
brainDoc/dateDoc (TestHelper.hs:225-260) into a 'default' text context +
'datecontext' date context, then check the same expected URI lists.
"""

from __future__ import annotations

import pytest

from hunt_ray.analyze.schema import ContextSchema
from hunt_ray.index.build import BuildConfig, build_index
from hunt_ray.query.engine import SearchEngine
from hunt_ray.sources.apidocs import (
    apidocs_list_to_table,
    schema_for_apidocs,
    write_apidocs_parquet,
)

BRAIN_DOC = {
    "uri": "test://0",
    "index": {"default": "Brain"},
    "description": {"name": "Brain", "mission": "take over the world", "legs": "4"},
}
DATE_DOC = {
    "uri": "test://1",
    "index": {"default": "Brain", "datecontext": "2013-01-01"},
    "description": {"name": "Brain", "mission": "take over the world", "legs": "4"},
}

CANON_SCHEMA = {
    "default": ContextSchema(type="text", weight=1.0, default=True),
    "datecontext": ContextSchema(type="date", weight=1.0, default=True),
}


@pytest.fixture(scope="module")
def canon_engine(ray_session, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("apidocs_src"))
    write_apidocs_parquet([BRAIN_DOC, DATE_DOC], src)
    idx = str(tmp_path_factory.mktemp("apidocs_idx"))
    cfg = BuildConfig(schema=schema_for_apidocs(CANON_SCHEMA),
                      num_partitions=2, salt_buckets=1, batch_size=16,
                      analyzer_concurrency=1)
    build_index(src, idx, cfg)
    return SearchEngine(idx)


def _uris(engine, q):
    return [h.url for h in engine.search(q, offset=0, limit=1000).result]


def test_search_nocase(canon_engine):
    # setNoCaseSearch (qWord "Bra") → both brain docs (InterpreterTests:156-162)
    assert _uris(canon_engine, "Bra") == ["test://0", "test://1"]
    assert _uris(canon_engine, "bra") == ["test://0", "test://1"]


def test_search_case(canon_engine):
    # qWord "Bra" case-sensitive prefix → hits; lowercase → [] (:169-182)
    assert _uris(canon_engine, "!Bra") == ["test://0", "test://1"]
    assert _uris(canon_engine, "!bra") == []


def test_phrase_nocase(canon_engine):
    assert _uris(canon_engine, '"Brain"') == ["test://0", "test://1"]
    assert _uris(canon_engine, '"brain"') == ["test://0", "test://1"]


def test_phrase_case(canon_engine):
    assert _uris(canon_engine, '!"Brain"') == ["test://0", "test://1"]
    assert _uris(canon_engine, '!"brain"') == []


def test_date_range(canon_engine):
    # range query on the datecontext (prop_position_range style; dateDoc only)
    assert _uris(canon_engine, "datecontext:[2013-01-01 TO 2013-12-31]") == ["test://1"]
    assert _uris(canon_engine, "datecontext:[2014-01-01 TO 2014-12-31]") == []


def test_description_roundtrip(canon_engine):
    res = canon_engine.search("Brain", limit=10, with_desc=True)
    d = {h.url: h.description for h in res.result}
    assert d["test://0"]["mission"] == "take over the world"
    assert d["test://0"]["legs"] == "4"


def test_select_fields_projection(canon_engine):
    # mkSelect restricts description fields (Interpreter.hs:585-593)
    res = canon_engine.search("Brain", limit=10, select_fields=["name"])
    for h in res.result:
        assert set(h.description) == {"name"}


def test_duplicate_uri_rejected():
    with pytest.raises(ValueError, match="duplicate URI"):
        apidocs_list_to_table([BRAIN_DOC, BRAIN_DOC])


def test_ray_native_jsonl_ingest(ray_session, tmp_path):
    """Distributed read_json ingest must index identically to the
    driver-side apidocs_to_table path."""
    import json

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine
    from hunt_ray.sources.apidocs import (
        ingest_apidocs_jsonl,
        schema_for_apidocs,
        write_apidocs_parquet,
    )

    docs = [
        {"uri": f"doc://{i}",
         "index": {"body": f"word{i} shared brain" if i % 2 else f"word{i} shared"},
         "description": {"n": i},
         "weight": 0.0}
        for i in range(40)
    ]
    jsonl = tmp_path / "docs.jsonl"
    with open(jsonl, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    base = {"body": ContextSchema(type="text", default=True, source="text")}
    schema = schema_for_apidocs(base)
    cfg = BuildConfig(schema=schema, num_partitions=2, salt_buckets=1,
                      batch_size=32, analyzer_concurrency=2)

    stage_ray = str(tmp_path / "stage_ray")
    ingest_apidocs_jsonl(str(jsonl), stage_ray, contexts={"body"})
    idx_ray = str(tmp_path / "idx_ray")
    build_index(stage_ray, idx_ray, cfg)

    stage_drv = str(tmp_path / "stage_drv")
    write_apidocs_parquet(docs, stage_drv, contexts={"body"})
    idx_drv = str(tmp_path / "idx_drv")
    build_index(stage_drv, idx_drv, cfg)

    e1, e2 = SearchEngine(idx_ray), SearchEngine(idx_drv)
    for q in ["brain", "shared", "word3", "shared AND NOT brain"]:
        r1 = [(h.url, h.score) for h in e1.search(q, limit=0).result]
        r2 = [(h.url, h.score) for h in e2.search(q, limit=0).result]
        assert r1 == r2, q
    assert len(e1.search("shared", limit=0).result) == 40
