"""HTTP shim: the reference server's REST surface over the command
interpreter (Server.hs:87-101 routes)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from hunt_ray.query.commands import CommandInterpreter
from hunt_ray.server import HuntServer

DOCS = [
    {"uri": "http://a", "index": {"body": "brain takes over the world"},
     "description": {"k": "v1"}},
    {"uri": "http://b", "index": {"body": "pinky follows the brain"},
     "description": {"k": "v2"}},
    {"uri": "http://c", "index": {"body": "unrelated document text"}},
]


@pytest.fixture(scope="module")
def server(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("httpidx"))
    interp = CommandInterpreter(root)
    interp.execute({"cmd": "sequence",
                    "cmds": [{"cmd": "insert", "document": d} for d in DOCS]})
    srv = HuntServer(interp).start()
    yield srv, interp
    srv.shutdown()


def _get(srv: HuntServer, path: str) -> dict:
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return json.loads(r.read())


def _post(srv: HuntServer, path: str, payload: dict) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_http_search_matches_interpreter(server):
    srv, interp = server
    via_http = _get(srv, "/search/brain")
    assert via_http["code"] == 0
    direct = interp.execute({"cmd": "search", "query": "brain"})
    assert via_http["msg"] == direct
    uris = [h["uri"] for h in via_http["msg"]["result"]]
    assert set(uris) == {"http://a", "http://b"}


def test_http_search_paged(server):
    srv, _ = server
    page = _get(srv, "/search/brain/1/1")["msg"]
    assert page["offset"] == 1 and page["max"] == 1
    assert len(page["result"]) == 1 and page["count"] == 2


def test_http_completion_and_status(server):
    srv, _ = server
    comp = _get(srv, "/completion/bra/5")["msg"]
    assert any(w["word"] == "brain" for w in comp["words"])
    st = _get(srv, "/status")["msg"]
    assert st["doc_count"] == 3


def test_http_eval_roundtrip(server):
    srv, _ = server
    res = _post(srv, "/eval", {"cmd": "search", "query": "pinky"})
    assert res["code"] == 0
    assert [h["uri"] for h in res["msg"]["result"]] == ["http://b"]


def test_http_unknown_route(server):
    srv, _ = server
    try:
        _get(srv, "/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_hex_docid_rendering():
    from hunt_ray.common.hashing import doc_id_from_hex, doc_id_to_hex

    assert doc_id_to_hex(255) == "0xff"
    assert doc_id_from_hex("0xff") == 255
    assert doc_id_from_hex("ff") == 255
    assert doc_id_from_hex("xyz") is None
    assert doc_id_from_hex("0x") is None
    big = 2**63 + 12345
    assert doc_id_from_hex(doc_id_to_hex(big)) == big


def test_client_bindings(server):
    """HuntClient (hunt-client analog) over the shim, incl. builder ASTs."""
    from hunt_ray.client import HuntClient, HuntClientError
    from hunt_ray.query import ast as A

    srv, interp = server
    cl = HuntClient(f"http://127.0.0.1:{srv.port}")
    st = cl.status()
    assert st["doc_count"] == 3
    res = cl.search("brain", max=10)
    assert {h["uri"] for h in res["result"]} == {"http://a", "http://b"}
    # builder AST serialized through render_query
    res2 = cl.search(A.q_and(A.q_word_nocase("brain"),
                             A.q_word_nocase("world")), max=10)
    assert [h["uri"] for h in res2["result"]] == ["http://a"]
    assert any(w["word"] == "brain" for w in cl.complete("bra"))
    ev = cl.eval({"cmd": "search", "query": "pinky"})
    assert [h["uri"] for h in ev["result"]] == ["http://b"]
    try:
        cl.eval({"cmd": "nonsense"})
        raise AssertionError("expected HuntClientError")
    except HuntClientError:
        pass


def test_position_rtree_alias_context(ray_session, tmp_path):
    """position-rtree shares the position type's observable semantics."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine

    d = tmp_path / "rtree"
    d.mkdir()
    pq.write_table(pa.table({
        "url": pa.array(["g://0", "g://1"], pa.string()),
        "warc_ts": pa.array([0, 1], pa.timestamp("us")),
        "html": pa.array([b"", b""], pa.binary()),
        "text": pa.array(["at 10.5-20.5 x", "at 70.0-75.0 x"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    }), str(d / "p.parquet"))
    schema = {
        "body": ContextSchema(type="text", default=True, source="text"),
        "geo": ContextSchema(type="position-rtree", default=False,
                             source="text"),
    }
    idx = str(tmp_path / "rtree_idx")
    build_index(str(d), idx, BuildConfig(schema=schema, num_partitions=2,
                                         batch_size=8, analyzer_concurrency=2))
    eng = SearchEngine(idx)
    hits = eng.search("geo:[10-20 TO 20-30]", limit=0)
    assert [h.url for h in hits.result] == ["g://0"]


def test_concurrent_inserts_do_not_race(ray_session, tmp_path):
    """8 threads POST /eval inserts simultaneously; the mutation lock
    (CommandInterpreter._mut_lock) must serialize them — every doc lands,
    no lost segment commits, searches see all of them."""
    import threading

    root = str(tmp_path / "cidx")
    interp = CommandInterpreter(root)
    interp.execute({"cmd": "insert", "document": DOCS[0]})
    srv = HuntServer(interp).start()
    try:
        errs: list[str] = []

        def insert(i: int) -> None:
            try:
                r = _post(srv, "/eval", {
                    "cmd": "insert",
                    "document": {"uri": f"http://t{i}",
                                 "index": {"body": f"threaded doc {i} word"}}})
                if r["code"] != 0:
                    errs.append(str(r))
            except Exception as e:  # noqa: BLE001
                errs.append(repr(e))

        threads = [threading.Thread(target=insert, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs, errs
        res = _get(srv, "/search/word/0/50")
        assert res["code"] == 0
        uris = {h["uri"] for h in res["msg"]["result"]}
        assert uris == {f"http://t{i}" for i in range(8)}
    finally:
        srv.shutdown()
