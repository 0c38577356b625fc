from __future__ import annotations

import pytest

from hunt_ray.analyze.schema import ContextSchema
from hunt_ray.query.commands import CommandInterpreter

SCHEMA = {
    "default": ContextSchema(type="text", weight=1.0, default=True),
    "datecontext": ContextSchema(type="date", weight=1.0, default=True),
}

BRAIN = {"uri": "test://0", "index": {"default": "Brain"},
         "description": {"name": "Brain", "mission": "take over the world"}}
DATE = {"uri": "test://1", "index": {"default": "Brain", "datecontext": "2013-01-01"},
        "description": {"name": "Brain"}}
OTHER = {"uri": "test://9", "index": {"default": "completely different words"},
         "description": {}}


@pytest.fixture(scope="module")
def interp(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cmdroot"))
    it = CommandInterpreter(root, schema=SCHEMA)
    res = it.execute({"cmd": "sequence", "cmds": [
        {"cmd": "insert", "document": BRAIN},
        {"cmd": "insert", "document": DATE},
    ]})
    assert res["ok"]
    return it


def test_search_command(interp):
    res = interp.execute({"cmd": "search", "query": "Brain", "offset": 0, "max": 10})
    assert res["ok"] and res["count"] == 2
    assert [h["uri"] for h in res["result"]] == ["test://0", "test://1"]
    assert res["result"][0]["description"]["mission"] == "take over the world"


def test_completion_command(interp):
    res = interp.execute({"cmd": "completion", "query": "Bra", "max": 5})
    assert res["ok"]
    assert any(w["word"] == "Brain" for w in res["words"])


def test_status_command(interp):
    res = interp.execute({"cmd": "status"})
    assert res["ok"] and res["doc_count"] == 2
    assert "default" in res["contexts"]


def test_insert_then_delete(interp):
    interp.execute({"cmd": "insert", "document": OTHER})
    res = interp.execute({"cmd": "search", "query": "completely", "max": 10})
    assert res["count"] == 1
    interp.execute({"cmd": "delete", "uri": "test://9"})
    res = interp.execute({"cmd": "search", "query": "completely", "max": 10})
    assert res["count"] == 0
    # the other docs survive
    assert interp.execute({"cmd": "search", "query": "Brain", "max": 10})["count"] == 2


def test_delete_by_query_command(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cmdroot2"))
    it = CommandInterpreter(root, schema=SCHEMA)
    it.execute({"cmd": "insert", "document": BRAIN})
    it.execute({"cmd": "insert", "document": DATE})
    res = it.execute({"cmd": "delete-by-query", "query": "datecontext:[2013-01-01 TO 2013-12-31]"})
    assert res["ok"] and res["deleted"] == 1
    left = it.execute({"cmd": "search", "query": "Brain", "max": 10})
    assert [h["uri"] for h in left["result"]] == ["test://0"]


def test_update_delete_then_reinsert(ray_session, tmp_path_factory):
    """The documented update flow (delete + insert of the same URI) must
    re-surface the NEW version only: old terms gone, new terms found, and
    compact() keeps the updated doc (ADVICE r2: tombstones are scoped to
    the segments live at delete time, not applied globally)."""
    root = str(tmp_path_factory.mktemp("updroot"))
    it = CommandInterpreter(root, schema={"default": ContextSchema(
        type="text", weight=1.0, default=True)})
    v1 = {"uri": "upd://1", "index": {"default": "ancient obsolete words"},
          "description": {"v": "1"}}
    v2 = {"uri": "upd://1", "index": {"default": "fresh shiny replacement"},
          "description": {"v": "2"}}
    it.execute({"cmd": "insert", "document": v1})
    it.execute({"cmd": "delete", "uri": "upd://1"})
    it.execute({"cmd": "insert", "document": v2})

    def hits(q):
        r = it.execute({"cmd": "search", "query": q, "max": 10})
        return [(h["uri"], h["description"]) for h in r["result"]]

    assert hits("fresh") == [("upd://1", {"v": "2"})]   # new version visible
    assert hits("obsolete") == []                        # old version gone
    assert it.execute({"cmd": "status"})["doc_count"] == 1
    # compaction keeps the updated doc, drops the old version permanently
    it.execute({"cmd": "compact"})
    assert hits("fresh") == [("upd://1", {"v": "2"})]
    assert hits("obsolete") == []
    assert it.execute({"cmd": "status"})["doc_count"] == 1


def test_concurrent_mutations_are_serialized(ray_session, tmp_path_factory):
    """Concurrent insert commands (the HTTP POST /eval race, ADVICE r2)
    must not lose commits: the interpreter serializes mutations."""
    import threading

    root = str(tmp_path_factory.mktemp("concroot"))
    it = CommandInterpreter(root, schema={"default": ContextSchema(
        type="text", weight=1.0, default=True)})
    it.execute({"cmd": "insert", "document": {
        "uri": "c://seed", "index": {"default": "seed words"}, "description": {}}})
    errs = []

    def ins(i):
        try:
            it.execute({"cmd": "insert", "document": {
                "uri": f"c://{i}", "index": {"default": f"payload number{i}"},
                "description": {}}})
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=ins, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert it.execute({"cmd": "status"})["doc_count"] == 5
    for i in range(4):
        r = it.execute({"cmd": "search", "query": f"number{i}", "max": 5})
        assert r["count"] == 1 and r["result"][0]["uri"] == f"c://{i}"
