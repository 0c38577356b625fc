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
