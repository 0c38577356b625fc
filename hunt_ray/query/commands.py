"""Hunt command-envelope interpreter: the JSON API surface.

Mirrors ``Hunt/Interpreter/Command.hs`` + the interpreter dispatch
(``Hunt/Interpreter.hs:330-430``): a command is a JSON object with a
``cmd`` discriminator; ``sequence`` batches adjacent inserts/deletes like
``toBasicCommand`` (Command.hs:269-309). This gives users of the reference's
HTTP/CLI JSON API a drop-in execution path over the Ray engine.

Supported commands (Command.hs:162-256):
- {"cmd": "insert", "document": {apidoc}}               → segment insert
- {"cmd": "delete", "uri": u}                           → tombstone
- {"cmd": "delete-by-query", "query": q}                → tombstones
- {"cmd": "search", "query": q, "offset": o, "max": m}  → LimitedResult
- {"cmd": "completion", "query": q, "max": m}           → word suggestions
- {"cmd": "status"}                                     → index stats
- {"cmd": "sequence", "cmds": [...]}                    → batched execution

Contexts/schema are fixed at index-build time (``insert-context`` maps to
building with a schema), matching our immutable-generation design.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field

import numpy as np

from ..analyze.schema import Schema, default_schema
from ..common.hashing import hash64
from ..index.build import BuildConfig
from ..index.segments import SegmentedIndex
from ..sources.apidocs import schema_for_apidocs, write_apidocs_parquet
from .engine import SearchEngine
from .processor import ProcessConfig


@dataclass
class CommandInterpreter:
    """Stateful handle over a segmented index root (Hunt's HuntEnv analog)."""

    root: str
    schema: Schema = field(default_factory=default_schema)
    build_cfg: BuildConfig | None = None
    _tmp_seq: int = 0
    # serializes index mutations (insert/delete/compact/sequence) like the
    # reference's MVar around the ContextIndex (Interpreter.hs HuntEnv):
    # concurrent HTTP POST /eval would otherwise race on _tmp_seq staging
    # dirs, segment naming, and the segments.json read-modify-write.
    # Reads stay lock-free (immutable generations). RLock: a sequence
    # command re-enters execute() for its members.
    _mu: threading.RLock = field(default_factory=threading.RLock, repr=False)

    _MUTATING = frozenset({"insert", "delete", "delete-by-query",
                           "compact", "sequence"})

    def __post_init__(self):
        self.segmented = SegmentedIndex(self.root)

    def _engine(self) -> SearchEngine:
        return SearchEngine.from_reader(self.segmented.reader(),
                                        ProcessConfig(word_limit=0, doc_limit=0))

    def execute(self, cmd: dict) -> dict:
        if cmd.get("cmd") in self._MUTATING:
            with self._mu:
                return self._execute(cmd)
        return self._execute(cmd)

    def _execute(self, cmd: dict) -> dict:
        kind = cmd.get("cmd")
        if kind == "sequence":
            # toBasicCommand: group adjacent inserts into one batch
            # (Command.hs:269-309)
            results = []
            pending_inserts: list[dict] = []
            for c in cmd.get("cmds", []):
                if c.get("cmd") == "insert":
                    pending_inserts.append(c["document"])
                    continue
                if pending_inserts:
                    results.append(self._insert_batch(pending_inserts))
                    pending_inserts = []
                results.append(self.execute(c))
            if pending_inserts:
                results.append(self._insert_batch(pending_inserts))
            return {"ok": all(r.get("ok", True) for r in results), "results": results}
        if kind == "insert":
            return self._insert_batch([cmd["document"]])
        if kind == "delete":
            ids = hash64([cmd["uri"]])
            n = self.segmented.delete_doc_ids(np.asarray(ids, dtype=np.uint64))
            return {"ok": True, "deleted": int(n)}
        if kind == "delete-by-query":
            n = self.segmented.delete_by_query(cmd["query"])
            return {"ok": True, "deleted": int(n)}
        if kind == "search":
            res = self._engine().search(cmd["query"],
                                        offset=int(cmd.get("offset", 0)),
                                        limit=int(cmd.get("max", 20)),
                                        with_desc=True)
            return {
                "ok": True,
                "offset": res.offset,
                "max": res.max,
                "count": res.count,
                "result": [
                    {"uri": h.url, "score": h.score, "description": h.description}
                    for h in res.result
                ],
            }
        if kind == "completion":
            words = self._engine().complete(cmd["query"], limit=int(cmd.get("max", 20)))
            return {"ok": True, "words": [{"word": w, "score": s} for w, s in words]}
        if kind == "status":
            r = self.segmented.reader()
            return {"ok": True, "doc_count": int(r.stats.get("n_docs", 0)),
                    "contexts": sorted(r.schema)}
        if kind == "compact":
            # extension beyond the reference envelope: explicit segment
            # merge (Hunt merges internally on its own schedule)
            info = self.segmented.compact()
            return {"ok": True, "compacted": True,
                    "n_docs": int(info["stats"]["n_docs"])}
        raise ValueError(f"unknown command: {kind!r}")

    # -- client-side command builders (ClientInterface.hs:191-500) -----

    @staticmethod
    def cmd_insert_doc(uri: str, index: dict, description: dict | None = None,
                       weight: float = 0.0) -> dict:
        return {"cmd": "insert", "document": {
            "uri": uri, "index": index,
            "description": description or {}, "weight": weight}}

    @staticmethod
    def cmd_delete_doc(uri: str) -> dict:
        return {"cmd": "delete", "uri": uri}

    @staticmethod
    def cmd_delete_by_query(query: str) -> dict:
        return {"cmd": "delete-by-query", "query": query}

    @staticmethod
    def cmd_search(query, offset: int = 0, max: int = 20) -> dict:
        from .parser import render_query

        q = query if isinstance(query, str) else render_query(query)
        return {"cmd": "search", "query": q, "offset": offset, "max": max}

    @staticmethod
    def cmd_completion(query, max: int = 20) -> dict:
        from .parser import render_query

        q = query if isinstance(query, str) else render_query(query)
        return {"cmd": "completion", "query": q, "max": max}

    @staticmethod
    def cmd_sequence(cmds: list[dict]) -> dict:
        return {"cmd": "sequence", "cmds": list(cmds)}

    def _insert_batch(self, docs: list[dict]) -> dict:
        self._tmp_seq += 1
        staging = os.path.join(self.root, "staging", f"batch_{self._tmp_seq:06d}")
        write_apidocs_parquet(docs, staging, contexts=set(self.schema))
        cfg = self.build_cfg or BuildConfig(
            schema=schema_for_apidocs(self.schema), num_partitions=2,
            salt_buckets=1, batch_size=1024, analyzer_concurrency=1)
        if not os.path.exists(os.path.join(self.root, "manifest")):
            # first insert bootstraps segment 0
            from ..index.build import build_index

            build_index(staging, self.root, cfg)
        else:
            self.segmented.insert_pages(staging, cfg)
        return {"ok": True, "inserted": len(docs)}
