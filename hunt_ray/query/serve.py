"""Serve mode: query actors owning index partitions (SURVEY.md §4.2).

The distributed analog of Hunt's long-lived in-memory ``ContextIndex``
behind an ``XMVar`` (``Interpreter.hs:143-155``): immutable partitions are
loaded once per actor (dictionary + postings), queries fan out term lookups
to the actors owning the partitions a key can live in, and the driver-side
processor merges the scored raw results exactly as in local mode. Reads
need no locking — partitions are immutable; a new generation is served by
starting a new pool.

On a multi-node cluster each actor would pin its partitions' Parquet in
local memory; ``parts_for`` routing means a case-sensitive exact/prefix
lookup touches one actor, and only case-insensitive scans fan out to all.
"""

from __future__ import annotations

import numpy as np
import ray

from ..index.reader import IndexReader, PartitionReader, Postings


@ray.remote
class PartitionActor:
    """Owns a contiguous set of term-range partitions, loaded once."""

    def __init__(self, index_dir: str, parts: list[int]):
        self.readers = {k: PartitionReader(index_dir, k) for k in parts}

    def ping(self) -> bool:
        return True

    def search(self, op: str, context: str, key: str, parts: list[int],
               with_positions: bool) -> list[tuple[str, tuple]]:
        out = []
        for k in parts:
            pr = self.readers.get(k)
            if pr is None:
                continue
            for entry in pr.lookup(op, context, key):
                p = pr.postings(entry, with_positions=with_positions)
                out.append((pr.terms[entry],
                            (p.doc_ids, p.tfs, p.pos_flat, p.pos_offsets)))
        return out

    def lookup_range(self, context: str, lb: str, ub: str, parts: list[int],
                     with_positions: bool) -> list[tuple[str, tuple]]:
        out = []
        for k in parts:
            pr = self.readers.get(k)
            if pr is None:
                continue
            for entry in pr.lookup_range(context, lb, ub):
                p = pr.postings(entry, with_positions=with_positions)
                out.append((pr.terms[entry],
                            (p.doc_ids, p.tfs, p.pos_flat, p.pos_offsets)))
        return out


class RemoteIndexReader(IndexReader):
    """IndexReader whose partition lookups fan out to a PartitionActor pool.

    Dictionary routing, similarity scoring, doc table and stats stay on the
    driver (the doc table would itself be actor-sharded at real scale —
    hydration only ever touches top-k ids).
    """

    def __init__(self, index_dir: str, n_actors: int = 4,
                 generation: int | None = None):
        super().__init__(index_dir, generation)
        n_actors = max(1, min(n_actors, self.num_partitions))
        assign: list[list[int]] = [[] for _ in range(n_actors)]
        for k in range(self.num_partitions):
            assign[k % n_actors].append(k)
        self.part_to_actor = {}
        self.actors = []
        for ai, parts in enumerate(assign):
            actor = PartitionActor.remote(index_dir, parts)
            self.actors.append(actor)
            for k in parts:
                self.part_to_actor[k] = actor
        ray.get([a.ping.remote() for a in self.actors])  # warm

    def _fanout(self, method: str, parts: list[int], args: tuple,
                with_positions: bool):
        by_actor: dict = {}
        for k in parts:
            if k >= self.num_partitions:
                continue
            by_actor.setdefault(self.part_to_actor[k], []).append(k)
        futs = [getattr(a, method).remote(*args, ks, with_positions)
                for a, ks in by_actor.items()]
        found: list[tuple[str, tuple]] = []
        for res in ray.get(futs):
            found.extend(res)
        return found

    def search_sc(self, op: str, context: str, key: str, *,
                  with_positions: bool = True):
        parts = self.parts_for(op, key)
        found = self._fanout("search", parts, (op, context, key), with_positions)
        results = [(w, self.score_found(context, key, w),
                    Postings(doc_ids=t[0], tfs=t[1], pos_flat=t[2], pos_offsets=t[3]))
                   for w, t in found]
        results.sort(key=lambda t: (len(t[0]), t[0]))
        return results

    def lookup_range_sc(self, context: str, lb: str, ub: str, *,
                        with_positions: bool = True):
        parts = self.parts_for("range", lb, ub)
        found = self._fanout("lookup_range", parts, (context, lb, ub), with_positions)
        results = [(w, _range_score(self, context, lb, ub, w),
                    Postings(doc_ids=t[0], tfs=t[1], pos_flat=t[2], pos_offsets=t[3]))
                   for w, t in found]
        results.sort(key=lambda t: t[0])
        return results

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        self.part_to_actor = {}


def _range_score(reader: IndexReader, context: str, lb: str, ub: str, word: str):
    from ..common import scores as sc
    from ..index.reader import _similar_range_int
    from ..analyze.normalize import unzerofill_int

    cs = reader.schema[context]
    if cs.ctype.range_score == "similar_range_int":
        return _similar_range_int(unzerofill_int(lb), unzerofill_int(ub),
                                  reader._denorm(context, word))
    return sc.DEF_SCORE
