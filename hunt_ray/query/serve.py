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

    def lookup_range(self, context: str, lb: str, ub: str, structure: str,
                     parts: list[int], with_positions: bool
                     ) -> list[tuple[str, tuple]]:
        out = []
        for k in parts:
            pr = self.readers.get(k)
            if pr is None:
                continue
            entries = (pr.lookup_range_2d(context, lb, ub)
                       if structure == "rtree"
                       else pr.lookup_range(context, lb, ub))
            for entry in entries:
                p = pr.postings(entry, with_positions=with_positions)
                out.append((pr.terms[entry],
                            (p.doc_ids, p.tfs, p.pos_flat, p.pos_offsets)))
        return out

    def batch(self, requests: list[tuple], with_positions: bool
              ) -> list[tuple[int, list[tuple[str, tuple]]]]:
        """Serve many lookups in ONE round trip. Each request is
        ``(rid, "s", op, context, key, parts)`` or
        ``(rid, "r", context, lb, ub, parts)``; returns ``(rid, found)``
        pairs the driver merges per rid across actors. One RPC per actor
        per query instead of one per term (each round trip costs ~10 ms on
        the sandbox VM; real clusters pay serialization + a network hop)."""
        out = []
        for req in requests:
            rid, kind = req[0], req[1]
            if kind == "s":
                _, _, op, context, key, parts = req
                out.append((rid, self.search(op, context, key, parts,
                                             with_positions)))
            else:
                _, _, context, lb, ub, structure, parts = req
                out.append((rid, self.lookup_range(context, lb, ub, structure,
                                                   parts, with_positions)))
        return out


@ray.remote
class DocShardActor:
    """Owns the doc-table rows with ``doc_id % n_shards == shard``.

    The Ray analog of sharding Hunt's ``HashedDocTable`` by id: the build
    writes docs id-sharded (``shard = doc_id % DOC_SHARDS`` column, one
    row group per shard value), so each actor's ``DocTable(shard=(s, n))``
    reads ONLY its own row groups — never the full table (asserted in
    test_serve via ``rows_scanned``) — plus only the doclens partitions
    whose doc-routed modulo can contain its docs. Driver memory stays
    O(routing metadata) no matter the corpus size; hydration fans
    requested ids out by shard and reassembles in request order.
    """

    def __init__(self, index_dir: str, shard: int, n_shards: int):
        import os

        from ..analyze.schema import schema_from_json
        from ..index.manifest import Manifest
        from ..index.reader import DocTable

        man = Manifest(index_dir)
        info = man.latest()
        schema = schema_from_json(info["schema"])
        tab = DocTable(os.path.join(index_dir, "docs"), schema,
                       shard=(shard, n_shards),
                       num_partitions=info.get("num_partitions"))
        self.doc_id = tab.doc_id
        self.url = tab.url
        self.weight = tab.weight
        self.desc = tab.desc
        self.lens = tab.lens
        self.n_rows = tab.n_docs
        self.rows_scanned = tab.rows_scanned

    def count(self) -> int:
        return self.n_rows

    def scan_stats(self) -> tuple[int, int]:
        """(rows materialized from parquet, rows owned) — equal when the
        sharded read pruned correctly."""
        return self.rows_scanned, self.n_rows

    def _rows(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_id, doc_ids)
        idx = np.clip(idx, 0, max(0, len(self.doc_id) - 1))
        if not (self.doc_id[idx] == doc_ids).all():
            raise KeyError("unknown doc_ids in shard lookup")
        return idx

    def hydrate(self, doc_ids: np.ndarray, *, with_desc: bool = False):
        rows = self._rows(doc_ids)
        descs = None
        if with_desc and self.desc is not None:
            descs = [d for d in self.desc[rows]]
        return self.url[rows], self.weight[rows], descs

    def lens_of(self, context: str, doc_ids: np.ndarray) -> np.ndarray:
        return self.lens[context][self._rows(doc_ids)]


class ShardedDocTable:
    """DocTable interface over a DocShardActor pool — the driver holds only
    actor handles; lookups batch by ``doc_id % n_shards`` and return in the
    caller's order."""

    # driver-side (url, weight) cache cap: rows are ~100 B, so the driver
    # holds at most ~50 MB of hot-doc metadata regardless of corpus size
    DOC_CACHE_MAX = 500_000

    def __init__(self, index_dir: str, n_shards: int = 2):
        self.n_shards = max(1, n_shards)
        self.actors = [DocShardActor.remote(index_dir, s, self.n_shards)
                       for s in range(self.n_shards)]
        self.n_docs = sum(ray.get([a.count.remote() for a in self.actors]))
        # sorted-array (url, weight) cache — sound because a reader serves
        # one immutable generation. Saves the second hydration round trip
        # per query (urls_of(page) ⊆ urls_of(candidates)) and all round
        # trips for repeat docs; lookups are one vectorized searchsorted,
        # never a per-doc Python loop (queries can match 10k+ docs).
        self._c_ids = np.empty(0, dtype=np.uint64)
        self._c_urls = np.empty(0, dtype=object)
        self._c_w = np.empty(0, dtype=np.float32)

    def _fanout(self, doc_ids: np.ndarray, with_desc: bool = False):
        doc_ids = np.asarray(doc_ids, dtype=np.uint64)
        n = len(doc_ids)
        urls = np.empty(n, dtype=object)
        weights = np.empty(n, dtype=np.float32)
        descs: list = [None] * n
        if with_desc or self._c_ids.size == 0:
            need = np.arange(n)
        else:
            pos = np.searchsorted(self._c_ids, doc_ids)
            pos_c = np.minimum(pos, self._c_ids.size - 1)
            hit = self._c_ids[pos_c] == doc_ids
            hi = np.flatnonzero(hit)
            urls[hi] = self._c_urls[pos_c[hi]]
            weights[hi] = self._c_w[pos_c[hi]]
            need = np.flatnonzero(~hit)
        if need.size:
            miss_ids = doc_ids[need]
            shard = (miss_ids % np.uint64(self.n_shards)).astype(np.int64)
            futs = []
            idxs = []
            for s in range(self.n_shards):
                sel = np.flatnonzero(shard == s)
                if sel.size == 0:
                    continue
                futs.append(self.actors[s].hydrate.remote(miss_ids[sel],
                                                          with_desc=with_desc))
                idxs.append(need[sel])
            for sel, (u, w, d) in zip(idxs, ray.get(futs)):
                urls[sel] = u
                weights[sel] = w
                if d is not None:
                    for i, di in zip(sel, d):
                        descs[i] = di
            if not with_desc and self._c_ids.size < self.DOC_CACHE_MAX:
                # (desc fetches bypass the hit check above, so appending
                # here would duplicate already-cached ids)
                new_ids, first = np.unique(doc_ids[need], return_index=True)
                all_ids = np.concatenate([self._c_ids, new_ids])
                all_urls = np.concatenate([self._c_urls, urls[need][first]])
                all_w = np.concatenate([self._c_w, weights[need][first]])
                order = np.argsort(all_ids, kind="stable")
                self._c_ids = all_ids[order]
                self._c_urls = all_urls[order]
                self._c_w = all_w[order]
        return urls, weights, descs

    def urls_of(self, doc_ids: np.ndarray) -> np.ndarray:
        return self._fanout(doc_ids)[0]

    def weights_of(self, doc_ids: np.ndarray) -> np.ndarray:
        return self._fanout(doc_ids)[1]

    def lens_of(self, context: str, doc_ids: np.ndarray) -> np.ndarray:
        doc_ids = np.asarray(doc_ids, dtype=np.uint64)
        shard = (doc_ids % np.uint64(self.n_shards)).astype(np.int64)
        out = np.zeros(len(doc_ids), dtype=np.uint32)
        futs, idxs = [], []
        for s in range(self.n_shards):
            sel = np.flatnonzero(shard == s)
            if sel.size:
                futs.append(self.actors[s].lens_of.remote(context, doc_ids[sel]))
                idxs.append(sel)
        for sel, arr in zip(idxs, ray.get(futs)):
            out[sel] = arr
        return out

    def descs_of(self, doc_ids: np.ndarray) -> list[dict]:
        import json

        descs = self._fanout(doc_ids, with_desc=True)[2]
        return [json.loads(d) if d else {} for d in descs]

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class RemoteIndexReader(IndexReader):
    """IndexReader whose partition lookups fan out to a PartitionActor pool
    and whose doc table is sharded across DocShardActors (driver memory =
    routing metadata only).
    """

    # bounded raw-lookup cache: keys are (kind, op, context, key, wp) and
    # values the actors' raw found lists (numpy postings). FIFO-evicted.
    LOOKUP_CACHE_MAX = 4096

    def __init__(self, index_dir: str, n_actors: int = 4,
                 generation: int | None = None, *, doc_shards: int = 2):
        super().__init__(index_dir, generation)
        self._doc_shards = doc_shards
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
        self._lookup_cache: dict[tuple, list] = {}
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

    def _cache_put(self, ck: tuple, found: list) -> None:
        cache = self._lookup_cache
        if len(cache) >= self.LOOKUP_CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[ck] = found

    def prefetch(self, searches, ranges=(), *, with_positions: bool = True
                 ) -> None:
        """Resolve many lookups in ONE batched RPC per actor, filling the
        lookup cache so the evaluator's subsequent ``search_sc`` /
        ``lookup_range_sc`` calls are driver-local. Collapses a query's
        round trips from one-per-term to one-per-actor."""
        todo: list[tuple[tuple, str, tuple, list[int]]] = []
        for op, cx, key in searches:
            ck = ("s", op, cx, key, with_positions)
            if ck not in self._lookup_cache:
                todo.append((ck, "s", (op, cx, key), self.parts_for(op, key)))
        for cx, lb, ub in ranges:
            ck = ("r", cx, lb, ub, with_positions)
            if ck not in self._lookup_cache:
                todo.append((ck, "r",
                             (cx, lb, ub, self.schema[cx].ctype.range_structure),
                             self.parts_for("range", lb, ub)))
        if not todo:
            return
        by_actor: dict = {}
        for rid, (ck, kind, args, parts) in enumerate(todo):
            for k in parts:
                if k >= self.num_partitions:
                    continue
                a = self.part_to_actor[k]
                by_actor.setdefault(a, {}).setdefault(rid, []).append(k)
        futs = []
        for a, rid_parts in by_actor.items():
            reqs = [(rid, todo[rid][1], *todo[rid][2], ks)
                    for rid, ks in rid_parts.items()]
            futs.append(a.batch.remote(reqs, with_positions))
        merged: dict[int, list] = {rid: [] for rid in range(len(todo))}
        for res in ray.get(futs):
            for rid, found in res:
                merged[rid].extend(found)
        for rid, (ck, _, _, _) in enumerate(todo):
            self._cache_put(ck, merged[rid])

    def search_sc(self, op: str, context: str, key: str, *,
                  with_positions: bool = True):
        ck = ("s", op, context, key, with_positions)
        found = self._lookup_cache.get(ck)
        if found is None:
            parts = self.parts_for(op, key)
            found = self._fanout("search", parts, (op, context, key),
                                 with_positions)
            self._cache_put(ck, found)
        results = [(w, self.score_found(context, key, w),
                    Postings(doc_ids=t[0], tfs=t[1], pos_flat=t[2], pos_offsets=t[3]))
                   for w, t in found]
        results.sort(key=lambda t: (len(t[0]), t[0]))
        return results

    def lookup_range_sc(self, context: str, lb: str, ub: str, *,
                        with_positions: bool = True):
        from ..analyze.normalize import position_in_range

        structure = self.schema[context].ctype.range_structure
        ck = ("r", context, lb, ub, with_positions)
        found = self._lookup_cache.get(ck)
        if found is None:
            parts = self.parts_for("range", lb, ub)
            found = self._fanout("lookup_range", parts,
                                 (context, lb, ub, structure), with_positions)
            self._cache_put(ck, found)
        if structure != "rtree" \
                and self.schema[context].ctype.range_filter == "position2d":
            found = [(w, t) for w, t in found if position_in_range(w, lb, ub)]
        results = [(w, _range_score(self, context, lb, ub, w),
                    Postings(doc_ids=t[0], tfs=t[1], pos_flat=t[2], pos_offsets=t[3]))
                   for w, t in found]
        results.sort(key=lambda t: t[0])
        return results

    @property
    def docs(self) -> ShardedDocTable:
        if self._docs is None:
            self._docs = ShardedDocTable(self.index_dir, self._doc_shards)
        return self._docs

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        self.part_to_actor = {}
        if self._docs is not None:
            self._docs.shutdown()
            self._docs = None


def _range_score(reader: IndexReader, context: str, lb: str, ub: str, word: str):
    from ..common import scores as sc
    from ..index.reader import _similar_range_int
    from ..analyze.normalize import unzerofill_int

    cs = reader.schema[context]
    if cs.ctype.range_score == "similar_range_int":
        return _similar_range_int(unzerofill_int(lb), unzerofill_int(ub),
                                  reader._denorm(context, word))
    return sc.DEF_SCORE
