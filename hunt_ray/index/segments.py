"""Segmented index: incremental inserts + tombstoned deletes.

The analog of Hunt's on-disk ``SegmentIndex`` (``Hunt/SegmentIndex/*``):
immutable segments, a per-index tombstone set of deleted docs applied at
query time (``IndexWriter.hs:38-42`` keeps a per-segment deleted-docs
DocIdSet), and monotone generations committed to a small manifest
(``SegmentIndex.hs:94-113``). Delete-by-query evaluates the query unscored
and tombstones the result (``Interpreter.hs:605-615``).

Layout under ``<root>/``:

- the root itself is segment 0 (a normal ``build_index`` output)
- ``segments/seg_<N>/`` — additional segments (normal index dirs)
- ``segments.json`` — {generation, segments: [...], tombstones: file}
- ``tombstones/gen_<K>.parquet`` — sorted uint64 doc ids

Merging policy: URIs must be unique across live segments (duplicate insert
is an error in Hunt, Interpreter.hs:466-480); update = delete + insert.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import BuildConfig, build_index
from .manifest import _atomic_write_json
from .reader import DocTable, IndexReader, Postings


class SegmentedIndex:
    def __init__(self, root: str):
        self.root = root
        self.meta_path = os.path.join(root, "segments.json")

    # -- manifest ----------------------------------------------------

    def _meta(self) -> dict:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {"generation": 0, "segments": [], "tombstones": None}

    def _commit(self, meta: dict) -> None:
        meta = dict(meta, generation=self._meta()["generation"] + 1)
        _atomic_write_json(self.meta_path, meta)

    # -- operations --------------------------------------------------

    def insert_pages(self, pages_path: str, cfg: BuildConfig | None = None) -> dict:
        """Index new pages as a fresh immutable segment (Hunt's
        execInsertList → newSegment path, IndexWriter.hs:78-140)."""
        meta = self._meta()
        seg_name = f"seg_{len(meta['segments']):03d}"
        seg_dir = os.path.join(self.root, "segments", seg_name)
        info = build_index(pages_path, seg_dir, cfg)
        reader = self.reader()  # current view, before commit
        new_reader = IndexReader(seg_dir)
        dup = np.intersect1d(reader.docs.doc_id, new_reader.docs.doc_id)
        live_dup = np.setdiff1d(dup, self._tombstones())
        if live_dup.size:
            raise ValueError(
                f"duplicate URIs in insert ({live_dup.size} docs already live); "
                "delete first (update = delete + insert)")
        meta["segments"].append(os.path.join("segments", seg_name))
        self._commit(meta)
        return info

    def _tombstones(self) -> np.ndarray:
        meta = self._meta()
        if not meta.get("tombstones"):
            return np.empty(0, np.uint64)
        t = pq.read_table(os.path.join(self.root, meta["tombstones"]))
        return t.column("doc_id").to_numpy(zero_copy_only=False)

    def delete_doc_ids(self, doc_ids: np.ndarray) -> int:
        """Tombstone docs (applied at query time); returns live-deleted count."""
        meta = self._meta()
        old = self._tombstones()
        merged = np.union1d(old, np.asarray(doc_ids, dtype=np.uint64))
        gen = meta["generation"] + 1
        rel = os.path.join("tombstones", f"gen_{gen}.parquet")
        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(pa.table({"doc_id": pa.array(merged, pa.uint64())}), path)
        meta["tombstones"] = rel
        self._commit(meta)
        return int(merged.size - old.size)

    def delete_by_query(self, query) -> int:
        """Evaluate unscored (docLimit=0!) → tombstone the doc set
        (Interpreter.hs:605-615)."""
        from ..query.engine import SearchEngine
        from ..query.processor import ProcessConfig

        engine = SearchEngine.from_reader(self.reader(),
                                          ProcessConfig(word_limit=0, doc_limit=0))
        ids = engine.search_unscored(query)
        if ids.size == 0:
            return 0
        return self.delete_doc_ids(ids)

    # -- reading -----------------------------------------------------

    def reader(self) -> "IndexReader | MultiReader":
        meta = self._meta()
        segs = [IndexReader(self.root)]
        for rel in meta["segments"]:
            segs.append(IndexReader(os.path.join(self.root, rel)))
        tombs = self._tombstones()
        if len(segs) == 1 and tombs.size == 0:
            return segs[0]
        return MultiReader(segs, tombs)


class MultiReader:
    """Read view over N immutable segments minus a tombstone set.

    Implements the reader surface the query processor and the BM25 engine
    consume: ``search_sc`` / ``lookup_range_sc`` merge per-segment posting
    lists per found word (doc ids are disjoint across live segments);
    ``docs`` is the concatenated doc table; stats are summed.
    """

    def __init__(self, segments: list[IndexReader], tombstones: np.ndarray):
        self.segments = segments
        self.tombstones = np.asarray(tombstones, dtype=np.uint64)
        self.schema = segments[0].schema
        self.index_dir = segments[0].index_dir
        self.stats = self._merge_stats()
        self._docs: MultiDocTable | None = None

    def _merge_stats(self) -> dict:
        out: dict[str, float] = {}
        n_total = sum(s.stats.get("n_docs", 0) for s in self.segments)
        n_live = n_total - int(self.tombstones.size)
        out["n_docs"] = n_live
        for key in self.segments[0].stats:
            if key.startswith("avgdl_"):
                tot = sum(s.stats[key] * s.stats.get("n_docs", 0) for s in self.segments)
                # tombstoned docs keep contributing length here; exact avgdl
                # maintenance would re-aggregate doclens minus tombstones
                out[key] = (tot / n_total) if n_total else 0.0
        return out

    def _filter_postings(self, p: Postings) -> Postings:
        if self.tombstones.size == 0:
            return p
        mask = ~np.isin(p.doc_ids, self.tombstones, assume_unique=True)
        if mask.all():
            return p
        if p.pos_flat is not None:
            idx = np.flatnonzero(mask)
            parts = [p.pos_flat[p.pos_offsets[i]:p.pos_offsets[i + 1]] for i in idx]
            offs = np.zeros(len(idx) + 1, np.int64)
            np.cumsum(p.tfs[mask], out=offs[1:])
            flat = np.concatenate(parts) if parts else np.empty(0, np.uint64)
            return Postings(p.doc_ids[mask], p.tfs[mask], flat, offs)
        return Postings(p.doc_ids[mask], p.tfs[mask], None, None)

    def _merge_found(self, per_seg: list[list[tuple[str, np.float32, Postings]]],
                     order_key) -> list[tuple[str, np.float32, Postings]]:
        by_word: dict[str, list[tuple[np.float32, Postings]]] = {}
        for seg_res in per_seg:
            for w, s, p in seg_res:
                by_word.setdefault(w, []).append((s, p))
        out = []
        for w, items in by_word.items():
            score = items[0][0]
            if len(items) == 1:
                merged = items[0][1]
            else:
                ids = np.concatenate([p.doc_ids for _, p in items])
                tfs = np.concatenate([p.tfs for _, p in items])
                order = np.argsort(ids, kind="stable")
                if all(p.pos_flat is not None for _, p in items):
                    # per-doc position slices, gathered in merged doc order
                    slices = [p.pos_flat[p.pos_offsets[i]:p.pos_offsets[i + 1]]
                              for _, p in items for i in range(len(p.doc_ids))]
                    parts = [slices[i] for i in order]
                    offs = np.zeros(len(order) + 1, np.int64)
                    np.cumsum(tfs[order], out=offs[1:])
                    merged = Postings(ids[order], tfs[order],
                                      np.concatenate(parts) if parts else np.empty(0, np.uint64),
                                      offs)
                else:
                    merged = Postings(ids[order], tfs[order], None, None)
            p2 = self._filter_postings(merged)
            if p2.df:
                out.append((w, score, p2))
        out.sort(key=order_key)
        return out

    def search_sc(self, op: str, context: str, key: str, *, with_positions: bool = True):
        per_seg = [s.search_sc(op, context, key, with_positions=with_positions)
                   for s in self.segments]
        return self._merge_found(per_seg, lambda t: (len(t[0]), t[0]))

    def lookup_range_sc(self, context: str, lb: str, ub: str, *, with_positions: bool = True):
        per_seg = [s.lookup_range_sc(context, lb, ub, with_positions=with_positions)
                   for s in self.segments]
        return self._merge_found(per_seg, lambda t: t[0])

    def term_stats(self, context: str, term: str) -> tuple[int, int]:
        df, mtf = 0, 0
        for s in self.segments:
            d, m = s.term_stats(context, term)
            df += d
            mtf = max(mtf, m)
        return df, mtf

    @property
    def docs(self) -> "MultiDocTable":
        if self._docs is None:
            self._docs = MultiDocTable([s.docs for s in self.segments])
        return self._docs


class MultiDocTable:
    """Concatenated doc tables of all segments, doc_id-sorted."""

    def __init__(self, tables: list[DocTable]):
        ids = np.concatenate([t.doc_id for t in tables])
        order = np.argsort(ids, kind="stable")
        self.doc_id = ids[order]
        self.url = np.concatenate([t.url for t in tables])[order]
        self.weight = np.concatenate([t.weight for t in tables])[order]
        if any(t.desc is not None for t in tables):
            self.desc = np.concatenate([
                t.desc if t.desc is not None
                else np.asarray([""] * t.n_docs, dtype=object)
                for t in tables])[order]
        else:
            self.desc = None
        self.lens = {}
        for cx in tables[0].lens:
            self.lens[cx] = np.concatenate([t.lens[cx] for t in tables])[order]
        self.n_docs = len(self.doc_id)

    rows_of = DocTable.rows_of
    urls_of = DocTable.urls_of
    weights_of = DocTable.weights_of
    lens_of = DocTable.lens_of
    descs_of = DocTable.descs_of
