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
        execInsertList → newSegment path, IndexWriter.hs:78-140).

        Tombstones are scoped to the segments live when the delete was
        committed, so the new segment is NOT affected by older deletes —
        the documented ``update = delete + insert`` flow re-surfaces the
        re-inserted doc (and only the new version: the old segment's copy
        stays tombstoned)."""
        meta = self._meta()
        seg_name = f"seg_{len(meta['segments']):03d}"
        seg_dir = os.path.join(self.root, "segments", seg_name)
        info = build_index(pages_path, seg_dir, cfg)
        reader = self.reader()  # current view: live docs only
        new_reader = IndexReader(seg_dir)
        live_dup = np.intersect1d(reader.docs.doc_id, new_reader.docs.doc_id)
        if live_dup.size:
            raise ValueError(
                f"duplicate URIs in insert ({live_dup.size} docs already live); "
                "delete first (update = delete + insert)")
        meta["segments"].append(os.path.join("segments", seg_name))
        self._commit(meta)
        return info

    # -- tombstones (per-segment scope, like the reference's per-segment
    # deleted-doc sets, IndexWriter.hs:38-42) -------------------------

    def _tombstone_entries(self, meta: dict | None = None) -> list[dict]:
        meta = meta if meta is not None else self._meta()
        t = meta.get("tombstones")
        if not t:
            return []
        if isinstance(t, str):  # legacy format: one global file, all segments
            return [{"file": t, "scope": None}]
        return t

    def _read_tomb_file(self, rel: str) -> np.ndarray:
        t = pq.read_table(os.path.join(self.root, rel))
        return t.column("doc_id").to_numpy(zero_copy_only=False)

    def _segment_rels(self, meta: dict | None = None) -> list[str]:
        meta = meta if meta is not None else self._meta()
        base = meta.get("base") or "."
        return [base] + list(meta["segments"])

    def _tombstones_for(self, seg_rel: str) -> np.ndarray:
        """Union of the tombstone sets whose scope covers one segment."""
        arrs = [self._read_tomb_file(e["file"]) for e in self._tombstone_entries()
                if e.get("scope") is None or seg_rel in e["scope"]]
        if not arrs:
            return np.empty(0, np.uint64)
        out = arrs[0]
        for a in arrs[1:]:
            out = np.union1d(out, a)
        return out.astype(np.uint64)

    def _tombstones(self) -> np.ndarray:
        """Global union across scopes (segment-insensitive callers only)."""
        arrs = [self._read_tomb_file(e["file"]) for e in self._tombstone_entries()]
        if not arrs:
            return np.empty(0, np.uint64)
        out = arrs[0]
        for a in arrs[1:]:
            out = np.union1d(out, a)
        return out.astype(np.uint64)

    def delete_doc_ids(self, doc_ids: np.ndarray) -> int:
        """Tombstone docs in the segments live NOW (applied at query time);
        a segment inserted later is outside this delete's scope. Returns
        the newly-deleted count."""
        meta = self._meta()
        scope = self._segment_rels(meta)
        ids = np.unique(np.asarray(doc_ids, dtype=np.uint64))
        gen = meta["generation"] + 1
        rel = os.path.join("tombstones", f"gen_{gen}.parquet")
        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.uint64())}), path)
        # newly-deleted = ids not yet tombstoned in EVERY in-scope segment
        # (a re-inserted doc is live in its new segment until deleted again)
        covered = np.ones(len(ids), dtype=bool)
        for seg_rel in scope:
            covered &= np.isin(ids, self._tombstones_for(seg_rel))
        entries = self._tombstone_entries(meta) + [{"file": rel, "scope": scope}]
        meta["tombstones"] = entries
        self._commit(meta)
        return int((~covered).sum())

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

    def _segment_dirs(self) -> list[str]:
        meta = self._meta()
        base = meta.get("base")
        dirs = [os.path.join(self.root, base) if base else self.root]
        dirs += [os.path.join(self.root, rel) for rel in meta["segments"]]
        return dirs

    def reader(self) -> "IndexReader | MultiReader":
        segs = [IndexReader(d) for d in self._segment_dirs()]
        per_seg_tombs = [self._tombstones_for(rel) for rel in self._segment_rels()]
        if len(segs) == 1 and per_seg_tombs[0].size == 0:
            return segs[0]
        return MultiReader(segs, per_seg_tombs)

    # -- compaction ---------------------------------------------------

    def compact(self) -> dict:
        """Merge all live segments minus tombstones into one fresh segment
        (Hunt's segment-merge + generation-bump path, SegmentIndex.hs:94-113
        / IndexWriter commit). Distributed per output partition (resumable
        via per-part completion records like a normal build); doc table and
        doclens rewrite tombstone-free, so avgdl becomes exact again.
        After the commit the view is a single segment with no tombstones;
        old segment directories stay on disk for concurrent readers of the
        previous generation."""
        import ray.data as rd

        from ..analyze.schema import schema_to_json
        from .build import _doc_stats
        from .manifest import Manifest, params_hash

        meta = self._meta()
        seg_dirs = self._segment_dirs()
        tombs_list = [self._tombstones_for(rel) for rel in self._segment_rels(meta)]
        base_info = IndexReader(seg_dirs[0]).info
        boundaries = base_info["boundaries"]
        P = base_info["num_partitions"]
        chunk_docs = base_info.get("chunk_docs", 4096)
        schema_json = base_info["schema"]

        gen_tag = meta["generation"] + 1
        out_rel = os.path.join("compacted", f"cmp_{gen_tag:03d}")
        out_dir = os.path.join(self.root, out_rel)
        phash = params_hash({
            "compact": [os.path.relpath(d, self.root) for d in seg_dirs],
            "tombstones": [int(t.size) for t in tombs_list],
            "boundaries": boundaries,
        })
        man = Manifest(out_dir)
        gen = 0

        # per-part merge+encode (skips parts already completed on resume)
        todo = [k for k in range(P) if not man.part_done(gen, k, phash)]
        if todo:
            merge = _make_compactor(seg_dirs, tombs_list, out_dir, boundaries, P,
                                    chunk_docs, phash)
            conc = max(2, min(len(todo), 8))
            _ = (rd.from_items([{"part": k} for k in todo])
                 .map_batches(merge, batch_format="pyarrow", batch_size=1,
                              concurrency=conc).take_all())

        # docs table minus each segment's scoped tombstones (streamed;
        # tombstone sets broadcast once per segment)
        import glob as g

        import ray

        def make_drop(tomb_ref):
            def drop_tombstoned(batch: pa.Table) -> pa.Table:
                t = ray.get(tomb_ref)
                if t.size == 0:
                    return batch
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(~np.isin(ids, t)))
            return drop_tombstoned

        seg_docs = []
        for d, tombs in zip(seg_dirs, tombs_list):
            fs = sorted(g.glob(os.path.join(d, "docs", "*.parquet")))
            if not fs:
                continue
            seg_docs.append(rd.read_parquet(fs).map_batches(
                make_drop(ray.put(tombs)), batch_format="pyarrow"))
        docs_ds = seg_docs[0]
        for extra in seg_docs[1:]:
            docs_ds = docs_ds.union(extra)
        docs_ds.write_parquet(os.path.join(out_dir, "docs"))

        lc_ranges = []
        for k in range(P):
            rec = man.part_record(gen, k)
            lc_ranges.append(rec.get("lc_range") if rec else None)
        from ..analyze.schema import schema_from_json

        stats = _doc_stats(os.path.join(out_dir, "docs"),
                           schema_from_json(schema_json), man, gen, P)
        man.commit_generation(gen, {
            "params_hash": phash,
            "schema": schema_json,
            "boundaries": boundaries,
            "lc_ranges": lc_ranges,
            "num_partitions": P,
            "chunk_docs": chunk_docs,
            "stats": stats,
            "compacted_from": [os.path.relpath(d, self.root) for d in seg_dirs],
            "complete": True,
        })
        self._commit({"base": out_rel, "segments": [], "tombstones": None})
        return man.read_generation(gen)


def _make_compactor(seg_dirs: list[str], tombs_list: list[np.ndarray],
                    out_dir: str, boundaries: list[str], P: int,
                    chunk_docs: int, phash: str):
    """map_batches fn over part items: decode every segment's postings for
    the output part's term range, drop that segment's scoped tombstones,
    merge and re-encode."""
    import bisect
    import time

    from .build import _encode_partition
    from .manifest import Manifest
    from .reader import MAX_CHAR, PartitionReader

    def compact_part(batch: pa.Table) -> pa.Table:
        man = Manifest(out_dir)
        out = []
        for part in batch.column("part").to_pylist():
            if man.part_done(0, part, phash):
                out.append(part)
                continue
            t0 = time.time()
            lb = boundaries[part - 1] if part > 0 else ""
            ub = boundaries[part] if part < len(boundaries) else MAX_CHAR
            cxs, terms, dids, tfs = [], [], [], []
            pos_vals, pos_counts = [], []
            len_cx, len_did, len_dl = [], [], []
            for seg, tombs in zip(seg_dirs, tombs_list):
                from .reader import IndexReader as _IR

                rdr = _IR(seg)
                for k2 in rdr.parts_for("range", lb, ub):
                    if k2 >= rdr.num_partitions:
                        continue
                    pr = PartitionReader(seg, k2)
                    for cx, (lo, hi) in pr.cx_span.items():
                        i = bisect.bisect_left(pr.terms, lb, lo, hi)
                        j = bisect.bisect_left(pr.terms, ub, lo, hi)
                        for e in range(i, j):
                            p = pr.postings(e)
                            keep = ~np.isin(p.doc_ids, tombs) if tombs.size \
                                else np.ones(p.df, dtype=bool)
                            if not keep.any():
                                continue
                            kd = p.doc_ids[keep]
                            kt = p.tfs[keep]
                            cxs.extend([cx] * len(kd))
                            terms.extend([pr.terms[e]] * len(kd))
                            dids.append(kd)
                            tfs.append(kt.astype(np.uint32))
                            if p.pos_flat is not None:
                                for r in np.flatnonzero(keep):
                                    pos_vals.append(
                                        p.pos_flat[p.pos_offsets[r]:p.pos_offsets[r + 1]])
                                pos_counts.append(kt.astype(np.int64))
                            else:
                                pos_counts.append(np.zeros(len(kd), np.int64))
            # doclens: read each segment's doclens (files are doc-routed in
            # their own partitioning; re-route by doc % P)
            for seg, tombs in zip(seg_dirs, tombs_list):
                import glob as g

                import pyarrow.parquet as _pq
                for f in sorted(g.glob(os.path.join(seg, "doclens", "*.parquet"))):
                    lt = _pq.read_table(f)
                    if lt.num_rows == 0:
                        continue
                    ids = lt.column("doc_id").to_numpy(zero_copy_only=False)
                    sel = (ids % np.uint64(P)) == np.uint64(part)
                    if tombs.size:
                        sel &= ~np.isin(ids, tombs)
                    if not sel.any():
                        continue
                    sub = lt.filter(pa.array(sel))
                    len_cx.extend(sub.column("context").to_pylist())
                    len_did.append(sub.column("doc_id").to_numpy(zero_copy_only=False))
                    len_dl.append(sub.column("doclen").to_numpy(zero_copy_only=False))
            # assemble the merged flat table _encode_partition expects
            all_cx = cxs + len_cx
            all_terms = terms + [""] * len(len_cx)
            all_dids = np.concatenate(dids + len_did) if (dids or len_did) \
                else np.empty(0, np.uint64)
            all_tfs = np.concatenate(
                [t for t in tfs] + [d.astype(np.uint32) for d in len_dl]
            ) if (tfs or len_dl) else np.empty(0, np.uint32)
            counts = np.concatenate(
                pos_counts + [np.zeros(sum(len(x) for x in len_did), np.int64)]
            ) if (pos_counts or len_did) else np.empty(0, np.int64)
            flat = np.concatenate(pos_vals).astype(np.uint32) if pos_vals \
                else np.empty(0, np.uint32)
            offsets = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            pos_arr = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), pa.array(flat, pa.uint32()))
            merged = pa.table({
                "context": pa.array(all_cx, pa.string()),
                "term": pa.array(all_terms, pa.string()),
                "doc_id": pa.array(all_dids, pa.uint64()),
                "tf": pa.array(all_tfs, pa.uint32()),
                "positions": pos_arr,
            }) if len(all_cx) else None
            n_rows, n_terms, lc_range, doclen_sums = _encode_partition(
                merged, out_dir, part, chunk_docs)
            man.mark_part_done(0, part, {
                "params_hash": phash, "part": part, "rows": n_rows,
                "terms": n_terms, "lc_range": lc_range,
                "doclen_sums": doclen_sums,
                "lineage": {"inputs": seg_dirs, "params_hash": phash,
                            "kind": "compaction"},
                "merge_seconds": round(time.time() - t0, 3),
                "completed_at": time.time(),
            })
            out.append(part)
        return pa.table({"part": pa.array(out, pa.int32())})

    return compact_part


class MultiReader:
    """Read view over N immutable segments minus per-segment tombstones.

    Implements the reader surface the query processor and the BM25 engine
    consume: ``search_sc`` / ``lookup_range_sc`` filter each segment's
    postings against THAT segment's tombstone scope (the reference's
    per-segment deleted-doc sets, IndexWriter.hs:38-42) before merging per
    found word — so an updated doc (delete + re-insert) serves only its
    new segment's version; ``docs`` is the concatenated live doc table;
    stats are summed.
    """

    def __init__(self, segments: list[IndexReader],
                 tombstones: list[np.ndarray] | np.ndarray):
        self.segments = segments
        if isinstance(tombstones, np.ndarray):  # legacy call: global set
            tombstones = [tombstones] * len(segments)
        self.tombstones = [np.asarray(t, dtype=np.uint64) for t in tombstones]
        self.schema = segments[0].schema
        self.index_dir = segments[0].index_dir
        self.stats = self._merge_stats()
        self._docs: MultiDocTable | None = None

    def _merge_stats(self) -> dict:
        out: dict[str, float] = {}
        n_total = sum(s.stats.get("n_docs", 0) for s in self.segments)
        # approximation: each tombstoned id kills one row somewhere (URIs
        # are unique across live segments; deletes of unknown URIs
        # over-count, as before). A re-inserted doc contributes a second
        # row to n_total, so subtracting the union counts it live once.
        union = np.empty(0, np.uint64)
        for t in self.tombstones:
            if t.size:
                union = np.union1d(union, t)
        n_live = max(0, n_total - int(union.size))
        out["n_docs"] = n_live
        for key in self.segments[0].stats:
            if key.startswith("avgdl_"):
                tot = sum(s.stats[key] * s.stats.get("n_docs", 0) for s in self.segments)
                # tombstoned docs keep contributing length here; exact avgdl
                # maintenance would re-aggregate doclens minus tombstones
                out[key] = (tot / n_total) if n_total else 0.0
        return out

    @staticmethod
    def _filter_postings(p: Postings, tombs: np.ndarray) -> Postings:
        if tombs.size == 0:
            return p
        mask = ~np.isin(p.doc_ids, tombs, assume_unique=True)
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
        for seg_res, tombs in zip(per_seg, self.tombstones):
            for w, s, p in seg_res:
                p = self._filter_postings(p, tombs)  # per-segment scope
                if p.df:
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
            out.append((w, score, merged))
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
            self._docs = MultiDocTable([s.docs for s in self.segments],
                                       self.tombstones)
        return self._docs


class MultiDocTable:
    """Concatenated LIVE doc tables of all segments, doc_id-sorted (each
    segment's rows minus its scoped tombstones — an updated doc appears
    once, from its newest segment)."""

    def __init__(self, tables: list[DocTable],
                 tombstones: list[np.ndarray] | None = None):
        if tombstones is None:
            tombstones = [np.empty(0, np.uint64)] * len(tables)
        keeps = [~np.isin(t.doc_id, tb) if tb.size else np.ones(t.n_docs, bool)
                 for t, tb in zip(tables, tombstones)]
        ids = np.concatenate([t.doc_id[k] for t, k in zip(tables, keeps)])
        order = np.argsort(ids, kind="stable")
        self.doc_id = ids[order]
        self.url = np.concatenate([t.url[k] for t, k in zip(tables, keeps)])[order]
        self.weight = np.concatenate([t.weight[k]
                                      for t, k in zip(tables, keeps)])[order]
        if any(t.desc is not None for t in tables):
            self.desc = np.concatenate([
                (t.desc if t.desc is not None
                 else np.asarray([""] * t.n_docs, dtype=object))[k]
                for t, k in zip(tables, keeps)])[order]
        else:
            self.desc = None
        self.lens = {}
        for cx in tables[0].lens:
            self.lens[cx] = np.concatenate([t.lens[cx][k]
                                            for t, k in zip(tables, keeps)])[order]
        self.n_docs = len(self.doc_id)

    rows_of = DocTable.rows_of
    urls_of = DocTable.urls_of
    weights_of = DocTable.weights_of
    lens_of = DocTable.lens_of
    descs_of = DocTable.descs_of
