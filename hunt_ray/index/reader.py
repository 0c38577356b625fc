"""Index reading: partition dictionaries + postings decode + doc table.

The query-time analog of Hunt's in-memory ``ContextIndex`` + ``DocTable``
(``Hunt/ContextIndex.hs:109-123``, ``Hunt/DocTable/HashedDocTable.hs``),
re-expressed over the partitioned Parquet index that ``build.py`` writes.

A ``PartitionReader`` owns one term-range partition: its sorted dictionary
(binary-searchable, like the ``.tv`` term dictionary,
``SegmentIndex/Directory/TermInfos.hs:72-110``) and its postings rows
(decoded on demand, chunk-cached). An ``IndexReader`` routes lookups to the
partitions a key can live in using the manifest's term-range boundaries —
case-sensitive exact/prefix/range lookups touch only the covering span;
case-insensitive lookups scan every partition's ``term_lc`` column.

In serve mode each partition reader would live inside a query actor
(one actor owns K partitions); locally we read in-process.
"""

from __future__ import annotations

import bisect
import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analyze.normalize import (
    denormalize_date,
    denormalize_position,
    position_in_range as _pos_in_range,
    unzerofill_int,
)
from ..analyze.schema import Schema, schema_from_json
from ..common import scores as sc
from .codec import DOC_SHARDS, decode_doc_ids, decode_positions, decode_tfs
from .manifest import Manifest


def _docs_shard_count(docs_dir: str, file_schema) -> int | None:
    """Build-time shard modulus of a docs directory: None for pre-shard
    formats (no ``shard`` column), else docs/_meta.json's ``doc_shards``
    (falling back to the current DOC_SHARDS constant)."""
    if file_schema is None or "shard" not in file_schema.names:
        return None
    import json

    try:
        with open(os.path.join(docs_dir, "_meta.json")) as f:
            v = json.load(f).get("doc_shards")
            if v:
                return int(v)
    except (OSError, ValueError):
        pass
    return DOC_SHARDS

MAX_CHAR = "\U0010ffff"


@dataclass
class Postings:
    """Decoded posting list for one (context, term)."""

    doc_ids: np.ndarray          # uint64, ascending
    tfs: np.ndarray              # uint64
    pos_flat: np.ndarray | None  # uint64 (None for doc-set kinds)
    pos_offsets: np.ndarray | None

    @property
    def df(self) -> int:
        return len(self.doc_ids)


class ArrowStrSeq:
    """Bisect-compatible sequence view over an Arrow string array.

    The dictionary stays resident in the Arrow buffer (~5-8× smaller than
    a list of Python str objects — measured in
    test_reader_memory_arrow_resident_dictionaries);
    ``__getitem__`` decodes ONE scalar per probe, so a binary search costs
    O(log n) tiny conversions instead of materializing the whole column."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.arr = arr

    def __len__(self) -> int:
        return len(self.arr)

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(len(self.arr))
            if step != 1:
                raise ValueError("ArrowStrSeq slices must be contiguous")
            return ArrowStrSeq(self.arr.slice(start, stop - start))
        return self.arr[i].as_py()

    def __iter__(self):
        for v in self.arr:
            yield v.as_py()

    def take(self, indices) -> "ArrowStrSeq":
        return ArrowStrSeq(self.arr.take(pa.array(np.asarray(indices))))


class PartitionReader:
    def __init__(self, index_dir: str, part: int):
        self.part = part
        self.dict_tbl = pq.read_table(os.path.join(index_dir, "dict", f"part={part:05d}.parquet"))
        self.post_path = os.path.join(index_dir, "postings", f"part={part:05d}.parquet")
        self._post_tbl: pa.Table | None = None
        # dictionaries stay Arrow-resident (no to_pylist copies): binary
        # search probes decode single scalars; long-lived serve actors
        # holding many partitions pay buffer bytes, not Python objects
        self.terms = ArrowStrSeq(self.dict_tbl.column("term"))
        self.term_lc = ArrowStrSeq(self.dict_tbl.column("term_lc"))
        # case-folded shadow dictionary (written at build time): lc_perm is a
        # per-context-span permutation into term_lc order, so nocase lookups
        # are a binary search like the case-sensitive path
        if "lc_perm" in self.dict_tbl.column_names:
            self.lc_perm = self.dict_tbl.column("lc_perm").to_numpy()
            self.term_lc_sorted = self.term_lc.take(self.lc_perm)
        else:  # pre-format-4 index: fall back to the linear scan
            self.lc_perm = None
            self.term_lc_sorted = None
        self.nocase_fallback_scans = 0  # diagnostics: stays 0 on format>=4
        self.df = self.dict_tbl.column("df").to_numpy()
        self.max_tf = self.dict_tbl.column("max_tf").to_numpy()
        self.n_chunks = self.dict_tbl.column("n_chunks").to_numpy()
        # postings-row start offset per dict entry (rows ordered like dict)
        self.post_row_start = np.zeros(len(self.terms) + 1, dtype=np.int64)
        np.cumsum(self.n_chunks, out=self.post_row_start[1:])
        # context → contiguous [lo, hi) span of dict entries (vectorized
        # boundary scan over a transient numpy view; only the spans persist)
        self.cx_span: dict[str, tuple[int, int]] = {}
        ctx = self.dict_tbl.column("context").to_numpy(zero_copy_only=False)
        if len(ctx):
            starts = np.flatnonzero(np.r_[True, ctx[1:] != ctx[:-1]])
            ends = np.r_[starts[1:], len(ctx)]
            for lo, hi in zip(starts, ends):
                self.cx_span[str(ctx[lo])] = (int(lo), int(hi))
        self.contexts = ArrowStrSeq(self.dict_tbl.column("context"))
        # bounded decoded-postings cache: long-lived serve actors would
        # otherwise grow with every distinct term ever queried. FIFO
        # eviction (dict preserves insertion order) — head terms are
        # re-queried constantly and re-enter immediately.
        self._postings_cache: dict[int, Postings] = {}
        self._postings_cache_cap = int(os.environ.get(
            "HUNT_POSTINGS_CACHE", "4096"))
        # lazy STR R-trees per geo context (see rtree())
        self._rtrees: dict[str, object] = {}

    # -- dictionary lookups -----------------------------------------

    def _span(self, context: str) -> tuple[int, int]:
        return self.cx_span.get(context, (0, 0))

    def lookup(self, op: str, context: str, key: str) -> list[int]:
        """Dict-entry indices matching a TextSearchOp
        (Case/NoCase/PrefixCase/PrefixNoCase — PrefixTreeIndex.hs:86-98)."""
        lo, hi = self._span(context)
        if lo == hi:
            return []
        if op == "case":
            i = bisect.bisect_left(self.terms, key, lo, hi)
            return [i] if i < hi and self.terms[i] == key else []
        if op == "prefix_case":
            i = bisect.bisect_left(self.terms, key, lo, hi)
            j = bisect.bisect_left(self.terms, key + MAX_CHAR, lo, hi)
            return list(range(i, j))
        if op not in ("nocase", "prefix_nocase"):
            raise ValueError(op)
        key_lc = key.lower()
        if self.term_lc_sorted is not None:
            # O(log |dict|): binary search the case-folded shadow order
            i = bisect.bisect_left(self.term_lc_sorted, key_lc, lo, hi)
            if op == "nocase":
                j = bisect.bisect_right(self.term_lc_sorted, key_lc, lo, hi)
            else:
                j = bisect.bisect_left(self.term_lc_sorted, key_lc + MAX_CHAR, lo, hi)
            return sorted(int(e) for e in self.lc_perm[i:j])
        self.nocase_fallback_scans += 1
        import pyarrow.compute as pc

        span_lc = self.term_lc.arr.slice(lo, hi - lo)
        if op == "nocase":
            mask = pc.equal(span_lc, key_lc)
        else:
            mask = pc.starts_with(span_lc, pattern=key_lc)
        return (np.flatnonzero(mask.to_numpy(zero_copy_only=False)) + lo).tolist()

    def lookup_range(self, context: str, lb: str, ub: str) -> list[int]:
        """Inclusive key-range scan (Index.hs:111-120)."""
        lo, hi = self._span(context)
        if lo == hi:
            return []
        i = bisect.bisect_left(self.terms, lb, lo, hi)
        j = bisect.bisect_right(self.terms, ub, lo, hi)
        return list(range(i, j))

    def rtree(self, context: str):
        """Lazy STR-packed R-tree over a geo context's dictionary keys
        (built once per (partition, context), cached for the reader's
        lifetime — serve actors amortize it across queries)."""
        t = self._rtrees.get(context)
        if t is None:
            from .rtree import STRTree, decode_dims

            lo, hi = self._span(context)
            lat, lon = decode_dims(self.terms.arr.slice(lo, hi - lo))
            t = STRTree(lat, lon)
            self._rtrees[context] = t
        return t

    def lookup_range_2d(self, context: str, lb: str, ub: str) -> list[int]:
        """Rectangle range via the R-tree — exact (no Z-order superset, no
        per-key filter needed), ascending dict-entry indices. The
        ``lookupRange k1 k2`` semantics of RTreeIndex.hs:88-89."""
        lo, _ = self._span(context)
        return (self.rtree(context).query_keys(lb, ub) + lo).tolist()

    # -- postings ---------------------------------------------------

    def _postings_table(self) -> pa.Table:
        if self._post_tbl is None:
            self._post_tbl = pq.read_table(self.post_path)
        return self._post_tbl

    def postings(self, entry: int, *, with_positions: bool = True) -> Postings:
        cached = self._postings_cache.get(entry)
        if cached is not None and (cached.pos_flat is not None or not with_positions):
            return cached
        tbl = self._postings_table()
        lo, hi = int(self.post_row_start[entry]), int(self.post_row_start[entry + 1])
        doc_parts, tf_parts, pos_parts, off_parts = [], [], [], []
        base = 0
        any_pos = False
        # one column slice per blob kind (head terms span many chunk rows —
        # per-row .as_py() scalar indexing costs a wrapper object each)
        sub = tbl.slice(lo, hi - lo)
        dblobs = sub.column("doc_ids").to_pylist()
        tblobs = sub.column("tfs").to_pylist()
        pblobs = sub.column("positions").to_pylist()
        for dblob, tblob, pblob in zip(dblobs, tblobs, pblobs):
            dids = decode_doc_ids(dblob)
            tfs = decode_tfs(tblob)
            doc_parts.append(dids)
            tf_parts.append(tfs)
            if with_positions and pblob:
                any_pos = True
                flat, offs = decode_positions(pblob, tfs)
                pos_parts.append(flat)
                off_parts.append(offs[1:] + base)  # skip leading 0, rebase
                base += len(flat)
        doc_ids = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.uint64)
        tfs = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.uint64)
        if any_pos:
            pos_flat = np.concatenate(pos_parts)
            pos_offsets = np.concatenate([np.zeros(1, np.int64)] + off_parts)
        else:
            pos_flat, pos_offsets = None, None
        p = Postings(doc_ids=doc_ids, tfs=tfs, pos_flat=pos_flat, pos_offsets=pos_offsets)
        if len(self._postings_cache) >= self._postings_cache_cap:
            self._postings_cache.pop(next(iter(self._postings_cache)))
        self._postings_cache[entry] = p
        return p


class IndexReader:
    def __init__(self, index_dir: str, generation: int | None = None):
        man = Manifest(index_dir)
        gen_info = man.latest() if generation is None else man.read_generation(generation)
        if gen_info is None:
            raise FileNotFoundError(f"no committed generation under {index_dir}")
        self.info = gen_info
        self.index_dir = index_dir
        self.schema: Schema = schema_from_json(gen_info["schema"])
        self.boundaries: list[str] = gen_info["boundaries"]
        self.num_partitions: int = gen_info["num_partitions"]
        # per-part [lc_min, lc_max] of term_lc (None for empty parts or
        # pre-format-4 indexes) — prunes nocase fan-out
        self.lc_ranges: list | None = gen_info.get("lc_ranges")
        self.stats: dict = gen_info.get("stats", {})
        self._parts: dict[int, PartitionReader] = {}
        self._docs = None

    # -- partition routing ------------------------------------------

    def _part_of(self, key: str) -> int:
        return bisect.bisect_right(self.boundaries, key)

    def parts_for(self, op: str, key: str, ub: str | None = None) -> list[int]:
        if op in ("nocase", "prefix_nocase"):
            if not self.lc_ranges:
                return list(range(self.num_partitions))
            kl = key.lower()
            out = []
            for k, rng in enumerate(self.lc_ranges[: self.num_partitions]):
                if not rng:
                    continue
                lc_min, lc_max = rng
                if op == "nocase":
                    if lc_min <= kl <= lc_max:
                        out.append(k)
                elif lc_max >= kl and lc_min <= kl + MAX_CHAR:
                    out.append(k)
            return out
        if op == "case":
            return [self._part_of(key)]
        if op == "prefix_case":
            return list(range(self._part_of(key), self._part_of(key + MAX_CHAR) + 1))
        if op == "range":
            return list(range(self._part_of(key), self._part_of(ub if ub is not None else key) + 1))
        raise ValueError(op)

    def part(self, k: int) -> PartitionReader:
        pr = self._parts.get(k)
        if pr is None:
            pr = self._parts[k] = PartitionReader(self.index_dir, k)
        return pr

    # -- scored search (searchSc / lookupRangeSc) -------------------

    def _denorm(self, context: str, word: str) -> str:
        kn = self.schema[context].ctype.key_normalizer
        if kn == "ZeroFill":
            return unzerofill_int(word)
        if kn == "Date":
            return denormalize_date(word)
        if kn == "Position":
            return denormalize_position(word)
        return word

    def search_sc(self, op: str, context: str, key: str, *,
                  with_positions: bool = True) -> list[tuple[str, np.float32, Postings]]:
        """All (found_word, similarity_score, postings) for a lookup.

        Scoring mirrors the per-index searchSc implementations:
        text → ``similar`` (InvertedIndex.hs:92-97), int → ``similarInt``
        (PrefixTreeIndex.hs:257-262), date → default 1.0 (Index.hs:107-108).
        Found words are returned in shortest-first order
        (``toListShortestFirst``, PrefixTreeIndex.hs:86-98).
        """
        results: list[tuple[str, np.float32, Postings]] = []
        for k in self.parts_for(op, key):
            if k >= self.num_partitions:
                continue
            pr = self.part(k)
            for entry in pr.lookup(op, context, key):
                word = pr.terms[entry]
                s = self.score_found(context, key, word)
                results.append((word, s, pr.postings(entry, with_positions=with_positions)))
        results.sort(key=lambda t: (len(t[0]), t[0]))
        return results

    def score_found(self, context: str, key: str, word: str) -> np.float32:
        """searchSc similarity for one found word (see class docstring refs)."""
        cs = self.schema[context]
        kind = cs.ctype.search_score
        if kind == "similar":
            return sc.similar(key, word)
        if kind == "similar_int":
            return _similar_int(
                self._denorm(context, key) if cs.ctype.key_normalizer else key,
                self._denorm(context, word))
        return sc.DEF_SCORE

    def lookup_range_sc(self, context: str, lb: str, ub: str, *,
                        with_positions: bool = True) -> list[tuple[str, np.float32, Postings]]:
        cs = self.schema[context]
        results: list[tuple[str, np.float32, Postings]] = []
        for k in self.parts_for("range", lb, ub):
            if k >= self.num_partitions:
                continue
            pr = self.part(k)
            use_rtree = cs.ctype.range_structure == "rtree"
            entries = (pr.lookup_range_2d(context, lb, ub) if use_rtree
                       else pr.lookup_range(context, lb, ub))
            for entry in entries:
                word = pr.terms[entry]
                if not use_rtree and cs.ctype.range_filter == "position2d" \
                        and not _pos_in_range(word, lb, ub):
                    continue  # Z-order scan superset → per-dimension filter
                if cs.ctype.range_score == "similar_range_int":
                    s = _similar_range_int(unzerofill_int(lb), unzerofill_int(ub),
                                           self._denorm(context, word))
                else:
                    s = sc.DEF_SCORE  # lookupRangeSc default (Index.hs:116-119)
                results.append((word, s, pr.postings(entry, with_positions=with_positions)))
        results.sort(key=lambda t: t[0])  # SM.toList ascending
        return results

    # -- doc table --------------------------------------------------

    @property
    def docs(self) -> "DocTable":
        if self._docs is None:
            self._docs = DocTable(os.path.join(self.index_dir, "docs"), self.schema)
        return self._docs

    def term_stats(self, context: str, term: str) -> tuple[int, int]:
        """(df, max_tf) summed across partitions for one exact term."""
        df = 0
        mtf = 0
        for k in self.parts_for("case", term):
            if k >= self.num_partitions:
                continue
            pr = self.part(k)
            for e in pr.lookup("case", context, term):
                df += int(pr.df[e])
                mtf = max(mtf, int(pr.max_tf[e]))
        return df, mtf


class DocTable:
    """doc_id-sorted in-memory doc table (url, weight, per-context lengths).

    Locally this loads the whole docs parquet. With ``shard=(s, n)`` it
    loads ONLY the rows with ``doc_id % n == s``: the build writes docs
    with a ``shard = doc_id % DOC_SHARDS`` column and one row group per
    shard value, so when ``n`` divides the build's shard count the read
    prunes to the matching row groups (never materializing other shards'
    rows — asserted by ``rows_scanned``); doclens partitions are doc-routed
    by ``doc_id % num_partitions``, so when ``n`` divides
    ``num_partitions`` only the compatible part files are opened.
    """

    def __init__(self, docs_dir: str, schema: Schema, *,
                 shard: tuple[int, int] | None = None,
                 num_partitions: int | None = None):
        import glob as g

        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        files = sorted(g.glob(os.path.join(docs_dir, "*.parquet")))
        file_schema = pq.read_schema(files[0]) if files else None
        build_shards = _docs_shard_count(docs_dir, file_schema)
        mask_filter = False
        if shard is not None and files:
            s, n = shard
            if build_shards and n >= 1 and build_shards % n == 0:
                # doc_id % n == (doc_id % B) % n when n | B — prune to the
                # row groups of the compatible build shards
                keep = [S for S in range(build_shards) if S % n == s]
                tbl = pads.dataset(files).to_table(
                    filter=pc.field("shard").isin(keep))
            else:  # old format / incompatible n: full read + modulo mask
                tbl = pa.concat_tables([pq.read_table(f) for f in files])
                mask_filter = True
        else:
            tbl = pa.concat_tables([pq.read_table(f) for f in files]) if files \
                else pa.table({"doc_id": pa.array([], pa.uint64()),
                               "url": pa.array([], pa.string()),
                               "weight": pa.array([], pa.float32())})
        self.rows_scanned = tbl.num_rows  # diagnostics: shard loads ≪ corpus
        if mask_filter:
            s, n = shard
            dids = tbl.column("doc_id").to_numpy()
            tbl = tbl.filter(pa.array((dids % np.uint64(n)) == np.uint64(s)))
        order = np.argsort(tbl.column("doc_id").to_numpy(), kind="stable")
        self.doc_id = tbl.column("doc_id").to_numpy()[order]
        self.url = np.asarray(tbl.column("url").to_pylist(), dtype=object)[order]
        self.weight = tbl.column("weight").to_numpy().astype(np.float32)[order]
        if "desc" in tbl.column_names:
            self.desc = np.asarray(tbl.column("desc").to_pylist(), dtype=object)[order]
        else:
            self.desc = None
        self.n_docs = len(self.doc_id)
        # per-context doc lengths from the doclens partitions (docs without
        # tokens in a context default to 0)
        self.lens: dict[str, np.ndarray] = {
            cx: np.zeros(self.n_docs, dtype=np.uint32) for cx in schema
        }
        lens_files = sorted(g.glob(os.path.join(os.path.dirname(docs_dir.rstrip("/")),
                                                "doclens", "*.parquet")))
        if shard is not None and lens_files:
            s, n = shard
            P = num_partitions if num_partitions is not None else len(lens_files)
            if n >= 1 and P % n == 0:
                # doclens/part=K holds docs with doc_id % P == K — only
                # parts with K % n == s can hold this shard's docs
                def _part_no(f: str) -> int:
                    base = os.path.basename(f)
                    return int(base.split("=")[1].split(".")[0])

                lens_files = [f for f in lens_files if _part_no(f) % n == s]
        for f in lens_files:
            lt = pq.read_table(f)
            if shard is not None and lt.num_rows:
                s, n = shard
                dids_all = lt.column("doc_id").to_numpy()
                lt = lt.filter(pa.array((dids_all % np.uint64(n)) == np.uint64(s)))
            cxs = np.asarray(lt.column("context").to_pylist(), dtype=object)
            dids = lt.column("doc_id").to_numpy()
            dls = lt.column("doclen").to_numpy()
            rows = np.searchsorted(self.doc_id, dids)
            for cx in np.unique(cxs):
                m = cxs == cx
                if cx in self.lens:
                    self.lens[cx][rows[m]] = dls[m]

    def rows_of(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_id, doc_ids)
        idx = np.clip(idx, 0, max(0, self.n_docs - 1))
        ok = self.doc_id[idx] == doc_ids
        if not ok.all():
            raise KeyError("unknown doc_ids in lookup")
        return idx

    def urls_of(self, doc_ids: np.ndarray) -> np.ndarray:
        return self.url[self.rows_of(doc_ids)]

    def weights_of(self, doc_ids: np.ndarray) -> np.ndarray:
        return self.weight[self.rows_of(doc_ids)]

    def lens_of(self, context: str, doc_ids: np.ndarray) -> np.ndarray:
        return self.lens[context][self.rows_of(doc_ids)]

    def descs_of(self, doc_ids: np.ndarray) -> list[dict]:
        """Parsed description payloads (empty dicts when none stored)."""
        import json

        if self.desc is None:
            return [{} for _ in doc_ids]
        return [json.loads(d) if d else {}
                for d in self.desc[self.rows_of(doc_ids)]]


def _similar_int(searched: str, found: str) -> np.float32:
    """similarInt (Scoring/Keys.hs:59-68): Gaussian bell around the target."""
    try:
        s, f = int(searched), int(found)
    except ValueError:
        return sc.NO_SCORE
    return _similar_float(np.float32(s), np.float32(f))


def _similar_range_int(lb: str, ub: str, found: str) -> np.float32:
    """similarRangeInt (Keys.hs:70-82): bell around the range midpoint."""
    try:
        lo, hi, f = int(lb), int(ub), int(found)
    except ValueError:
        return sc.NO_SCORE
    return _similar_float(np.float32(np.float32(lo + hi) / np.float32(2.0)), np.float32(f))


def _similar_float(mu: np.float32, x: np.float32) -> np.float32:
    """similarFloat/bellCurve (Keys.hs:84-99).

    sigma = max(|mu|, 10) / 10 (backtick ``max`` binds tighter than ``/``).
    """
    sigma = np.float32(max(abs(float(mu)), 10.0) / 10.0)
    two_sigma2 = np.float32(2.0) * sigma * sigma
    d = np.float32(x - mu)
    val = np.float32(np.exp(np.float32(-(d * d) / two_sigma2)))
    return sc.mk_score(val)
