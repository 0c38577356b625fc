"""Query processor: Hunt's combinator algebra over the partitioned index.

Faithful reimplementation of ``Hunt/Query/Processor.hs`` +
``Hunt/Query/Intermediate.hs`` + ``Hunt/Scoring/SearchResult.hs`` with
numpy sorted-array kernels instead of ``IntMap``s, float32 throughout
(Hunt's Score is a Haskell Float — Score.hs:28).

The algebra (SURVEY.md §2.9):

- primary word → per default context: normalize key per context schema
  (Processor.hs:165-181), dictionary search with similarity scores
  (InvertedIndex.hs:92-97), docLimit truncation (Intermediate.hs:323-342)
- aggregation raw→scored: per found word w, per doc d:
  ``score = similar(q,w) × tf(w,d)``, words of one context merged per doc
  with the Score monoid **max** (SearchResult.hs:88-92, Score.hs:66-71)
- context aggregation: weight-boost then max-merge across contexts
  (``boostAndAggregateCx``, Intermediate.hs:267-278)
- AND = doc intersection with score **sum** (SearchResult.hs:111-112);
  OR = union with max; AND NOT = difference (left scores)
- Phrase/Follow/Near run per-context-local on position-carrying raw
  results (``forallCxLocal``, Processor.hs:568-577) with the positional
  intersections of Positions.hs:93-114
- final ranking: score × doc weight, order (score desc, url asc)
  (Intermediate.hs:348-384)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..common import scores as sc
from ..index.reader import IndexReader, Postings
from . import ast as A

F32 = np.float32


class QueryError(ValueError):
    pass


# ------------------------------------------------------------------ results

@dataclass
class OccSet:
    """Occurrences for one found word: sorted doc ids (+ positions)."""

    doc_ids: np.ndarray                 # uint64 ascending
    tfs: np.ndarray                     # int64 (position counts per doc)
    pos_flat: np.ndarray | None = None  # uint64
    pos_offsets: np.ndarray | None = None

    @property
    def size(self) -> int:
        return len(self.doc_ids)

    def positions_of(self, i: int) -> np.ndarray:
        if self.pos_flat is None:
            return np.empty(0, np.uint64)
        return self.pos_flat[self.pos_offsets[i]:self.pos_offsets[i + 1]]


@dataclass
class Entry:
    """One ([words], Scored SearchResult) raw entry (Intermediate.hs:159-161)."""

    words: tuple[str, ...]
    score: np.float32
    occ: OccSet


RawCx = dict[str, list[Entry]]          # ScoredCx ScoredRawDocs


def _gather_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Indices covering [starts[i], starts[i]+lengths[i]) per segment."""
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(lengths)
    offs = ends - lengths
    return (np.repeat(np.asarray(starts, np.int64), lengths)
            + (np.arange(total, dtype=np.int64) - np.repeat(offs, lengths)))


@dataclass
class ScoredDocs:
    doc_ids: np.ndarray                  # uint64 ascending
    scores: np.ndarray                   # float32

    @staticmethod
    def empty() -> "ScoredDocs":
        return ScoredDocs(np.empty(0, np.uint64), np.empty(0, F32))


# ------------------------------------------------------------------ kernels

def _union_max(a: ScoredDocs, b: ScoredDocs) -> ScoredDocs:
    """mappend on ScoredDocs: unionWith Score-monoid max (SearchResult.hs:88-92)."""
    if a.doc_ids.size == 0:
        return b
    if b.doc_ids.size == 0:
        return a
    ids = np.concatenate([a.doc_ids, b.doc_ids])
    scs = np.concatenate([a.scores, b.scores])
    order = np.argsort(ids, kind="stable")
    ids, scs = ids[order], scs[order]
    uniq, start = np.unique(ids, return_index=True)
    out = np.maximum.reduceat(scs, start)
    return ScoredDocs(uniq, out.astype(F32))


def _intersect_sum(a: ScoredDocs, b: ScoredDocs) -> ScoredDocs:
    """intersectSC: intersectionWith (+) (SearchResult.hs:111-112)."""
    common, ia, ib = np.intersect1d(a.doc_ids, b.doc_ids, assume_unique=True,
                                    return_indices=True)
    return ScoredDocs(common, (a.scores[ia] + b.scores[ib]).astype(F32))


def _difference(a: ScoredDocs, b: ScoredDocs) -> ScoredDocs:
    """differenceSC: DM.difference (keep left scores)."""
    mask = ~np.isin(a.doc_ids, b.doc_ids, assume_unique=True)
    return ScoredDocs(a.doc_ids[mask], a.scores[mask])


def _boost(b: float, x: ScoredDocs) -> ScoredDocs:
    bb = F32(b)
    if bb == F32(1.0):  # boost defScore is identity (SearchResult.hs:95-97)
        return x
    return ScoredDocs(x.doc_ids, (x.scores * bb).astype(F32))


# ------------------------------------------------------------------ processor

@dataclass
class ProcessConfig:
    """ProcessConfig (Processor.hs:79-90); defaults word=100/doc=500,
    rank-identity tests pin both to 0 (= no limit).

    ``fuzzy_mode`` extends the reference: ``"nocase"`` (default) mirrors
    the reference quirk of evaluating ``QFuzzy`` as a nocase search
    (Processor.hs:606-616, the `Query/Fuzzy.hs` generator is never
    consumed by the processor); ``"expand"`` additionally ORs in a nocase
    lookup of every variant in ``fuzzy.fuzz(word)``, the variant's
    entries weighted by ``1/(1+fuzz_score)`` in float32 (closer variants
    score higher; the base word keeps weight 1). Expansion only ADDS
    entries, so expanded results are always a superset of nocase results.
    """

    word_limit: int = 100
    doc_limit: int = 500
    fuzzy_mode: str = "nocase"          # "nocase" (reference) | "expand"
    fuzzy_config: "object | None" = None  # fuzzy.FuzzyConfig override


@dataclass
class Processor:
    reader: IndexReader
    config: ProcessConfig = field(default_factory=ProcessConfig)

    def __post_init__(self):
        self.schema = self.reader.schema
        # initProcessor: default contexts in Data.Map (ascending) key order
        self.default_contexts = sorted(cx for cx, cs in self.schema.items() if cs.default)

    # -- key normalization (normQueryCx, Processor.hs:165-181) -------

    def _norm_query_key(self, context: str, key: str) -> str | None:
        from ..analyze.normalize import NORMALIZERS, VALIDATORS

        import pyarrow as pa

        cs = self.schema[context]
        arr = pa.array([key], type=pa.large_string())
        mask = VALIDATORS[cs.ctype.validator](arr)
        if not bool(mask[0]):
            return None
        for name in cs.normalizers:
            arr = NORMALIZERS[name](arr)
        if cs.ctype.key_normalizer:
            arr = NORMALIZERS[cs.ctype.key_normalizer](arr)
        return arr[0].as_py()

    # -- primary eval (evalPrimary/searchCx, Processor.hs:599-634) ---

    _OPMAP = {
        (True, A.CASE): "prefix_case",
        (True, A.NOCASE): "prefix_nocase",
        (True, A.FUZZY): "prefix_nocase",   # QFuzzy processed as nocase (Processor.hs:606-616)
        (False, A.CASE): "case",
        (False, A.NOCASE): "nocase",
        (False, A.FUZZY): "nocase",
    }

    def _entry_from_postings(self, context: str, word: str, score: np.float32,
                             post: Postings) -> Entry:
        from ..analyze.schema import VALUE_KINDS

        kind = self.schema[context].ctype.value_kind
        vk = VALUE_KINDS.get(kind)
        if vk is not None and vk.to_occ is not None:
            # custom value kind (IndexImpl analog): the registered hook
            # interprets the stored payload and builds the OccSet itself
            return Entry((word,), score, vk.to_occ(post))
        docset = kind != "positions"
        if docset:
            # doc-set index kinds upcast to singleton positions {1} per doc
            # (docIdsToOccurrences', SearchResult.hs:66-69) so tf=1 and the
            # positional combinators behave exactly like the reference
            n = len(post.doc_ids)
            tfs = np.ones(n, dtype=np.int64)
            occ = OccSet(post.doc_ids, tfs,
                         np.ones(n, dtype=np.uint64),
                         np.arange(n + 1, dtype=np.int64))
        else:
            occ = OccSet(post.doc_ids, post.tfs.astype(np.int64),
                         post.pos_flat, post.pos_offsets)
        return Entry((word,), score, occ)

    def _fuzzy_variants(self, word: str) -> list[tuple[str, np.float32]]:
        """Deterministic (variant, weight) list for fuzzy_mode="expand":
        ``fuzzy.fuzz`` output sorted by word, weight = 1/(1+score) f32."""
        from .fuzzy import fuzz

        fs = fuzz(word, self.config.fuzzy_config)
        one = F32(1.0)
        return [(w, F32(one / (one + F32(sc))))
                for w, sc in sorted(fs.items())]

    def _search_cx(self, prefix: bool, tst: str, word: str, cx: str) -> list[Entry]:
        key = self._norm_query_key(cx, word)
        if key is None:
            return []
        op = self._OPMAP[(prefix, tst)]
        raw = self.reader.search_sc(op, cx, key)
        entries = [self._entry_from_postings(cx, w, s, p) for (w, s, p) in raw]
        if tst == A.FUZZY and self.config.fuzzy_mode == "expand":
            seen_keys = {key}
            for w2, weight in self._fuzzy_variants(word):
                k2 = self._norm_query_key(cx, w2)
                if k2 is None or k2 in seen_keys:
                    continue
                seen_keys.add(k2)
                for (w, s, p) in self.reader.search_sc(op, cx, k2):
                    entries.append(self._entry_from_postings(
                        cx, w, F32(s * weight), p))
        # NB: wordLimit is declared in the reference ProcessConfig but unused
        # by the current query processor (Processor.hs:83) — only docLimit
        # shapes results; we mirror that
        return self._limit_raw(entries)

    def _range_cx(self, lb: str, ub: str, cx: str) -> list[Entry]:
        nlb = self._norm_query_key(cx, lb)
        nub = self._norm_query_key(cx, ub)
        if nlb is None or nub is None:
            return []
        raw = self.reader.lookup_range_sc(cx, nlb, nub)
        entries = [self._entry_from_postings(cx, w, s, p) for (w, s, p) in raw]
        return self._limit_raw(entries)

    def _limit_raw(self, entries: list[Entry]) -> list[Entry]:
        """limitRawResult (Intermediate.hs:326-342)."""
        mx = self.config.doc_limit
        if mx <= 0 or len(entries) <= 1:
            return entries
        out = []
        for i, e in enumerate(entries):
            if i == len(entries) - 1:
                out.append(e)
                break
            if e.occ.size > mx:
                out.append(e)
                break
            mx -= e.occ.size
            out.append(e)
            if mx <= 0:
                break
        return out

    # -- lookup prefetch (serve mode) --------------------------------

    def collect_lookups(self, q, contexts: list[str] | None = None,
                        _searches: "set | None" = None,
                        _ranges: "set | None" = None):
        """Walk the query AST and collect every primary dictionary lookup
        the evaluators can issue: ``(op, context, normalized_key)`` triples
        plus ``(context, lb, ub)`` ranges.

        Used by remote readers to batch all of a query's term lookups into
        ONE fan-out per actor before evaluation (each Ray round trip costs
        ~10 ms on this sandbox; a phrase query issues one lookup per word).
        QContext uses replace semantics here, which yields a superset of
        ``eval_raw``'s intersect semantics — prefetching a superset is
        harmless.
        """
        searches = set() if _searches is None else _searches
        ranges = set() if _ranges is None else _ranges
        cxs = self.default_contexts if contexts is None else contexts
        if isinstance(q, (A.QWord, A.QFullWord)):
            prefix = isinstance(q, A.QWord)
            words = [q.word]
            if q.op == A.FUZZY and self.config.fuzzy_mode == "expand":
                words += [w for w, _ in self._fuzzy_variants(q.word)]
            for cx in cxs:
                for w in words:
                    key = self._norm_query_key(cx, w)
                    if key is not None:
                        searches.add((self._OPMAP[(prefix, q.op)], cx, key))
        elif isinstance(q, A.QRange):
            for cx in cxs:
                nlb = self._norm_query_key(cx, q.lower)
                nub = self._norm_query_key(cx, q.upper)
                if nlb is not None and nub is not None:
                    ranges.add((cx, nlb, nub))
        elif isinstance(q, A.QSeq):
            for a in q.args:
                self.collect_lookups(a, cxs, searches, ranges)
        elif isinstance(q, A.QContext):
            self._check_contexts(q.contexts)
            self.collect_lookups(q.query, list(dict.fromkeys(q.contexts)),
                                 searches, ranges)
        elif isinstance(q, A.QBoost):
            self.collect_lookups(q.query, cxs, searches, ranges)
        elif isinstance(q, A.QPhrase):
            self.collect_lookups(self._norm_phrase(q), cxs, searches, ranges)
        return searches, ranges

    def _eval_primary(self, q, contexts: list[str]) -> RawCx:
        """forallCx(evalPrimary q) — one dictionary search per context."""
        if isinstance(q, A.QWord):
            fn = lambda cx: self._search_cx(True, q.op, q.word, cx)
        elif isinstance(q, A.QFullWord):
            fn = lambda cx: self._search_cx(False, q.op, q.word, cx)
        else:
            raise QueryError(f"not a primary query: {q}")
        return {cx: es for cx in contexts if (es := fn(cx))}

    # -- raw-result algebra (Intermediate.hs:159-260) ----------------

    @staticmethod
    def _boost_raw(b: float, r: RawCx) -> RawCx:
        bb = F32(b)
        return {cx: [Entry(e.words, F32(e.score * bb), e.occ) for e in es]
                for cx, es in r.items()}

    @staticmethod
    def _occ_intersect_positional(a: OccSet, b: OccSet, lb: int, ub: int) -> OccSet:
        """intersectOccurrences with intersectionWithIntervall lb ub
        (Occurrences.hs / Positions.hs:107-114): keep position p of A iff
        some q in B(doc) has q - p in [lb, ub]; drop docs left empty."""
        common, ia, ib = np.intersect1d(a.doc_ids, b.doc_ids, assume_unique=True,
                                        return_indices=True)
        if common.size == 0 or a.pos_flat is None or b.pos_flat is None:
            return OccSet(np.empty(0, np.uint64), np.empty(0, np.int64),
                          np.empty(0, np.uint64), np.zeros(1, np.int64))
        # fully vectorized: flatten A's positions for the common docs with a
        # per-position doc rank, then test each against B's positions via one
        # searchsorted on (rank << 32 | position) composite keys
        a_tfs = a.tfs[ia]
        a_slices_start = a.pos_offsets[ia]
        n_pos = int(a_tfs.sum())
        gather_a = _gather_ranges(a_slices_start, a_tfs)
        pa_flat = a.pos_flat[gather_a].astype(np.int64)
        rank_a = np.repeat(np.arange(common.size, dtype=np.int64), a_tfs)

        b_tfs = b.tfs[ib]
        gather_b = _gather_ranges(b.pos_offsets[ib], b_tfs)
        pb_flat = b.pos_flat[gather_b].astype(np.int64)
        rank_b = np.repeat(np.arange(common.size, dtype=np.int64), b_tfs)
        # positions are < 2^31; shift ranks above the position space
        KEY = np.int64(1) << np.int64(32)
        b_keys = rank_b * KEY + pb_flat  # ascending (docs in order, pos asc)
        lo_keys = rank_a * KEY + np.maximum(pa_flat + lb, 0)
        hi_keys = rank_a * KEY + (pa_flat + ub)
        pos_idx = np.searchsorted(b_keys, lo_keys, side="left")
        ok = (pos_idx < b_keys.size)
        ok &= np.where(ok, b_keys[np.minimum(pos_idx, b_keys.size - 1)] <= hi_keys, False)
        if not ok.any():
            return OccSet(np.empty(0, np.uint64), np.empty(0, np.int64),
                          np.empty(0, np.uint64), np.zeros(1, np.int64))
        kept_rank = rank_a[ok]
        kept_pos = pa_flat[ok].astype(np.uint64)
        tf_per_doc = np.bincount(kept_rank, minlength=common.size)
        live = tf_per_doc > 0
        new_tfs = tf_per_doc[live].astype(np.int64)
        offs = np.zeros(len(new_tfs) + 1, np.int64)
        np.cumsum(new_tfs, out=offs[1:])
        return OccSet(common[live], new_tfs, kept_pos, offs)

    @staticmethod
    def _occ_intersect(a: OccSet, b: OccSet) -> OccSet:
        common, ia, ib = np.intersect1d(a.doc_ids, b.doc_ids, assume_unique=True,
                                        return_indices=True)
        # positions united per doc (Occ.intersectOccurrences Pos.union);
        # tf = union size — vectorized via (rank << 32 | pos) composite keys
        if common.size and a.pos_flat is not None and b.pos_flat is not None:
            KEY = np.uint64(1) << np.uint64(32)
            a_tfs, b_tfs = a.tfs[ia], b.tfs[ib]
            pa_flat = a.pos_flat[_gather_ranges(a.pos_offsets[ia], a_tfs)]
            pb_flat = b.pos_flat[_gather_ranges(b.pos_offsets[ib], b_tfs)]
            rank_a = np.repeat(np.arange(common.size, dtype=np.uint64), a_tfs)
            rank_b = np.repeat(np.arange(common.size, dtype=np.uint64), b_tfs)
            keys = np.unique(np.concatenate([rank_a * KEY + pa_flat,
                                             rank_b * KEY + pb_flat]))
            rank = (keys // KEY).astype(np.int64)
            pos = keys % KEY
            tfs = np.bincount(rank, minlength=common.size).astype(np.int64)
            offs = np.zeros(common.size + 1, np.int64)
            np.cumsum(tfs, out=offs[1:])
            return OccSet(common, tfs, pos, offs)
        tfs = np.maximum(a.tfs[ia], b.tfs[ib]) if common.size else np.empty(0, np.int64)
        return OccSet(common, tfs, None, None)

    @staticmethod
    def _occ_difference(a: OccSet, b: OccSet) -> OccSet:
        mask = ~np.isin(a.doc_ids, b.doc_ids, assume_unique=True)
        if a.pos_flat is None:
            return OccSet(a.doc_ids[mask], a.tfs[mask], None, None)
        idx = np.flatnonzero(mask)
        flat = a.pos_flat[_gather_ranges(a.pos_offsets[idx], a.tfs[idx])]
        offs = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(a.tfs[mask], out=offs[1:])
        return OccSet(a.doc_ids[mask], a.tfs[mask], flat, offs)

    def _raw_binop(self, op: str, r1: RawCx, r2: RawCx,
                   lb: int | None = None, ub: int | None = None) -> RawCx:
        """binopSCX lifted over per-context entry lists (Intermediate.hs:199-246)."""
        out: RawCx = {}
        for cx, es1 in r1.items():
            es2 = r2.get(cx, [])
            entries: list[Entry] = []
            if op == "difference":
                for e1 in es1:
                    occ = e1.occ
                    for e2 in es2:
                        occ = self._occ_difference(occ, e2.occ)
                    if occ.size:
                        entries.append(Entry(e1.words, e1.score, occ))
            else:
                for e1 in es1:
                    for e2 in es2:
                        if op == "intersect":
                            occ = self._occ_intersect(e1.occ, e2.occ)
                        else:  # positional
                            occ = self._occ_intersect_positional(e1.occ, e2.occ, lb, ub)
                        if occ.size:
                            entries.append(Entry(e1.words + e2.words,
                                                 F32(e1.score + e2.score), occ))
            if entries:
                out[cx] = entries
        return out

    @staticmethod
    def _raw_union(r1: RawCx, r2: RawCx) -> RawCx:
        out: RawCx = {cx: list(es) for cx, es in r1.items()}
        for cx, es in r2.items():
            out.setdefault(cx, []).extend(es)
        return out

    def _eval_seq_local(self, op, raws: list[RawCx]) -> RawCx:
        """evalSequence/evalFollow/evalNear (Intermediate.hs:500-538)."""
        if not raws:
            return {}
        acc = raws[0]
        if op == A.PHRASE:
            dists = [(d, d) for d in range(1, len(raws))]
        elif isinstance(op, A.Follow):
            dists = [(1, op.d * i) for i in range(1, len(raws))]
        elif isinstance(op, A.Near):
            dists = [(-op.d * i, op.d * i) for i in range(1, len(raws))]
        else:
            raise QueryError(f"not a local op: {op}")
        for (lo, hi), r2 in zip(dists, raws[1:]):
            acc = self._raw_binop("positional", acc, r2, lb=lo, ub=hi)
        return acc

    # -- aggregation (Intermediate.hs:440-483, 267-278) --------------

    def _aggregate_entry(self, e: Entry) -> ScoredDocs:
        """Aggregate ScoredOccs → ScoredDocs: score = sim × tf."""
        scs = (e.score * e.occ.tfs.astype(F32)).astype(F32)
        return ScoredDocs(e.occ.doc_ids, scs)

    def _aggregate_raw(self, raw: RawCx, contexts_weighted: bool = True) -> ScoredDocs:
        """aggregate per context (max over entries), then
        boostAndAggregateCx: weight-boost + max-merge across contexts."""
        res = ScoredDocs.empty()
        for cx in sorted(raw):  # Data.Map fold order (ascending keys)
            cx_res = ScoredDocs.empty()
            for e in raw[cx]:
                cx_res = _union_max(cx_res, self._aggregate_entry(e))
            w = self.schema[cx].weight if contexts_weighted else 1.0
            res = _union_max(_boost(w, cx_res), res)
        return res

    # -- evaluators (Processor.hs:250-308) ---------------------------

    def eval_scored_docs(self, q, contexts: list[str] | None = None) -> ScoredDocs:
        cxs = self.default_contexts if contexts is None else contexts
        if isinstance(q, (A.QWord, A.QFullWord)):
            return self._aggregate_raw(self._eval_primary(q, cxs))
        if isinstance(q, A.QRange):
            raw = {cx: es for cx in cxs if (es := self._range_cx(q.lower, q.upper, cx))}
            return self._aggregate_raw(raw)
        if isinstance(q, A.QSeq):
            if A.is_local_cx_op(q.op):
                # forallCxLocal: per context separately, then aggregate
                merged: RawCx = {}
                for cx in cxs:
                    raws = [self.eval_raw(a, [cx]) for a in q.args]
                    part = self._eval_seq_local(q.op, raws)
                    for c2, es in part.items():
                        merged.setdefault(c2, []).extend(es)
                return self._aggregate_raw(merged)
            parts = [self.eval_scored_docs(a, cxs) for a in q.args]
            if q.op == A.AND:
                res = parts[0]
                for p in parts[1:]:
                    res = _intersect_sum(res, p)
                return res
            if q.op == A.OR:
                res = parts[0]
                for p in parts[1:]:
                    res = _union_max(res, p)
                return res
            if q.op == A.AND_NOT:
                res = parts[0]
                for p in parts[1:]:
                    res = _difference(res, p)
                return res
            raise QueryError(f"bad seq op {q.op}")
        if isinstance(q, A.QContext):
            self._check_contexts(q.contexts)
            return self.eval_scored_docs(q.query, list(dict.fromkeys(q.contexts)))
        if isinstance(q, A.QBoost):
            return _boost(q.weight, self.eval_scored_docs(q.query, cxs))
        if isinstance(q, A.QPhrase):
            return self.eval_scored_docs(self._norm_phrase(q), cxs)
        raise QueryError(f"can't evaluate {q}")

    def eval_raw(self, q, contexts: list[str]) -> RawCx:
        """evalScoredRawDocs (Processor.hs:389-427) — single-context aware."""
        if isinstance(q, (A.QWord, A.QFullWord)):
            return self._eval_primary(q, contexts)
        if isinstance(q, A.QRange):
            return {cx: es for cx in contexts if (es := self._range_cx(q.lower, q.upper, cx))}
        if isinstance(q, A.QSeq):
            if A.is_local_cx_op(q.op):
                raws = [self.eval_raw(a, contexts) for a in q.args]
                return self._eval_seq_local(q.op, raws)
            raws = [self.eval_raw(a, contexts) for a in q.args]
            if q.op == A.AND:
                res = raws[0]
                for r in raws[1:]:
                    res = self._raw_binop("intersect", res, r)
                return res
            if q.op == A.OR:
                res = raws[0]
                for r in raws[1:]:
                    res = self._raw_union(res, r)
                return res
            if q.op == A.AND_NOT:
                res = raws[0]
                for r in raws[1:]:
                    res = self._raw_binop("difference", res, r)
                return res
        if isinstance(q, A.QContext):
            # restrictCxs: intersect current contexts (Processor.hs:527-537)
            self._check_contexts(q.contexts)
            sub = [c for c in contexts if c in q.contexts]
            return self.eval_raw(q.query, sub)
        if isinstance(q, A.QBoost):
            return self._boost_raw(q.weight, self.eval_raw(q.query, contexts))
        if isinstance(q, A.QPhrase):
            return self.eval_raw(self._norm_phrase(q), contexts)
        raise QueryError(f"can't evaluate raw {q}")

    def _norm_phrase(self, q: A.QPhrase):
        """normQuery: QPhrase op w → QSeq Phrase (QFullWord op) words
        (Processor.hs:657-659)."""
        ws = q.phrase.split()
        if len(ws) == 1:
            return A.QFullWord(q.op, ws[0])
        return A.QSeq(A.PHRASE, tuple(A.QFullWord(q.op, w) for w in ws))

    def _check_contexts(self, cxs: tuple[str, ...]) -> None:
        bad = [c for c in cxs if c not in self.schema]
        if bad:
            raise QueryError(f"mentioned context(s) do not exist: {bad}")  # 404
