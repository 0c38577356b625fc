"""Search engine facade: parse → evaluate → rank → hydrate → page.

Mirrors Hunt's interpreter search path (``Interpreter.hs:535-559``):
evaluate to ScoredDocs, multiply by document weight at hydration
(``Intermediate.hs:348-361``), rank by (score desc, url asc)
(``Intermediate.hs:371-384``), page with offset/limit
(``LimitedResult``, ApiDocument.hs:56-81).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..index.reader import IndexReader
from . import ast as A
from .parser import parse_query
from .processor import ProcessConfig, Processor, ScoredDocs

F32 = np.float32


@dataclass(frozen=True)
class SearchHit:
    url: str
    score: float
    doc_id: int
    description: "dict | None" = None


@dataclass
class LimitedResult:
    """LimitedResult {result, offset, max, count} (ApiDocument.hs:56-81)."""

    result: list[SearchHit]
    offset: int
    max: int
    count: int


class SearchEngine:
    def __init__(self, index_dir: str, config: ProcessConfig | None = None):
        self.reader = IndexReader(index_dir)
        # rank-identity default: no docLimit shaping (docLimit is
        # result-changing; Hunt's server default is 500)
        self.config = config or ProcessConfig(word_limit=0, doc_limit=0)
        self.processor = Processor(self.reader, self.config)

    @classmethod
    def from_reader(cls, reader, config: ProcessConfig | None = None) -> "SearchEngine":
        """Build an engine over any reader implementation (single index,
        segmented MultiReader, or remote actor-backed reader)."""
        self = cls.__new__(cls)
        self.reader = reader
        self.config = config or ProcessConfig(word_limit=0, doc_limit=0)
        self.processor = Processor(reader, self.config)
        return self

    def evaluate(self, query: "str | A.Query") -> ScoredDocs:
        q = parse_query(query) if isinstance(query, str) else query
        self._prefetch(q)
        return self.processor.eval_scored_docs(q)

    def _prefetch(self, q) -> None:
        """Serve mode: resolve all of the query's dictionary lookups in one
        batched fan-out before evaluation (no-op for local readers)."""
        prefetch = getattr(self.reader, "prefetch", None)
        if prefetch is not None:
            searches, ranges = self.processor.collect_lookups(q)
            prefetch(searches, ranges)

    def search(self, query: "str | A.Query", offset: int = 0, limit: int = 20,
               *, with_desc: bool = False,
               select_fields: "list[str] | None" = None) -> LimitedResult:
        """``select_fields`` restricts the returned description keys —
        mkSelect / DocDesc.restrict (Interpreter.hs:585-593,
        DocDesc.hs:165-171)."""
        sd = self.evaluate(query)
        n = sd.doc_ids.size
        if n == 0:
            return LimitedResult([], offset, limit, 0)
        docs = self.reader.docs
        final = (sd.scores * docs.weights_of(sd.doc_ids)).astype(F32)  # wght d * sc
        # rank: score desc, url asc (Ord RankedDoc, Intermediate.hs:380-384).
        # Top-k shortcut: partition down to the candidates that can reach the
        # page (score > kth, plus ALL ties at the kth score so the url
        # tie-break stays exact), then sort only those.
        need = offset + limit if limit > 0 else n
        if 0 < need < n:
            kth = np.partition(final, n - need)[n - need]
            cand = np.flatnonzero(final >= kth)
        else:
            cand = np.arange(n)
        urls_c = docs.urls_of(sd.doc_ids[cand])
        order_c = sorted(range(len(cand)), key=lambda i: (-final[cand[i]], urls_c[i]))
        page_idx = [cand[i] for i in order_c[offset: offset + limit]] if limit > 0 \
            else [cand[i] for i in order_c[offset:]]
        urls_map = docs.urls_of(sd.doc_ids[np.asarray(page_idx, dtype=np.int64)]) \
            if page_idx else []
        descs: list = [None] * len(page_idx)
        if (with_desc or select_fields is not None) and page_idx:
            descs = docs.descs_of(sd.doc_ids[np.asarray(page_idx)])
            if select_fields is not None:
                descs = [{k: v for k, v in d.items() if k in select_fields}
                         for d in descs]
        hits = [SearchHit(url=str(u), score=float(final[i]), doc_id=int(sd.doc_ids[i]),
                          description=d)
                for i, u, d in zip(page_idx, urls_map, descs)]
        return LimitedResult(hits, offset, limit, n)

    def search_unscored(self, query: "str | A.Query") -> np.ndarray:
        """UnScoredDocs evaluation (delete-by-query path,
        Interpreter.hs:605-615) — returns the full doc-id set."""
        sd = self.evaluate(query)
        return sd.doc_ids

    def complete(self, query: "str | A.Query", limit: int = 20) -> list[tuple[str, float]]:
        """Completion search (processQueryScoredWords, Processor.hs:311-383):
        word suggestions for the last primitive prefix in the query.

        Per word: score = Σ over contexts of (similarity × Σ_doc tf×…)
        inserted with (+) (Intermediate.hs:479-483); ranked score desc,
        word asc (RankedWord, Intermediate.hs:409-423).
        """
        q = parse_query(query) if isinstance(query, str) else query
        self._prefetch(q)
        scored = self._eval_scored_words(q, self.processor.default_contexts)
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(w, float(s)) for w, s in ranked[:limit]]

    def _eval_scored_words(self, q, cxs: list[str]) -> dict[str, np.float32]:
        """evalScoredWords (Processor.hs:320-364)."""
        p = self.processor
        if isinstance(q, (A.QWord, A.QFullWord, A.QRange)):
            if isinstance(q, A.QRange):
                raw = {cx: es for cx in cxs if (es := p._range_cx(q.lower, q.upper, cx))}
            else:
                raw = p._eval_primary(q, cxs)
            return self._aggregate_words(raw)
        if isinstance(q, A.QSeq):
            if q.op == A.OR or q.op == A.AND_NOT:
                return self._eval_scored_words(q.args[-1], cxs)
            if q.op == A.AND:
                init = q.args[0] if len(q.args) == 2 else A.QSeq(A.AND, q.args[:-1])
                docs = p.eval_scored_docs(init, cxs)
                raw = p.eval_raw(q.args[-1], cxs)
                filtered = self._filter_by_docset(docs, raw)
                return self._aggregate_words(filtered)
            if A.is_local_cx_op(q.op):
                merged = {}
                for cx in cxs:
                    raws = [p.eval_raw(a, [cx]) for a in q.args]
                    part = p._eval_seq_local(q.op, raws)
                    for c2, es in part.items():
                        merged.setdefault(c2, []).extend(es)
                return self._aggregate_words(merged)
        if isinstance(q, A.QContext):
            p._check_contexts(q.contexts)
            return self._eval_scored_words(q.query, list(dict.fromkeys(q.contexts)))
        if isinstance(q, A.QBoost):
            out = self._eval_scored_words(q.query, cxs)
            b = F32(q.weight)
            return {w: F32(s * b) for w, s in out.items()}
        if isinstance(q, A.QPhrase):
            # normPhraseQuery: last word becomes a prefix search
            ws = q.phrase.split()
            if len(ws) == 1:
                return self._eval_scored_words(A.QWord(q.op, ws[0]), cxs)
            args = tuple([A.QFullWord(q.op, w) for w in ws[:-1]] + [A.QWord(q.op, ws[-1])])
            return self._eval_scored_words(A.QSeq(A.PHRASE, args), cxs)
        raise ValueError(f"can't complete {q}")

    def _filter_by_docset(self, docs: ScoredDocs, raw):
        """filterByDocSet (Intermediate.hs:214-224)."""
        out = {}
        for cx, es in raw.items():
            kept = []
            for e in es:
                mask = np.isin(e.occ.doc_ids, docs.doc_ids, assume_unique=True)
                if mask.any():
                    idx = np.flatnonzero(mask)
                    pos_parts = [e.occ.positions_of(int(i)) for i in idx]
                    offs = np.zeros(len(idx) + 1, np.int64)
                    np.cumsum(e.occ.tfs[mask], out=offs[1:])
                    from .processor import Entry, OccSet

                    occ = OccSet(e.occ.doc_ids[mask], e.occ.tfs[mask],
                                 np.concatenate(pos_parts) if pos_parts else None,
                                 offs if pos_parts else None)
                    kept.append(Entry(e.words, e.score, occ))
            if kept:
                out[cx] = kept
        return out

    def _aggregate_words(self, raw) -> dict[str, np.float32]:
        """Aggregate ScoredRawDocs → ScoredWords (Intermediate.hs:475-483):
        per entry, word = last of the word list, entry score =
        ``DM.foldr (<>) defScore`` over per-doc (sim × tf) — i.e. the Score
        monoid max seeded with 1.0 — summed per word with
        ``M.insertWith (+)``; contexts are weight-boosted then merged per
        word with the Score monoid **max** (ScoredWords mappend =
        unionWith (<>), Intermediate.hs:88-94)."""
        per_cx: dict[str, dict[str, np.float32]] = {}
        for cx, es in raw.items():
            wordmap: dict[str, np.float32] = {}
            for e in es:
                per_doc = (e.score * e.occ.tfs.astype(F32)).astype(F32)
                s = F32(max(F32(1.0), per_doc.max())) if per_doc.size else F32(1.0)
                w = e.words[-1]
                wordmap[w] = F32(wordmap.get(w, F32(0.0)) + s)
            per_cx[cx] = wordmap
        out: dict[str, np.float32] = {}
        for cx in sorted(per_cx):
            cw = F32(self.reader.schema[cx].weight)
            for w, s in per_cx[cx].items():
                boosted = F32(s * cw) if cw != F32(1.0) else s
                prev = out.get(w)
                out[w] = max(prev, boosted) if prev is not None else boosted
        return out
