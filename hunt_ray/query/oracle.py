"""Independent in-Python oracle of Hunt's query semantics (tests only).

A deliberately naive dict/set implementation of the same scoring algebra
(SURVEY.md §2.9) used to validate the engine's results rank-identically:
different data structures (dicts of sets vs sorted numpy arrays), different
evaluation code, same float32 arithmetic. Shares only the analyzer module
(which has its own golden tests) and the query parser (syntax, not
semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..analyze.html import context_text
from ..analyze.normalize import NORMALIZERS, VALIDATORS
from ..analyze.schema import Schema
from ..analyze.tokenize import tokenize_context
from ..common.hashing import doc_ids_for_urls
from ..common.scores import similar
from ..index.reader import _similar_int, _similar_range_int
from . import ast as A

F32 = np.float32

Occ = dict[int, frozenset[int]]          # doc -> positions
Entry = tuple[tuple[str, ...], np.float32, Occ]
RawCx = dict[str, list[Entry]]


class OracleIndex:
    def __init__(self, pages: pa.Table, schema: Schema):
        self.schema = schema
        self.urls: dict[int, str] = {}
        self.weights: dict[int, np.float32] = {}
        self.ix: dict[str, dict[str, dict[int, set[int]]]] = {cx: {} for cx in schema}
        doc_ids = doc_ids_for_urls(pages.column("url"))
        for i, u in enumerate(pages.column("url").to_pylist()):
            self.urls[int(doc_ids[i])] = u
            self.weights[int(doc_ids[i])] = F32(1.0)
        for cx, cs in schema.items():
            texts = context_text(pages, cs.source)
            stream = tokenize_context(texts, cs)
            cxmap = self.ix[cx]
            for tok, di, pos in zip(stream.tokens_list(), stream.doc_idx, stream.positions):
                d = int(doc_ids[di])
                cxmap.setdefault(tok, {}).setdefault(d, set()).add(int(pos))

    def search(self, op: str, cx: str, key: str) -> list[tuple[str, np.float32, Occ]]:
        cs = self.schema[cx]
        cxmap = self.ix[cx]
        if op == "case":
            words = [key] if key in cxmap else []
        elif op == "prefix_case":
            words = [w for w in cxmap if w.startswith(key)]
        elif op == "nocase":
            kl = key.lower()
            words = [w for w in cxmap if w.lower() == kl]
        elif op == "prefix_nocase":
            kl = key.lower()
            words = [w for w in cxmap if w.lower().startswith(kl)]
        else:
            raise ValueError(op)
        words.sort(key=lambda w: (len(w), w))
        out = []
        for w in words:
            occ = {d: frozenset(ps) for d, ps in cxmap[w].items()}
            out.append((w, self._score_word(cs, key, w), occ))
        return out

    def _score_word(self, cs, key: str, word: str) -> np.float32:
        kind = cs.ctype.search_score
        if kind == "similar":
            return similar(key, word)
        if kind == "similar_int":
            return _similar_int(self._denorm(cs, key), self._denorm(cs, word))
        return F32(1.0)

    def _denorm(self, cs, w: str) -> str:
        from ..analyze.normalize import denormalize_date, unzerofill_int

        if cs.ctype.key_normalizer == "ZeroFill":
            return unzerofill_int(w)
        if cs.ctype.key_normalizer == "Date":
            return denormalize_date(w)
        return w

    def range(self, cx: str, lb: str, ub: str) -> list[tuple[str, np.float32, Occ]]:
        from ..analyze.normalize import position_in_range

        cs = self.schema[cx]
        words = sorted(w for w in self.ix[cx] if lb <= w <= ub)
        if cs.ctype.range_filter == "position2d":
            words = [w for w in words if position_in_range(w, lb, ub)]
        out = []
        for w in words:
            if cs.ctype.range_score == "similar_range_int":
                s = _similar_range_int(self._denorm(cs, lb), self._denorm(cs, ub),
                                       self._denorm(cs, w))
            else:
                s = F32(1.0)
            occ = {d: frozenset(ps) for d, ps in self.ix[cx][w].items()}
            out.append((w, s, occ))
        return out


class OracleProcessor:
    def __init__(self, index: OracleIndex, doc_limit: int = 0):
        self.index = index
        self.schema = index.schema
        self.doc_limit = doc_limit
        self.default_contexts = sorted(cx for cx, cs in self.schema.items() if cs.default)

    # -- helpers -----------------------------------------------------

    def _norm_key(self, cx: str, key: str) -> str | None:
        cs = self.schema[cx]
        arr = pa.array([key], type=pa.large_string())
        if not bool(VALIDATORS[cs.ctype.validator](arr)[0]):
            return None
        for n in cs.normalizers:
            arr = NORMALIZERS[n](arr)
        if cs.ctype.key_normalizer:
            arr = NORMALIZERS[cs.ctype.key_normalizer](arr)
        return arr[0].as_py()

    def _docset(self, cx: str, occ: Occ) -> Occ:
        """Doc-set contexts collapse to singleton positions {1}."""
        if self.schema[cx].ctype.value_kind == "positions":
            return occ
        return {d: frozenset({1}) for d in occ}

    def _limit_raw(self, entries):
        mx = self.doc_limit
        if mx <= 0 or len(entries) <= 1:
            return entries
        out = []
        for i, e in enumerate(entries):
            if i == len(entries) - 1 or len(e[2]) > mx:
                out.append(e)
                break
            mx -= len(e[2])
            out.append(e)
            if mx <= 0:
                break
        return out

    def _primary(self, q, cxs) -> RawCx:
        prefix = isinstance(q, A.QWord)
        opmap = {A.CASE: "case", A.NOCASE: "nocase", A.FUZZY: "nocase"}
        op = ("prefix_" if prefix else "") + opmap[q.op]
        out: RawCx = {}
        for cx in cxs:
            key = self._norm_key(cx, q.word)
            if key is None:
                continue
            found = self.index.search(op, cx, key)
            entries = [((w,), s, self._docset(cx, occ)) for w, s, occ in found]
            entries = self._limit_raw(entries)
            if entries:
                out[cx] = entries
        return out

    def _range(self, q: A.QRange, cxs) -> RawCx:
        out: RawCx = {}
        for cx in cxs:
            lb, ub = self._norm_key(cx, q.lower), self._norm_key(cx, q.upper)
            if lb is None or ub is None:
                continue
            found = self.index.range(cx, lb, ub)
            entries = [((w,), s, self._docset(cx, occ)) for w, s, occ in found]
            entries = self._limit_raw(entries)
            if entries:
                out[cx] = entries
        return out

    # -- raw algebra -------------------------------------------------

    @staticmethod
    def _occ_positional(a: Occ, b: Occ, lb: int, ub: int) -> Occ:
        out = {}
        for d, pa_ in a.items():
            pb = b.get(d)
            if not pb:
                continue
            kept = frozenset(p for p in pa_ if any(lb <= q - p <= ub for q in pb))
            if kept:
                out[d] = kept
        return out

    @staticmethod
    def _occ_intersect(a: Occ, b: Occ) -> Occ:
        return {d: a[d] | b[d] for d in a.keys() & b.keys()}

    @staticmethod
    def _occ_diff(a: Occ, b: Occ) -> Occ:
        return {d: ps for d, ps in a.items() if d not in b}

    def _raw_seq(self, op, raws: list[RawCx]) -> RawCx:
        if not raws:
            return {}
        if op == A.PHRASE:
            dists = [(d, d) for d in range(1, len(raws))]
        elif isinstance(op, A.Follow):
            dists = [(1, op.d * i) for i in range(1, len(raws))]
        elif isinstance(op, A.Near):
            dists = [(-op.d * i, op.d * i) for i in range(1, len(raws))]
        acc = raws[0]
        for (lo, hi), r2 in zip(dists, raws[1:]):
            nxt: RawCx = {}
            for cx, es1 in acc.items():
                es2 = r2.get(cx, [])
                entries = []
                for ws1, s1, o1 in es1:
                    for ws2, s2, o2 in es2:
                        o = self._occ_positional(o1, o2, lo, hi)
                        if o:
                            entries.append((ws1 + ws2, F32(s1 + s2), o))
                if entries:
                    nxt[cx] = entries
            acc = nxt
        return acc

    def eval_raw(self, q, cxs) -> RawCx:
        if isinstance(q, (A.QWord, A.QFullWord)):
            return self._primary(q, cxs)
        if isinstance(q, A.QRange):
            return self._range(q, cxs)
        if isinstance(q, A.QPhrase):
            return self.eval_raw(self._phrase_to_seq(q), cxs)
        if isinstance(q, A.QBoost):
            r = self.eval_raw(q.query, cxs)
            return {cx: [(ws, F32(s * F32(q.weight)), o) for ws, s, o in es]
                    for cx, es in r.items()}
        if isinstance(q, A.QContext):
            sub = [c for c in cxs if c in q.contexts]
            return self.eval_raw(q.query, sub)
        if isinstance(q, A.QSeq):
            if A.is_local_cx_op(q.op):
                return self._raw_seq(q.op, [self.eval_raw(a, cxs) for a in q.args])
            raws = [self.eval_raw(a, cxs) for a in q.args]
            if q.op == A.OR:
                out: RawCx = {}
                for r in raws:
                    for cx, es in r.items():
                        out.setdefault(cx, []).extend(es)
                return out
            acc = raws[0]
            for r in raws[1:]:
                nxt: RawCx = {}
                for cx, es1 in acc.items():
                    es2 = r.get(cx, [])
                    entries = []
                    if q.op == A.AND:
                        for ws1, s1, o1 in es1:
                            for ws2, s2, o2 in es2:
                                o = self._occ_intersect(o1, o2)
                                if o:
                                    entries.append((ws1 + ws2, F32(s1 + s2), o))
                    else:  # AND NOT
                        for ws1, s1, o1 in es1:
                            o = o1
                            for _ws2, _s2, o2 in es2:
                                o = self._occ_diff(o, o2)
                            if o:
                                entries.append((ws1, s1, o))
                    if entries:
                        nxt[cx] = entries
                acc = nxt
            return acc
        raise ValueError(f"oracle raw: {q}")

    def _phrase_to_seq(self, q: A.QPhrase):
        ws = q.phrase.split()
        if len(ws) == 1:
            return A.QFullWord(q.op, ws[0])
        return A.QSeq(A.PHRASE, tuple(A.QFullWord(q.op, w) for w in ws))

    # -- scored docs -------------------------------------------------

    def _aggregate(self, raw: RawCx) -> dict[int, np.float32]:
        res: dict[int, np.float32] = {}
        for cx in sorted(raw):
            cx_res: dict[int, np.float32] = {}
            for _ws, s, occ in raw[cx]:
                for d, ps in occ.items():
                    v = F32(s * F32(len(ps)))
                    prev = cx_res.get(d)
                    cx_res[d] = v if prev is None else max(prev, v)
            w = F32(self.schema[cx].weight)
            for d, v in cx_res.items():
                bv = F32(v * w) if w != F32(1.0) else v
                prev = res.get(d)
                res[d] = bv if prev is None else max(prev, bv)
        return res

    def eval_scored(self, q, cxs=None) -> dict[int, np.float32]:
        cxs = self.default_contexts if cxs is None else cxs
        if isinstance(q, (A.QWord, A.QFullWord)):
            return self._aggregate(self._primary(q, cxs))
        if isinstance(q, A.QRange):
            return self._aggregate(self._range(q, cxs))
        if isinstance(q, A.QPhrase):
            return self.eval_scored(self._phrase_to_seq(q), cxs)
        if isinstance(q, A.QBoost):
            out = self.eval_scored(q.query, cxs)
            b = F32(q.weight)
            if b == F32(1.0):
                return out
            return {d: F32(s * b) for d, s in out.items()}
        if isinstance(q, A.QContext):
            return self.eval_scored(q.query, list(dict.fromkeys(q.contexts)))
        if isinstance(q, A.QSeq):
            if A.is_local_cx_op(q.op):
                merged: RawCx = {}
                for cx in cxs:
                    part = self._raw_seq(q.op, [self.eval_raw(a, [cx]) for a in q.args])
                    for c2, es in part.items():
                        merged.setdefault(c2, []).extend(es)
                return self._aggregate(merged)
            parts = [self.eval_scored(a, cxs) for a in q.args]
            acc = parts[0]
            for p in parts[1:]:
                if q.op == A.AND:
                    acc = {d: F32(acc[d] + p[d]) for d in acc.keys() & p.keys()}
                elif q.op == A.OR:
                    acc = dict(acc)
                    for d, s in p.items():
                        prev = acc.get(d)
                        acc[d] = s if prev is None else max(prev, s)
                else:
                    acc = {d: s for d, s in acc.items() if d not in p}
            return acc
        raise ValueError(f"oracle scored: {q}")

    def search(self, q, offset=0, limit=0) -> list[tuple[str, float]]:
        scored = self.eval_scored(q)
        ranked = sorted(
            ((self.index.urls[d], F32(s * self.index.weights[d])) for d, s in scored.items()),
            key=lambda t: (-t[1], t[0]),
        )
        if limit > 0:
            ranked = ranked[offset: offset + limit]
        else:
            ranked = ranked[offset:]
        return [(u, float(s)) for u, s in ranked]

    # -- completion (scored words) ----------------------------------

    def _aggregate_words(self, raw: RawCx) -> dict[str, np.float32]:
        """Intermediate.hs:475-483 over the dict model: per entry, word =
        last of the word tuple, entry score = Score-monoid max (seeded
        1.0) over per-doc sim×tf, summed per word; contexts weight-boosted
        then merged per word with max (same float32 ops as the engine's
        `_aggregate_words`, different structures)."""
        per_cx: dict[str, dict[str, np.float32]] = {}
        for cx, es in raw.items():
            wordmap: dict[str, np.float32] = {}
            for words, score, occ in es:
                per_doc = [F32(score * F32(len(ps))) for ps in occ.values()]
                s = max([F32(1.0)] + per_doc)
                w = words[-1]
                wordmap[w] = F32(wordmap.get(w, F32(0.0)) + s)
            per_cx[cx] = wordmap
        out: dict[str, np.float32] = {}
        for cx in sorted(per_cx):
            cw = F32(self.schema[cx].weight)
            for w, s in per_cx[cx].items():
                boosted = F32(s * cw) if cw != F32(1.0) else s
                prev = out.get(w)
                out[w] = max(prev, boosted) if prev is not None else boosted
        return out

    def _filter_by_docset(self, docset: set[int], raw: RawCx) -> RawCx:
        """filterByDocSet (Intermediate.hs:214-224) on the dict model."""
        out: RawCx = {}
        for cx, es in raw.items():
            kept = [(ws, s, occ2) for ws, s, occ in es
                    if (occ2 := {d: ps for d, ps in occ.items() if d in docset})]
            if kept:
                out[cx] = kept
        return out

    def eval_scored_words(self, q, cxs=None) -> dict[str, np.float32]:
        """evalScoredWords (Processor.hs:320-364) on the dict model —
        mirrors SearchEngine._eval_scored_words shape for shape."""
        cxs = self.default_contexts if cxs is None else cxs
        if isinstance(q, (A.QWord, A.QFullWord)):
            return self._aggregate_words(self._primary(q, cxs))
        if isinstance(q, A.QRange):
            return self._aggregate_words(self._range(q, cxs))
        if isinstance(q, A.QSeq):
            if q.op in (A.OR, A.AND_NOT):
                return self.eval_scored_words(q.args[-1], cxs)
            if q.op == A.AND:
                init = q.args[0] if len(q.args) == 2 else A.QSeq(A.AND, q.args[:-1])
                docset = set(self.eval_scored(init, cxs))
                raw = self.eval_raw(q.args[-1], cxs)
                return self._aggregate_words(self._filter_by_docset(docset, raw))
            if A.is_local_cx_op(q.op):
                merged: RawCx = {}
                for cx in cxs:
                    part = self._raw_seq(q.op, [self.eval_raw(a, [cx])
                                                for a in q.args])
                    for c2, es in part.items():
                        merged.setdefault(c2, []).extend(es)
                return self._aggregate_words(merged)
        if isinstance(q, A.QContext):
            return self.eval_scored_words(q.query, list(dict.fromkeys(q.contexts)))
        if isinstance(q, A.QBoost):
            out = self.eval_scored_words(q.query, cxs)
            b = F32(q.weight)
            return {w: F32(s * b) for w, s in out.items()}
        if isinstance(q, A.QPhrase):
            ws = q.phrase.split()
            if len(ws) == 1:
                return self.eval_scored_words(A.QWord(q.op, ws[0]), cxs)
            args = tuple([A.QFullWord(q.op, w) for w in ws[:-1]]
                         + [A.QWord(q.op, ws[-1])])
            return self.eval_scored_words(A.QSeq(A.PHRASE, args), cxs)
        raise ValueError(f"oracle complete: {q}")

    def complete(self, query, limit: int = 20) -> list[tuple[str, float]]:
        from .parser import parse_query

        q = parse_query(query) if isinstance(query, str) else query
        scored = self.eval_scored_words(q)
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(w, float(s)) for w, s in ranked[:limit]]
