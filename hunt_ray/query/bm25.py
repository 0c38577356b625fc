"""BM25 scoring + top-k retrieval with max-score / block-max WAND pruning.

The reference has no BM25 and no idf — its scoring is the similarity/tf
algebra reimplemented in ``processor.py`` (SURVEY.md §2.9 note). The
``north_star`` nevertheless mandates a BM25 mode (k1=1.2, b=0.75 defaults)
with block-max WAND for the headline latency metric, sharing the same
postings. Both scorers consume the same partitioned index.

- idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene/Robertson variant —
  non-negative, so WAND upper bounds are valid)
- score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
- local mode precomputes the per-posting score at postings load (it is
  static given tf, dl, df), so ub(t) and the per-128-doc block bounds are
  the EXACT maxima of realized scores — the tightest valid WAND bounds —
  and query-time scoring is searchsorted + gather + add. All pruning
  rules drop strictly-below-θ only (exact bounds can tie).
- serve mode keeps the analytic dl→0 bound
  ub(t) = idf(t) · max_tf·(k1+1) / (max_tf + k1·(1−b)) — doclens live on
  shard actors and are fetched lazily per scoring batch.
- block-max: interval-merged block skipping (see search_block_max), used
  to drop whole posting blocks that can't beat the current threshold

Arithmetic is float64 with a fixed per-doc term-summation order (dictionary
term order), so the exhaustive scorer, the WAND scorer and the DuckDB SQL
oracle in ``__ray_entry__.py`` agree bit-for-bit.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass

import numpy as np

from ..index.reader import IndexReader

BLOCK = 128


@dataclass
class _TermPostings:
    term: str
    idf: float
    ub: float
    doc_ids: np.ndarray    # uint64 ascending
    tfs: np.ndarray        # float64
    block_last: np.ndarray  # last doc id per block
    block_ub: np.ndarray    # per-block score upper bound
    scores: np.ndarray | None = None  # precomputed per-posting BM25
    # (local mode: the per-posting score idf·tf·(k1+1)/(tf+norm(dl)) is
    # static, so it is computed ONCE at postings load — queries reduce to
    # searchsorted + gather + add, and ub/block_ub are the EXACT maxima
    # of realized scores, i.e. the tightest valid WAND bounds. Serve mode
    # keeps the analytic dl→0 bounds: doclens live on shard actors and
    # are fetched lazily per scoring batch.)


class BM25Engine:
    def __init__(self, reader: IndexReader, *, k1: float = 1.2, b: float = 0.75,
                 context: str = "body"):
        self.reader = reader
        self.k1 = float(k1)
        self.b = float(b)
        self.context = context
        self.N = int(reader.stats.get("n_docs", 0))
        self.avgdl = float(reader.stats.get(f"avgdl_{context}", 0.0)) or 1.0
        docs = reader.docs
        if hasattr(docs, "doc_id"):
            # local whole-corpus DocTable: resident doclen arrays
            self._doc_id_sorted = docs.doc_id
            self._doclen = docs.lens[context].astype(np.float64)
            self._docs = None
        else:
            # sharded doc table (serve mode): doclens fetched in batches on
            # demand and cached as growing sorted arrays — driver memory is
            # O(docs touched by queries), never O(corpus)
            self._doc_id_sorted = None
            self._doclen = None
            self._docs = docs
            self._dl_ids = np.empty(0, dtype=np.uint64)
            self._dl_vals = np.empty(0, dtype=np.float64)
        self._term_cache: dict[str, _TermPostings | None] = {}

    # -- query analysis ---------------------------------------------

    def _query_terms(self, query: str) -> list[str]:
        """Tokenize the free-text query like the context's analyzer,
        case-folded (BM25 mode is nocase bag-of-words)."""
        import pyarrow as pa

        from ..analyze.tokenize import tokenize_context

        cs = self.reader.schema[self.context]
        stream = tokenize_context(pa.array([query]), cs)
        seen, out = set(), []
        for t in stream.tokens_list():
            tl = t.lower()
            if tl not in seen:
                seen.add(tl)
                out.append(tl)
        return out

    # -- postings load ----------------------------------------------

    def _query_terms_prefetched(self, query: str) -> list[str]:
        """Tokenize AND, for remote readers, batch-resolve every uncached
        term's nocase lookup in one fan-out per actor before ``_load_term``
        walks them (one RPC per query instead of one per term)."""
        terms = self._query_terms(query)
        prefetch = getattr(getattr(self, "reader", None), "prefetch", None)
        if prefetch is not None:
            miss = [t for t in terms if t not in self._term_cache]
            if miss:
                prefetch([("nocase", self.context, t) for t in miss],
                         with_positions=False)
        return terms

    def _load_term(self, term_lc: str) -> _TermPostings | None:
        if term_lc in self._term_cache:
            return self._term_cache[term_lc]
        # nocase: merge all case variants of the term into one posting list
        found = self.reader.search_sc("nocase", self.context, term_lc,
                                      with_positions=False)
        if not found:
            self._term_cache[term_lc] = None
            return None
        if len(found) == 1:
            doc_ids = found[0][2].doc_ids
            tfs = found[0][2].tfs.astype(np.float64)
        else:
            ids = np.concatenate([p.doc_ids for _, _, p in found])
            tf = np.concatenate([p.tfs for _, _, p in found]).astype(np.float64)
            order = np.argsort(ids, kind="stable")
            ids, tf = ids[order], tf[order]
            uniq, start = np.unique(ids, return_index=True)
            tfs = np.add.reduceat(tf, start)
            doc_ids = uniq
        df = len(doc_ids)
        idf = math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))
        k1, b = self.k1, self.b
        starts = np.arange(0, df, BLOCK)
        block_last = doc_ids[np.minimum(starts + BLOCK - 1, df - 1)]
        if self._doclen is not None:
            # local mode: precompute per-posting scores (identical
            # expression and element order to _tf_score's on-the-fly path,
            # so every mode stays bit-identical to the SQL oracle); bounds
            # become the exact maxima of realized scores
            dl = self._doclen[np.searchsorted(self._doc_id_sorted, doc_ids)]
            scores = idf * (tfs * (k1 + 1.0)) / (
                tfs + k1 * (1.0 - b + b * dl / self.avgdl))
            ub = float(scores.max()) if df else 0.0
            block_ub = np.maximum.reduceat(scores, starts) if df else \
                np.empty(0, dtype=np.float64)
        else:
            # serve mode: analytic dl→0 bounds (strictly above any
            # realized score for dl>0), scores computed lazily per batch
            scores = None
            max_tf = float(tfs.max()) if df else 0.0
            ub = idf * (max_tf * (k1 + 1.0)) / (max_tf + k1 * (1.0 - b)) \
                if df else 0.0
            bmax = np.maximum.reduceat(tfs, starts) if df else \
                np.empty(0, dtype=np.float64)
            block_ub = idf * (bmax * (k1 + 1.0)) / (bmax + k1 * (1.0 - b))
        tp = _TermPostings(term_lc, idf, ub, doc_ids, tfs, block_last,
                           block_ub, scores)
        self._term_cache[term_lc] = tp
        return tp

    # -- scoring ----------------------------------------------------

    def _ensure_dl(self, doc_ids: np.ndarray) -> None:
        """Serve mode: bulk-fetch uncached doclens from the shard actors
        (one fan-out per scoring batch, not per doc)."""
        if self._doclen is not None or len(doc_ids) == 0:
            return
        ids = np.unique(np.asarray(doc_ids, dtype=np.uint64))
        if len(self._dl_ids):
            pos = np.searchsorted(self._dl_ids, ids)
            pos_c = np.minimum(pos, len(self._dl_ids) - 1)
            miss = ids[self._dl_ids[pos_c] != ids]
        else:
            miss = ids
        if miss.size == 0:
            return
        vals = np.asarray(self._docs.lens_of(self.context, miss),
                          dtype=np.float64)
        all_ids = np.concatenate([self._dl_ids, miss])
        all_vals = np.concatenate([self._dl_vals, vals])
        order = np.argsort(all_ids, kind="stable")
        self._dl_ids = all_ids[order]
        self._dl_vals = all_vals[order]

    def _norm_denominator(self, tfs: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
        if self._doclen is not None:
            idx = np.searchsorted(self._doc_id_sorted, doc_ids)
            dl = self._doclen[idx]
        else:
            self._ensure_dl(doc_ids)
            dl = self._dl_vals[np.searchsorted(self._dl_ids, doc_ids)]
        return tfs + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)

    def _tf_score(self, tp: _TermPostings, sel: np.ndarray | slice) -> np.ndarray:
        if tp.scores is not None:
            return tp.scores[sel]
        tfs = tp.tfs[sel]
        dids = tp.doc_ids[sel]
        return tp.idf * (tfs * (self.k1 + 1.0)) / self._norm_denominator(tfs, dids)

    def search_exhaustive(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Vectorized term-at-a-time full scoring (the correctness baseline)."""
        terms = [tp for t in self._query_terms_prefetched(query) if (tp := self._load_term(t))]
        if not terms or k <= 0:
            return []
        uniq = np.unique(np.concatenate([tp.doc_ids for tp in terms]))
        totals = np.zeros(len(uniq), dtype=np.float64)
        # accumulate term-by-term in query-term order: bit-identical to the
        # WAND scorer's sequential per-doc sums (reduceat would sum pairwise)
        for tp in terms:
            idx = np.searchsorted(uniq, tp.doc_ids)
            totals[idx] += self._tf_score(tp, slice(None))
        return self._top_k(uniq, totals, k)

    @staticmethod
    def _top_k(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
        n = len(doc_ids)
        if n == 0 or k <= 0:
            return []
        kk = min(k, n)
        if n > 4 * kk:
            # O(n) select of the kth-largest score, then sort only the
            # ≥-threshold docs — keeping EVERY tie at the threshold, so the
            # (score desc, doc_id asc) result is identical to a full sort
            thresh = np.partition(scores, n - kk)[n - kk]
            keep = scores >= thresh
            doc_ids, scores = doc_ids[keep], scores[keep]
        order = np.lexsort((doc_ids, -scores))[:kk]
        return [(int(doc_ids[i]), float(scores[i])) for i in order]

    # -- WAND -------------------------------------------------------

    def search_wand(self, query: str, k: int = 10, *, block_max: bool = True
                    ) -> list[tuple[int, float]]:
        """Block-max WAND top-k — exact, vectorized (the production path).

        ``block_max=True`` routes to the numpy block-max scorer
        (:meth:`search_block_max`); ``block_max=False`` keeps the
        per-doc document-at-a-time reference implementation
        (:meth:`search_wand_daat`) used by the identity tests.
        """
        if block_max:
            return self.search_block_max(query, k)
        return self.search_wand_daat(query, k)

    def search_wand_daat(self, query: str, k: int = 10, *, block_max: bool = True
                         ) -> list[tuple[int, float]]:
        """Document-at-a-time top-k with classic WAND pivoting — the
        result-identity reference implementation (per-doc Python loop; kept
        for testing, not the serving path).

        Returns exactly the exhaustive top-k: full scores are summed in the
        same fixed term order, ties broken by doc_id ascending.
        """
        terms = [tp for t in self._query_terms_prefetched(query) if (tp := self._load_term(t))]
        if not terms or k <= 0:
            return []
        nt = len(terms)
        ptr = [0] * nt
        exhausted = [False] * nt
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        INF = 1 << 65  # > any uint64 doc id

        def cur_doc(i: int) -> int:
            return int(terms[i].doc_ids[ptr[i]]) if not exhausted[i] else INF

        def advance_to(i: int, target: int) -> None:
            tp = terms[i]
            if target >= 1 << 64:
                exhausted[i] = True
                return
            j = int(np.searchsorted(tp.doc_ids, np.uint64(target), side="left"))
            if j >= len(tp.doc_ids):
                exhausted[i] = True
            else:
                ptr[i] = j

        def full_score(doc: int) -> float:
            s = 0.0
            for i in range(nt):  # fixed term order = exhaustive order
                if exhausted[i]:
                    continue
                tp = terms[i]
                j = ptr[i]
                if j < len(tp.doc_ids) and int(tp.doc_ids[j]) == doc:
                    s += float(self._tf_score(tp, slice(j, j + 1))[0])
            return s

        threshold = -math.inf
        while True:
            live = [i for i in range(nt) if not exhausted[i]]
            if not live:
                break
            live.sort(key=cur_doc)
            # find pivot: smallest prefix whose Σ ub exceeds the threshold
            acc = 0.0
            pivot_idx = None
            for pos, i in enumerate(live):
                acc += terms[i].ub
                # >= (not >): local-mode ubs are exact maxima, so a doc
                # can realize acc exactly and still win the doc_id
                # tie-break against the heap's kth entry
                if acc >= threshold:
                    pivot_idx = pos
                    break
            if pivot_idx is None:
                break  # even all terms together can't beat the threshold
            pivot_doc = cur_doc(live[pivot_idx])
            if pivot_doc >= INF:
                break
            if cur_doc(live[0]) == pivot_doc:
                # every live term whose cursor sits AT the pivot contributes
                # to its score — the refinement bound (and the skip-advance)
                # must cover them all, not just the Σub prefix
                last = pivot_idx
                while last + 1 < len(live) and cur_doc(live[last + 1]) == pivot_doc:
                    last += 1
                # block-max refinement: tighter per-block bound at the pivot
                if block_max and len(heap) >= k:
                    bub = 0.0
                    for i in live[: last + 1]:
                        tp = terms[i]
                        bi = int(np.searchsorted(tp.block_last, np.uint64(pivot_doc)))
                        if bi < len(tp.block_ub):
                            bub += float(tp.block_ub[bi])
                    if bub < threshold:
                        # this block can't beat (or tie) the threshold →
                        # skip the doc; strict < for exact local-mode bounds
                        for i in live[: last + 1]:
                            advance_to(i, pivot_doc + 1)
                        continue
                # all cursors up to pivot aligned → score it
                for i in range(nt):
                    if not exhausted[i] and cur_doc(i) < pivot_doc:
                        advance_to(i, pivot_doc)
                s = full_score(pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, (s, -pivot_doc))
                    if len(heap) == k:
                        threshold = heap[0][0]
                else:
                    if (s, -pivot_doc) > heap[0]:
                        heapq.heapreplace(heap, (s, -pivot_doc))
                        threshold = heap[0][0]
                for i in range(nt):
                    if not exhausted[i] and cur_doc(i) == pivot_doc:
                        advance_to(i, pivot_doc + 1)
            else:
                # advance the earlier cursors up to the pivot
                for i in live[:pivot_idx]:
                    advance_to(i, pivot_doc)
        out = sorted(heap, key=lambda t: (-t[0], -t[1]))
        return [(-d, s) for s, d in out]

    def search_maxscore(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Vectorized MaxScore pruning — exact top-k, numpy throughout.

        Pass 1 scores the rarest term's candidates fully → threshold θ.
        Terms whose collective upper bound can't beat θ become
        non-essential; only essential terms' postings generate candidates,
        which are then fully scored (same fixed term order as the other
        scorers, so results are bit-identical). Docs outside the candidate
        set score strictly below θ (per-term ub is strict for dl>0), so the
        top-k is exact. The scale path for head-term-heavy queries where
        the per-doc Python loop of classic WAND would dominate latency.
        """
        terms = [tp for t in self._query_terms_prefetched(query) if (tp := self._load_term(t))]
        if not terms or k <= 0:
            return []
        theta, binding = self._theta_seed(terms, k)
        essential = self._essential_terms(terms, theta, binding)
        cand = self._union_ids([tp.doc_ids for tp in essential])
        scores = self._score_docs(terms, cand)
        return self._top_k(cand, scores, k)

    _SEED = 256

    def _theta_seed(self, terms: list[_TermPostings], k: int
                    ) -> tuple[float, bool]:
        """Threshold seeding: (θ, binding) where binding means ≥k docs
        PROVABLY score ≥ θ, so pruning below θ is exact (with strict-<
        drop rules everywhere, since local-mode bounds are exact maxima).

        Local mode seeds from the precomputed per-posting scores:
        θ₁ = max over terms of the term's kth-largest single-term score
        (a doc's full score ≥ any of its single-term scores — O(df)
        selects, no scoring), tightened by θ₂ = kth-largest FULL score
        over the rarest term's top-_SEED postings (a gather per term over
        ≤_SEED ids). Serve mode (no precomputed scores) falls back to
        full-scoring the rarest term's postings — the pre-round-5 seed.
        """
        if any(tp.scores is None for tp in terms):
            rarest = min(terms, key=lambda tp: len(tp.doc_ids))
            seed_ids = rarest.doc_ids
            if len(seed_ids) == 0:
                return -math.inf, False
            seed_scores = self._score_docs(terms, seed_ids)
            kk = min(k, len(seed_ids))
            theta = float(np.partition(seed_scores, len(seed_scores) - kk)
                          [len(seed_scores) - kk]) \
                if len(seed_scores) > kk else float(seed_scores.min())
            return theta, len(seed_ids) >= k
        theta, binding = -math.inf, False
        for tp in terms:
            n = len(tp.scores)
            if n >= k:
                t = float(np.partition(tp.scores, n - k)[n - k])
                theta, binding = max(theta, t), True
        rarest = min(terms, key=lambda tp: len(tp.doc_ids))
        n = len(rarest.doc_ids)
        if n and len(terms) > 1:
            m = min(self._SEED, n)
            idx = np.argpartition(rarest.scores, n - m)[n - m:]
            seed_ids = np.sort(rarest.doc_ids[idx])
            totals = self._score_docs(terms, seed_ids)
            if m >= k:
                t2 = float(np.partition(totals, m - k)[m - k])
                theta, binding = max(theta, t2), True
        return theta, binding

    @staticmethod
    def _essential_terms(terms: list[_TermPostings], theta: float,
                         binding: bool) -> list[_TermPostings]:
        """MaxScore split: the longest low-ub suffix with Σ ub < θ is
        non-essential (docs containing only those terms provably score
        below the kth result; STRICT < so an exact-bound tie stays a
        candidate and can win the doc_id tie-break)."""
        order_ub = sorted(range(len(terms)), key=lambda i: -terms[i].ub)
        n_essential = len(terms)
        if binding:
            suffix = 0.0
            for j in range(len(terms) - 1, -1, -1):
                if suffix + terms[order_ub[j]].ub < theta:
                    suffix += terms[order_ub[j]].ub
                    n_essential = j
                else:
                    break
        return [terms[i] for i in order_ub[:max(1, n_essential)]]

    @staticmethod
    def _union_ids(id_arrays: list[np.ndarray]) -> np.ndarray:
        if len(id_arrays) == 1:
            return id_arrays[0]
        return np.unique(np.concatenate(id_arrays))

    def search_block_max(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Vectorized block-max WAND — exact top-k, numpy throughout.

        Block skipping at INTERVAL granularity: merge every term's
        per-block last-doc-id boundaries into one sorted array B (interval
        i = (B[i-1], B[i]]; ~Σdf/128 entries), bound each interval by
        Σ_t block_ub(t, covering block) — one searchsorted per term over
        B, not over the candidate docs — and drop whole posting blocks of
        the essential terms whose every interval is bounded strictly below
        θ. Only surviving blocks' doc ids are unioned and fully scored.
        Because every term's boundaries are in B, no block straddles an
        interval, so the covering block per interval is exact. (The
        on-disk analog of block_last/block_ub is the per-chunk max_tf /
        last_doc_id columns in POSTINGS_SCHEMA.) Dropped docs are bounded
        strictly below θ with ≥k docs provably ≥ θ, so results stay
        bit-identical to the exhaustive scorer (same _score_docs, same
        tie-break)."""
        terms = [tp for t in self._query_terms_prefetched(query) if (tp := self._load_term(t))]
        if not terms or k <= 0:
            return []
        theta, binding = self._theta_seed(terms, k)
        essential = self._essential_terms(terms, theta, binding)
        if binding and any(len(tp.block_ub) > 1 for tp in essential):
            B = np.unique(np.concatenate([tp.block_last for tp in terms]))
            ubi = np.zeros(len(B), dtype=np.float64)
            for tp in terms:
                bi = np.searchsorted(tp.block_last, B, side="left")
                valid = bi < len(tp.block_ub)
                ubi[valid] += tp.block_ub[bi[valid]]
            keep = ubi >= theta
            ckeep = np.concatenate(([0], np.cumsum(keep)))
            parts = []
            for tp in essential:
                # interval span of block j: (prev block_last, block_last]
                hi = np.searchsorted(B, tp.block_last, side="left")
                lo = np.empty_like(hi)
                lo[0] = 0
                lo[1:] = np.searchsorted(B, tp.block_last[:-1], side="right")
                blk_keep = (ckeep[hi + 1] - ckeep[lo]) > 0
                if blk_keep.all():
                    parts.append(tp.doc_ids)
                    continue
                sizes = np.full(len(tp.block_last), BLOCK, dtype=np.int64)
                sizes[-1] = len(tp.doc_ids) - BLOCK * (len(sizes) - 1)
                parts.append(tp.doc_ids[np.repeat(blk_keep, sizes)])
            cand = self._union_ids(parts)
        else:
            cand = self._union_ids([tp.doc_ids for tp in essential])
        scores = self._score_docs(terms, cand)
        return self._top_k(cand, scores, k)

    def _score_docs(self, terms: list[_TermPostings], doc_ids: np.ndarray) -> np.ndarray:
        """Full BM25 scores for a sorted doc-id set, fixed term order."""
        totals = np.zeros(len(doc_ids), dtype=np.float64)
        for tp in terms:
            pos = np.searchsorted(tp.doc_ids, doc_ids)
            pos_c = np.minimum(pos, len(tp.doc_ids) - 1)
            hit = tp.doc_ids[pos_c] == doc_ids
            if hit.any():
                idx = pos_c[hit]
                totals[hit] += self._tf_score(tp, idx)
        return totals

    _MODES = ("maxscore", "wand", "exhaustive")

    def search(self, query: str, k: int = 10, *, mode: str = "maxscore",
               hydrate: bool = True) -> list[dict]:
        if mode == "maxscore":
            hits = self.search_maxscore(query, k)
        elif mode == "wand":
            hits = self.search_wand(query, k)
        else:
            hits = self.search_exhaustive(query, k)
        if not hydrate:
            return [{"doc_id": d, "score": s} for d, s in hits]
        docs = self.reader.docs
        ids = np.asarray([d for d, _ in hits], dtype=np.uint64)
        urls = docs.urls_of(ids) if len(ids) else []
        return [{"doc_id": d, "score": s, "url": str(u)}
                for (d, s), u in zip(hits, urls)]
