"""Hypothesis property tests — the QuickCheck layer of the reference's
test strategy (SURVEY §5: codec round-trips, normalizer bounds, index-value
algebra vs naive models, parser round-trips)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hunt_ray.common.varbyte import (
    delta_decode,
    delta_encode,
    segmented_delta_decode,
    segmented_delta_encode,
    vb_decode,
    vb_encode,
)

u64 = st.integers(min_value=0, max_value=2**64 - 1)


# ---------------------------------------------------------------- codecs

@given(st.lists(u64, max_size=200))
@settings(max_examples=100, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(arr)).tolist() == vals


@given(st.lists(u64, min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.sort(np.asarray(vals, dtype=np.uint64))
    out = delta_decode(delta_encode(arr))
    assert out.tolist() == arr.tolist()


@given(st.lists(st.lists(u64, max_size=30), max_size=10))
@settings(max_examples=60, deadline=None)
def test_segmented_delta_roundtrip(segments):
    segs = [np.sort(np.asarray(s, dtype=np.uint64)) for s in segments]
    flat = np.concatenate(segs) if segs else np.empty(0, np.uint64)
    offs = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=offs[1:])
    out = segmented_delta_decode(segmented_delta_encode(flat, offs), offs)
    assert out.tolist() == flat.tolist()


# ---------------------------------------------------------------- normalizers

@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_zerofill_order_preserving_and_roundtrip(i):
    from hunt_ray.analyze.normalize import unzerofill_int, zerofill_int

    assert unzerofill_int(zerofill_int(str(i))) == str(i)
    # order-preserving within same sign (the reference's encoding quirk:
    # negatives keep uncomplemented digits, so order only holds for >= 0)
    if 0 <= i < 2**63 - 1:
        assert zerofill_int(str(i)) < zerofill_int(str(i + 1))


@given(st.integers(-89, 89), st.integers(-179, 179))
@settings(max_examples=150, deadline=None)
def test_position_roundtrip_property(lat, lon):
    # prop_norm_pos3 (AnalyzerTests.hs:167-172)
    from hunt_ray.analyze.normalize import denormalize_position, normalize_position

    pos = f"{lat}.0000001-{lon}.0000002"
    assert denormalize_position(normalize_position(pos)) == pos


_coord = st.floats(0.01, 88.99, allow_subnormal=False)


@given(_coord, _coord, _coord, _coord, _coord, _coord)
@settings(max_examples=150, deadline=None)
def test_position_range_property(x1, x2, y1, y2, px, py):
    # prop_position_range shape (InterpreterTests.hs:543-560)
    from hunt_ray.analyze.normalize import normalize_position, position_in_range

    nw = (min(x1, x2), min(y1, y2))
    se = (max(x1, x2), max(y1, y2))
    k = normalize_position(f"{px:.7f}-{py:.7f}")
    lb = normalize_position(f"{nw[0]:.7f}-{nw[1]:.7f}")
    ub = normalize_position(f"{se[0]:.7f}-{se[1]:.7f}")
    in_rect = nw[0] <= px <= se[0] and nw[1] <= py <= se[1]
    # float formatting at 7 decimals can flip strict boundary cases; redo
    # the comparison on the formatted values the codec actually sees
    fpx, fpy = float(f"{px:.7f}"), float(f"{py:.7f}")
    fnw = (float(f"{nw[0]:.7f}"), float(f"{nw[1]:.7f}"))
    fse = (float(f"{se[0]:.7f}"), float(f"{se[1]:.7f}"))
    in_rect = fnw[0] <= fpx <= fse[0] and fnw[1] <= fpy <= fse[1]
    assert position_in_range(k, lb, ub) == in_rect


# ---------------------------------------------------------------- occ algebra

def _mk_occ(model: dict[int, set[int]]):
    from hunt_ray.query.processor import OccSet

    docs = np.asarray(sorted(model), dtype=np.uint64)
    tfs = np.asarray([len(model[int(d)]) for d in docs], dtype=np.int64)
    flat = np.concatenate([np.asarray(sorted(model[int(d)]), dtype=np.uint64)
                           for d in docs]) if len(docs) else np.empty(0, np.uint64)
    offs = np.zeros(len(docs) + 1, np.int64)
    np.cumsum(tfs, out=offs[1:])
    return OccSet(docs, tfs, flat, offs)


def _occ_to_model(o) -> dict[int, set[int]]:
    return {int(d): set(int(p) for p in o.positions_of(i))
            for i, d in enumerate(o.doc_ids)}


occ_model = st.dictionaries(
    st.integers(1, 40),
    st.sets(st.integers(1, 50), min_size=1, max_size=8),
    max_size=12)


@given(occ_model, occ_model, st.integers(-3, 0), st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_positional_intersect_matches_naive_model(ma, mb, lb, ub):
    """The composite-key searchsorted kernel == the reference's IntSet walk
    (Positions.hs:107-114: keep p of A iff some q in B has q-p in [lb,ub])."""
    from hunt_ray.query.processor import Processor

    got = _occ_to_model(Processor._occ_intersect_positional(
        _mk_occ(ma), _mk_occ(mb), lb, ub))
    want: dict[int, set[int]] = {}
    for d in set(ma) & set(mb):
        kept = {p for p in ma[d] if any(lb <= q - p <= ub for q in mb[d])}
        if kept:
            want[d] = kept
    assert got == want


@given(occ_model, occ_model)
@settings(max_examples=80, deadline=None)
def test_occ_intersect_matches_model(ma, mb):
    """intersectOccurrences: common docs, positions united per doc."""
    from hunt_ray.query.processor import Processor

    got = _occ_to_model(Processor._occ_intersect(_mk_occ(ma), _mk_occ(mb)))
    want = {d: ma[d] | mb[d] for d in set(ma) & set(mb)}
    assert got == want


@given(occ_model, occ_model)
@settings(max_examples=80, deadline=None)
def test_occ_difference_matches_model(ma, mb):
    from hunt_ray.query.processor import Processor

    got = _occ_to_model(Processor._occ_difference(_mk_occ(ma), _mk_occ(mb)))
    want = {d: ps for d, ps in ma.items() if d not in mb}
    assert got == want


# ---------------------------------------------------------------- scored docs

def _mk_scored(model: dict[int, float]):
    from hunt_ray.query.processor import ScoredDocs

    docs = np.asarray(sorted(model), dtype=np.uint64)
    return ScoredDocs(docs, np.asarray([model[int(d)] for d in docs],
                                       dtype=np.float32))


scored_model = st.dictionaries(
    st.integers(1, 60),
    st.floats(0.125, 8.0, width=32, allow_subnormal=False), max_size=15)


@given(scored_model, scored_model)
@settings(max_examples=80, deadline=None)
def test_scored_algebra_matches_model(ma, mb):
    """AND=+ on common docs, OR=max outer, ANDNOT drops (SearchResult.hs)."""
    from hunt_ray.query.processor import _difference, _intersect_sum, _union_max

    a, b = _mk_scored(ma), _mk_scored(mb)
    i = _intersect_sum(a, b)
    assert {int(d): s for d, s in zip(i.doc_ids, i.scores)} == \
        {d: np.float32(np.float32(ma[d]) + np.float32(mb[d]))
         for d in set(ma) & set(mb)}
    u = _union_max(a, b)
    assert {int(d): s for d, s in zip(u.doc_ids, u.scores)} == \
        {d: max(np.float32(ma.get(d, -1)), np.float32(mb.get(d, -1)))
         for d in set(ma) | set(mb)}
    n = _difference(a, b)
    assert {int(d): s for d, s in zip(n.doc_ids, n.scores)} == \
        {d: np.float32(ma[d]) for d in ma if d not in mb}


# ---------------------------------------------------------------- parser

_word = st.text(alphabet="abcdefgXYZ012", min_size=1, max_size=6).filter(
    lambda w: w not in ("OR", "AND"))


def _queries(depth: int):
    from hunt_ray.query import ast as A

    leaf = st.one_of(
        _word.map(A.q_word_nocase),
        _word.map(A.q_word),
        _word.map(A.q_full_word),
        _word.map(A.q_full_word_nocase),
    )
    if depth == 0:
        return leaf
    sub = _queries(depth - 1)
    return st.one_of(
        leaf,
        st.lists(sub, min_size=2, max_size=3).map(A.q_ands),
        st.lists(sub, min_size=2, max_size=3).map(A.q_ors),
        st.lists(sub, min_size=2, max_size=2).map(A.q_and_nots),
        st.tuples(st.integers(1, 5), st.lists(sub, min_size=2, max_size=2)).map(
            lambda t: A.q_nears(t[0], t[1])),
        # two-decimal weights: %g renders them losslessly for the parse
        # round-trip (the engine later folds to float32 at eval time)
        st.tuples(st.floats(0.5, 9.0, allow_subnormal=False), sub).map(
            lambda t: A.set_boost(round(t[0], 2), t[1])),
        st.tuples(st.sampled_from(["title", "body"]), sub).map(
            lambda t: A.set_context(t[0], t[1])),
    )


@given(_queries(2))
@settings(max_examples=150, deadline=None)
def test_render_parse_roundtrip_property(q):
    """parse(render(q)) == q over randomly generated builder ASTs."""
    from hunt_ray.query.parser import parse_query, render_query

    assert parse_query(render_query(q)) == q


# ---------------------------------------------------------------- bm25 scorers

@given(
    st.lists(  # per query term: dict of doc -> tf
        st.dictionaries(st.integers(1, 30), st.integers(1, 9),
                        min_size=0, max_size=20),
        min_size=1, max_size=4),
    st.integers(1, 12),
)
@settings(max_examples=120, deadline=None)
def test_bm25_scorers_identical_on_random_postings(term_models, k):
    """exhaustive == MaxScore == vectorized block-max == DAAT WAND on
    arbitrary posting sets (incl. adversarial ties and empty terms)."""
    import math

    from hunt_ray.query.bm25 import BLOCK, BM25Engine, _TermPostings

    all_docs = sorted({d for m in term_models for d in m})
    if not all_docs:
        return
    n_docs = max(all_docs) + 1
    doc_ids_sorted = np.arange(n_docs, dtype=np.uint64)
    rng = np.random.default_rng(7)
    doclen = rng.integers(5, 60, size=n_docs).astype(np.float64)

    eng = BM25Engine.__new__(BM25Engine)
    eng.k1, eng.b = 1.2, 0.75
    eng.N = n_docs
    eng.avgdl = float(doclen.mean())
    eng._doc_id_sorted = doc_ids_sorted
    eng._doclen = doclen
    eng._docs = None
    eng._term_cache = {}

    terms = []
    for ti, model in enumerate(term_models):
        if not model:
            continue
        dids = np.asarray(sorted(model), dtype=np.uint64)
        tfs = np.asarray([model[int(d)] for d in dids], dtype=np.float64)
        df = len(dids)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        max_tf = float(tfs.max())
        ub = idf * (max_tf * 2.2) / (max_tf + 1.2 * 0.25)
        starts = np.arange(0, df, BLOCK)
        block_last = dids[np.minimum(starts + BLOCK - 1, df - 1)]
        bmax = np.maximum.reduceat(tfs, starts)
        block_ub = idf * (bmax * 2.2) / (bmax + 1.2 * 0.25)
        terms.append(_TermPostings(f"t{ti}", idf, ub, dids, tfs,
                                   block_last, block_ub))
    if not terms:
        return
    # the same models with local-mode precomputed per-posting scores and
    # EXACT (tie-capable) ub/block_ub — the strict-< pruning rules must
    # keep every mode identical on adversarial ties in both variants
    terms_exact = []
    for tp in terms:
        starts = np.arange(0, len(tp.doc_ids), BLOCK)
        dl = doclen[tp.doc_ids.astype(np.int64)]
        scores = tp.idf * (tp.tfs * 2.2) / (
            tp.tfs + 1.2 * (0.25 + 0.75 * dl / eng.avgdl))
        terms_exact.append(_TermPostings(
            tp.term, tp.idf, float(scores.max()), tp.doc_ids, tp.tfs,
            tp.block_last, np.maximum.reduceat(scores, starts), scores))

    for variant in (terms, terms_exact):
        eng._term_cache = {tp.term: tp for tp in variant}
        eng._query_terms = lambda q, v=variant: [tp.term for tp in v]

        ex = eng.search_exhaustive("q", k)
        assert eng.search_maxscore("q", k) == ex
        assert eng.search_block_max("q", k) == ex
        assert eng.search_wand_daat("q", k, block_max=True) == ex
        assert eng.search_wand_daat("q", k, block_max=False) == ex


u32 = st.integers(min_value=0, max_value=2**32 - 1)


@given(st.lists(st.tuples(u32, u32), max_size=300),
       u32, u32, u32, u32)
@settings(max_examples=60, deadline=None)
def test_strtree_query_matches_bruteforce(points, a, b, c, d):
    """STR R-tree rectangle query == brute-force membership, any points
    (incl. duplicates/empty), any rectangle (incl. inverted/empty)."""
    import numpy as np

    from hunt_ray.index.rtree import STRTree

    lat = np.asarray([p[0] for p in points], dtype=np.uint32)
    lon = np.asarray([p[1] for p in points], dtype=np.uint32)
    la0, la1, lo0, lo1 = min(a, b), max(a, b), min(c, d), max(c, d)
    got = STRTree(lat, lon).query(la0, la1, lo0, lo1)
    want = np.flatnonzero((lat >= la0) & (lat <= la1)
                          & (lon >= lo0) & (lon <= lo1))
    assert np.array_equal(got, want)


# ---------------------------------------------------------------- curation


@given(st.lists(st.tuples(st.integers(0, 5),          # user
                          st.integers(0, 10_000),     # ts (µs)
                          st.integers(0, 10**6)),     # event_id
                max_size=200),
       st.integers(1, 2_000))
@settings(max_examples=80, deadline=None)
def test_session_kernel_matches_naive_model(rows, gap_us):
    """Vectorized session kernel == a per-user loop model: same session
    count, sizes, bounds, and per-user 1..n numbering, for any event
    stream (duplicate timestamps, ties, empty)."""
    import numpy as np

    from hunt_ray.pipelines.events import session_rows

    uid = np.asarray([r[0] for r in rows], np.int64)
    ts = np.asarray([r[1] for r in rows], np.int64)
    eid = np.asarray([r[2] for r in rows], np.int64)
    got = session_rows(uid, ts, eid, gap_us)

    want = []
    for u in sorted(set(uid.tolist())):
        evs = sorted((t, e) for (uu, t, e) in rows if uu == u)
        seq, start = 0, None
        cur: list[int] = []
        for t, _e in evs:
            if start is None or t - cur[-1] > gap_us:
                if cur:
                    want.append((u, seq, len(cur), cur[0], cur[-1]))
                seq += 1
                cur, start = [t], t
            else:
                cur.append(t)
        if cur:
            want.append((u, seq, len(cur), cur[0], cur[-1]))
    got_rows = list(zip(got["user_id"].tolist(), got["session_seq"].tolist(),
                        got["n_events"].tolist(), got["session_start"].tolist(),
                        got["session_end"].tolist()))
    assert got_rows == want


_word = st.text(alphabet="abc", min_size=1, max_size=2)


@given(st.lists(st.lists(_word, max_size=12), min_size=1, max_size=6),
       st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_word_ngram_hashes_match_tuple_sets(docs, n):
    """Distinct n-gram hash count per doc == the set of token n-tuples
    (hash injectivity on this universe); short docs yield no grams."""
    import pyarrow as pa

    from hunt_ray.pipelines.curate import word_ngram_hashes

    batch = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs]),
    })
    ids, hs = word_ngram_hashes(batch, n)
    for did, h in zip(ids, hs):
        toks = docs[int(did)]
        want = {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        assert len(h) == len(want)


@given(st.lists(st.lists(_word, max_size=15), min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_repetition_batch_matches_counter_model(docs):
    """repetition_batch == a Counter model for token and adjacent-bigram
    stats, for any token stream (docs with <1 token emit no row)."""
    from collections import Counter

    import pyarrow as pa

    from hunt_ray.pipelines.curate import repetition_batch

    batch = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs]),
    })
    out = repetition_batch(batch).to_pandas().set_index("doc_id")
    for did, toks in enumerate(docs):
        if not toks:
            assert did not in out.index
            continue
        row = out.loc[did]
        assert row["n_tokens"] == len(toks)
        assert row["dup_token_ratio"] == round(1 - len(set(toks)) / len(toks), 6)
        bigrams = Counter(zip(toks, toks[1:]))
        if bigrams:
            top = max(bigrams.values())
            assert row["top_bigram_n"] == top
            assert row["top_bigram_frac"] == round(top / sum(bigrams.values()), 6)
        else:
            assert row["top_bigram_n"] == 0
            assert row["top_bigram_frac"] == 0.0


@given(st.lists(st.tuples(st.integers(0, 3),         # user
                          st.integers(0, 50),        # ts
                          st.integers(0, 10**6),     # event_id
                          st.sampled_from(["L", "R", "x"])),
                max_size=120))
@settings(max_examples=80, deadline=None)
def test_asof_kernel_matches_naive_model(rows):
    """Vectorized as-of kernel == a loop model: every L event joins the R
    event with max (ts, event_id) at or before it for the same user;
    unmatched Ls drop. Duplicate timestamps and ties included."""
    import numpy as np

    from hunt_ray.pipelines.events import asof_rows

    uid = np.asarray([r[0] for r in rows], np.int64)
    ts = np.asarray([r[1] for r in rows], np.int64)
    eid = np.asarray([r[2] for r in rows], np.int64)
    et = np.asarray([r[3] for r in rows])
    got = asof_rows(uid, ts, eid, et, "L", "R")
    got_rows = sorted(zip(got["event_id"].tolist(), got["user_id"].tolist(),
                          got["view_event_id"].tolist(), got["lag_us"].tolist()))

    want = []
    for (u, t, e, k) in rows:
        if k != "L":
            continue
        cands = [(rt, re) for (ru, rt, re, rk) in rows
                 if rk == "R" and ru == u and rt <= t]
        if cands:
            bt, be = max(cands)
            want.append((e, u, be, t - bt))
    assert got_rows == sorted(want)
