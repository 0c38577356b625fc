"""Fuzzy set generation (Query/Fuzzy.hs:140-216) — hand-derived goldens on
short words plus structural properties.

The reference's query processor evaluates QFuzzy as nocase
(Processor.hs:606-616, mirrored in processor.py); this module is the
library-surface parity of the `fuzz` generator itself.
"""

from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.query.fuzzy import (
    ENGLISH_REPLACEMENTS,
    GERMAN_REPLACEMENTS,
    FuzzyConfig,
    fuzz,
    to_list,
)

F32 = np.float32


def test_swap_only_adjacent_transpositions():
    cfg = FuzzyConfig(apply_replacements=False, apply_swappings=True,
                      max_fuzziness=1.0)
    fs = fuzz("abc", cfg)
    # position 0 swap: "bac" score 1.0·(3-0)/3 = 1.0
    assert fs["bac"] == F32(1.0)
    # position 1 swap: "acb" score 1.0·(3-1)/3 = 2/3; its recursion (sc
    # doubled to 4/3 > 1) adds nothing
    assert fs["acb"] == F32(F32(2.0) / F32(3.0))
    assert "abc" not in fs  # original removed (M.delete s)


def test_replacement_golden_it():
    """fuzz("it") level-0 by hand: swap → "ti"@1.0; ("t","tt")∈en (raw 0.2,
    normalized by max 0.6 → 1/3) applied at suffix "t" (weight 1/2) →
    "itt"@1/6. Deeper recursion only adds new words at higher scores."""
    fs = fuzz("it", FuzzyConfig())
    assert fs["ti"] == F32(1.0)
    assert fs["itt"] == F32(F32(F32(0.2) / F32(0.6)) * F32(0.5))
    assert "it" not in fs


def test_scores_bounded_and_positive():
    for w in ("search", "brain", "kuchen"):
        fs = fuzz(w, FuzzyConfig())
        assert fs, w
        for k, v in fs.items():
            assert 0.0 < float(v) <= 1.0, (w, k, v)
            assert k != w


def test_replacements_bidirectional():
    """(("kn","n"),0.6): "night" ↔ "knight" both directions."""
    cfg = FuzzyConfig(apply_swappings=False)
    fs1 = fuzz("night", cfg)
    assert "knight" in fs1
    fs2 = fuzz("knight", cfg)
    assert "night" in fs2
    # score: raw 0.6 / max 0.6 = 1.0, at position 0 weight 1.0 → 1.0
    assert fs1["knight"] == F32(1.0)


def test_german_umlaut_replacements():
    cfg = FuzzyConfig(apply_swappings=False,
                      custom_replacements=list(GERMAN_REPLACEMENTS))
    fs = fuzz("fußball", cfg)
    assert "fussball" in fs
    # raw 0.1 / max 0.4 = 0.25, position 2 of 7 → weight 5/7
    assert fs["fussball"] == F32(F32(F32(0.1) / F32(0.4)) * F32(F32(5) / F32(7)))


def test_threshold_cuts():
    cfg_tight = FuzzyConfig(max_fuzziness=0.3)
    cfg_loose = FuzzyConfig(max_fuzziness=1.0)
    tight = fuzz("missing", cfg_tight)
    loose = fuzz("missing", cfg_loose)
    assert set(tight) <= set(loose)
    assert all(float(v) <= 0.3 for v in tight.values())


def test_to_list_sorted_by_score_then_word():
    fs = fuzz("letter", FuzzyConfig())
    lst = to_list(fs)
    scores = [s for _, s in lst]
    assert scores == sorted(scores)
    for (w1, s1), (w2, s2) in zip(lst, lst[1:]):
        if s1 == s2:
            assert w1 < w2


def test_min_score_kept_on_duplicate_generation():
    """A word reachable along several paths keeps the minimum score
    (M.unionWith min throughout)."""
    cfg = FuzzyConfig()
    fs = fuzz("ss", cfg)
    # ("s","ss") raw 0.2→1/3: at pos 0, "ss"→"s" gives "s"@1/3; also
    # ("s","c"): "cs"@1.0, "sc"@0.5 …
    assert fs["s"] == F32(F32(0.2) / F32(0.6))


@pytest.mark.parametrize("table", [ENGLISH_REPLACEMENTS, GERMAN_REPLACEMENTS])
def test_tables_match_reference_counts(table):
    # en: 16 pairs (Fuzzy.hs:91-110); de: 18 pairs (113-134)
    assert len(table) in (16, 18)


# ------------------------------------------------- fuzzy_mode="expand"
# (extension beyond the reference: ProcessConfig(fuzzy_mode="expand") ORs
# the fuzz set into QFuzzy evaluation; default stays the reference's
# nocase quirk — see ProcessConfig docstring)


@pytest.fixture(scope="module")
def fuzzy_engines(ray_session, pages_small, tmp_path_factory):
    from hunt_ray.analyze.schema import fixture_schema
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine
    from hunt_ray.query.processor import ProcessConfig

    idx = str(tmp_path_factory.mktemp("fuzzidx"))
    build_index(pages_small, idx,
                BuildConfig(schema=fixture_schema(), num_partitions=2,
                            salt_buckets=2, batch_size=64,
                            analyzer_concurrency=2))
    default = SearchEngine(idx)
    expand = SearchEngine(idx, ProcessConfig(word_limit=0, doc_limit=0,
                                             fuzzy_mode="expand"))
    return default, expand


def _urls_scores(engine, q):
    return {h.url: h.score for h in engine.search(q, limit=0).result}


def test_fuzzy_expand_non_fuzzy_queries_identical(fuzzy_engines):
    """Parity: the expand mode only touches QFuzzy; every other query
    evaluates bit-identically to the default (reference) config."""
    default, expand = fuzzy_engines
    for q in ("brain", "!mission", "title:pinky", "brain OR mission",
              '"take over the world"'):
        assert _urls_scores(default, q) == _urls_scores(expand, q), q


def test_fuzzy_expand_is_superset_of_nocase(fuzzy_engines):
    """Expansion only ADDS entries (union-max), so the expanded doc set
    contains the nocase doc set and no common doc's score decreases."""
    default, expand = fuzzy_engines
    for q in ("~brain", "~mission", "~take"):
        d, e = _urls_scores(default, q), _urls_scores(expand, q)
        assert set(d) <= set(e), q
        for url, sc in d.items():
            assert e[url] >= sc, (q, url)


def test_fuzzy_expand_recovers_misspelling(fuzzy_engines):
    """'brrain' is not in the corpus: default (reference quirk) finds
    nothing, expand finds exactly the '~brain' docs via the rr→r
    replacement (weight 1/(1+0.2778…) < 1 ⇒ strictly lower scores)."""
    default, expand = fuzzy_engines
    assert _urls_scores(default, "~brrain") == {}
    got = _urls_scores(expand, "~brrain")
    want = _urls_scores(default, "~brain")
    assert set(got) == set(want) and got
    for url, sc in got.items():
        assert 0 < sc < want[url]


def test_fuzzy_expand_serve_prefetch_covers_variants(fuzzy_engines):
    """collect_lookups (the serve-mode batched prefetch) must include the
    expansion keys, or remote evaluation would re-issue per-key RPCs."""
    from hunt_ray.query.parser import parse_query

    default, expand = fuzzy_engines
    q = parse_query("~brrain")
    searches_d, _ = default.processor.collect_lookups(q)
    searches_e, _ = expand.processor.collect_lookups(q)
    assert searches_d < searches_e
    assert any(key == "brain" for (_op, _cx, key) in searches_e)
