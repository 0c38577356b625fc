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
