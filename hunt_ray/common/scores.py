"""Score arithmetic matching Hunt's ``Score`` newtype.

Hunt's Score is a Haskell ``Float`` (float32!) with 0.0 meaning "unset";
its Monoid is max-with-0-identity (``Scoring/Score.hs:28-71``). Rank
identity with the reference requires float32 arithmetic throughout, so all
score kernels here operate on ``np.float32``.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32

NO_SCORE = F32(0.0)
DEF_SCORE = F32(1.0)


def mk_score(x: float) -> np.float32:
    """mkScore: clamp non-positive to noScore (Score.hs:39-42)."""
    x32 = F32(x)
    return x32 if x32 > 0.0 else NO_SCORE


def to_def_score(x: float) -> np.float32:
    """0.0 ("unset") becomes the default score 1.0 (Score.hs:50-52)."""
    x32 = F32(x)
    return DEF_SCORE if x32 == 0.0 else x32


def score_mappend(x: np.ndarray | np.float32, y: np.ndarray | np.float32):
    """Score Monoid: max, with 0.0 as identity (Score.hs:66-71).

    Since scores are never negative, plain ``max`` implements this exactly.
    """
    return np.maximum(x, y)


def similar(searched: str, found: str) -> np.float32:
    """Prefix-match quality heuristic (Scoring/Keys.hs:43-55).

    exact == 1.0; same length (e.g. case-insensitive hit) == 0.75;
    proper prefix == 0.5 * len(searched)/len(found); else 0.
    """
    if searched == found:
        return F32(1.0)
    ls, lf = len(searched), len(found)
    if ls == lf:
        return F32(0.75)
    if ls < lf:
        return F32(F32(0.5) * (F32(ls) / F32(lf)))
    return NO_SCORE


def similar_vec(searched: str, found: "list[str] | np.ndarray") -> np.ndarray:
    """Vectorized ``similar`` over an array of found words."""
    import numpy as np

    found = np.asarray(found, dtype=object)
    ls = len(searched)
    lf = np.fromiter((len(w) for w in found), dtype=np.int64, count=len(found))
    out = np.full(len(found), NO_SCORE, dtype=F32)
    eq = found == searched
    out[eq] = F32(1.0)
    same_len = (~eq) & (lf == ls)
    out[same_len] = F32(0.75)
    pref = (~eq) & (lf > ls)
    out[pref] = (F32(0.5) * (F32(ls) / lf[pref].astype(F32))).astype(F32)
    return out
