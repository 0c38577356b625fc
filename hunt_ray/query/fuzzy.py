"""Fuzzy set generation — the Holumbus replacements/swap mechanism.

Faithful reimplementation of ``Hunt/Query/Fuzzy.hs:140-216``: a word is
"fuzzed" by applying language replacement pairs in both directions and
adjacent-character swaps at every position, weighted by position
(``calcWeight = (len-pos)/len``), recursing with exponentially-growing
scores (``sc + sc``) until the threshold cuts everything off; results merge
with per-word score minimum and the original word is removed.

NOTE (parity): the reference's query processor does NOT consume this —
``QFuzzy`` is evaluated as a nocase search (``Processor.hs:606-616``), which
``processor.py`` mirrors. This module exists for API-surface parity
(`Query/Fuzzy.hs` is exported library surface) and is tested standalone.

Arithmetic is float32 like Haskell's ``Float``-typed ``FuzzyScore``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

F32 = np.float32

Replacement = tuple[tuple[str, str], float]

# englishReplacements (Fuzzy.hs:91-110)
ENGLISH_REPLACEMENTS: list[Replacement] = [
    (("l", "ll"), 0.2), (("t", "tt"), 0.2), (("r", "rr"), 0.2),
    (("e", "ee"), 0.2), (("o", "oo"), 0.2), (("s", "ss"), 0.2),
    (("g", "ck"), 0.4), (("k", "ck"), 0.4), (("ea", "ee"), 0.4),
    (("ou", "oo"), 0.4), (("ou", "au"), 0.4), (("ou", "ow"), 0.4),
    (("s", "c"), 0.6), (("uy", "ye"), 0.6), (("y", "ey"), 0.6),
    (("kn", "n"), 0.6),
]

# germanReplacements (Fuzzy.hs:113-134)
GERMAN_REPLACEMENTS: list[Replacement] = [
    (("l", "ll"), 0.2), (("t", "tt"), 0.2), (("n", "nn"), 0.2),
    (("r", "rr"), 0.2), (("i", "ie"), 0.2), (("ei", "ie"), 0.2),
    (("k", "ck"), 0.2),
    (("d", "t"), 0.4), (("b", "p"), 0.4), (("g", "k"), 0.4),
    (("g", "ch"), 0.4), (("c", "k"), 0.4), (("s", "z"), 0.4),
    (("u", "ou"), 0.4),
    (("ü", "ue"), 0.1), (("ä", "ae"), 0.1), (("ö", "oe"), 0.1),
    (("ß", "ss"), 0.1),
]


@dataclass
class FuzzyConfig:
    """FuzzyConfig (Fuzzy.hs:69-84); default = replacements+swaps,
    threshold 1.0, english table."""

    apply_replacements: bool = True
    apply_swappings: bool = True
    max_fuzziness: float = 1.0
    custom_replacements: list[Replacement] = field(
        default_factory=lambda: list(ENGLISH_REPLACEMENTS))


def _replace_first(xs: str, ys: str, zs: str) -> str:
    """replaceFirst (Fuzzy.hs:203-214): replace a leading ``xs`` of ``zs``
    with ``ys``; empty pattern prepends, empty subject yields empty."""
    if xs == "":
        return ys + zs
    if zs == "":
        return ""
    if zs.startswith(xs):
        return ys + zs[len(xs):]
    return zs


def _calc_weight(pos: int, length: int) -> np.float32:
    """calcWeight (Fuzzy.hs:196-200): (len - pos) / len, float32."""
    return F32((F32(length) - F32(pos)) / F32(length))


def _apply_fuzz(f, sc: np.float32, s: str) -> dict[str, np.float32]:
    """applyFuzz (Fuzzy.hs:168-176): f over every (prefix, suffix) split
    with a positional weight; per-word min."""
    out: dict[str, np.float32] = {}
    n = len(s)
    for i in range(n):  # prefixes s[:0..n-1] with suffixes s[0..n-1:]
        for fuzzed, score in f(s[:i], s[i:]):
            v = F32(sc + F32(score) * _calc_weight(i, n))
            prev = out.get(fuzzed)
            if prev is None or v < prev:
                out[fuzzed] = v
    return out


def _mk_replace(rs: list[Replacement], r: Replacement):
    """replace (Fuzzy.hs:180-186): both directions, score normalized by the
    table's max raw score."""
    (r1, r2), s = r
    max_s = F32(max(sc for _, sc in rs))
    score = F32(F32(s) / max_s)

    def go(prefix: str, suffix: str) -> list[tuple[str, np.float32]]:
        res = []
        for tok, sub in ((r1, r2), (r2, r1)):
            replaced = _replace_first(tok, sub, suffix)
            if replaced != suffix:
                res.append((prefix + replaced, score))
        return res

    return go


def _swap(prefix: str, s: str) -> list[tuple[str, np.float32]]:
    """swap (Fuzzy.hs:190-194): transpose the suffix's first two chars,
    raw score 1.0."""
    if len(s) < 2:
        return []
    return [(prefix + s[1] + s[0] + s[2:], F32(1.0))]


def _fuzz_internal(cfg: FuzzyConfig, sc: np.float32, s: str) -> dict[str, np.float32]:
    out: dict[str, np.float32] = {}
    if cfg.apply_replacements:
        rs = cfg.custom_replacements
        for r in rs:
            for k, v in _apply_fuzz(_mk_replace(rs, r), sc, s).items():
                prev = out.get(k)
                if prev is None or v < prev:
                    out[k] = v
    if cfg.apply_swappings:
        for k, v in _apply_fuzz(_swap, sc, s).items():
            prev = out.get(k)
            if prev is None or v < prev:
                out[k] = v
    return out


def _fuzz_limit(cfg: FuzzyConfig, sc: np.float32, s: str) -> dict[str, np.float32]:
    th = F32(cfg.max_fuzziness)
    if sc > th:
        return {}
    return {k: v for k, v in _fuzz_internal(cfg, sc, s).items() if v <= th}


def _fuzz_rec(cfg: FuzzyConfig, fs: dict[str, np.float32]) -> dict[str, np.float32]:
    """fuzz' (Fuzzy.hs:142-147): recurse with doubled scores, min-union."""
    more: dict[str, np.float32] = {}
    for sm, sc in fs.items():
        for k, v in _fuzz_limit(cfg, F32(sc + sc), sm).items():
            prev = more.get(k)
            if prev is None or v < prev:
                more[k] = v
    if not more:
        return fs
    merged = _fuzz_rec(cfg, more)
    for k, v in fs.items():
        prev = merged.get(k)
        if prev is None or v < prev:
            merged[k] = v
    return merged


def fuzz(word: str, cfg: FuzzyConfig | None = None) -> dict[str, np.float32]:
    """fuzz (Fuzzy.hs:138-147): the fuzzy set of a word (word itself
    removed), score = accumulated fuzziness ≤ cfg.max_fuzziness."""
    cfg = cfg or FuzzyConfig()
    out = _fuzz_rec(cfg, _fuzz_limit(cfg, F32(0.0), word))
    out.pop(word, None)
    return out


def to_list(fs: dict[str, np.float32]) -> list[tuple[str, float]]:
    """toList (Fuzzy.hs:218-219): ascending by score (stable, key-sorted
    ties like Haskell's Map.toList + stable sortBy)."""
    return [(w, float(s)) for w, s in sorted(fs.items(),
                                             key=lambda kv: (kv[1], kv[0]))]
