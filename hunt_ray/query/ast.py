"""Query AST, mirroring Hunt's query grammar.

Reference: ``Hunt/Query/Language/Grammar.hs:49-78`` (Query/BinOp/
TextSearchType) and the smart constructors in ``Language/Builder.hs`` —
n-ary ``QSeq`` with assoc-collection for And/Or/Phrase/Near/Follow and
left-assoc for AndNot (Builder.hs:157-185).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

# TextSearchType: QCase | QNoCase | QFuzzy (Grammar.hs:62-67)
CASE = "case"
NOCASE = "nocase"
FUZZY = "fuzzy"

# BinOp (Grammar.hs:70-78)
AND = "and"
OR = "or"
AND_NOT = "and not"
PHRASE = "phrase"


@dataclass(frozen=True)
class QWord:          # prefix search for a word
    op: str
    word: str


@dataclass(frozen=True)
class QFullWord:      # search for a complete word
    op: str
    word: str


@dataclass(frozen=True)
class QPhrase:        # transformed to QFullWord/QSeq Phrase at eval time
    op: str
    phrase: str


@dataclass(frozen=True)
class QContext:
    contexts: tuple[str, ...]
    query: "Query"


@dataclass(frozen=True)
class QBoost:
    weight: float
    query: "Query"


@dataclass(frozen=True)
class QRange:
    lower: str
    upper: str


@dataclass(frozen=True)
class Follow:
    d: int

    def __str__(self) -> str:
        return f"follow {self.d}"


@dataclass(frozen=True)
class Near:
    d: int

    def __str__(self) -> str:
        return f"near {self.d}"


BinOp = Union[str, Follow, Near]


@dataclass(frozen=True)
class QSeq:
    op: BinOp
    args: tuple["Query", ...]


Query = Union[QWord, QFullWord, QPhrase, QContext, QBoost, QRange, QSeq]


def _collect_assoc(op: BinOp, qs: list[Query]) -> list[Query]:
    """collectAssocs (Builder.hs:157-165): flatten same-op nested seqs."""
    out: list[Query] = []
    for q in qs:
        if isinstance(q, QSeq) and q.op == op:
            out.extend(q.args)
        else:
            out.append(q)
    return out


def _rem_single(q: Query) -> Query:
    if isinstance(q, QSeq) and len(q.args) == 1:
        return q.args[0]
    return q


def mk_assoc_seq(op: BinOp, qs: list[Query]) -> Query:
    return _rem_single(QSeq(op, tuple(_collect_assoc(op, qs))))


def mk_left_assoc_seq(op: BinOp, qs: list[Query]) -> Query:
    """mkLeftAssocSeq (Builder.hs:171-179) — AndNot is left-assoc."""
    if qs and isinstance(qs[0], QSeq) and qs[0].op == op:
        qs = list(qs[0].args) + qs[1:]
    return _rem_single(QSeq(op, tuple(qs)))


def q_and(q1: Query, q2: Query) -> Query:
    return mk_assoc_seq(AND, [q1, q2])


def q_or(q1: Query, q2: Query) -> Query:
    return mk_assoc_seq(OR, [q1, q2])


def q_and_not(q1: Query, q2: Query) -> Query:
    return mk_left_assoc_seq(AND_NOT, [q1, q2])


def q_next(q1: Query, q2: Query) -> Query:
    return mk_assoc_seq(PHRASE, [q1, q2])


def q_near(d: int, q1: Query, q2: Query) -> Query:
    return mk_assoc_seq(Near(d), [q1, q2])


def q_phrase_words(ctor, text: str) -> Query:
    """qPhrase' (Builder.hs:69-73): split on spaces; 1 word → plain query,
    else QSeq Phrase of per-word queries."""
    ws = text.split()
    if len(ws) == 1:
        return ctor(ws[0])
    return mk_assoc_seq(PHRASE, [ctor(w) for w in ws])


def is_local_cx_op(op: BinOp) -> bool:
    """Phrase/Follow/Near run per-context-local (Processor.hs:503-507)."""
    return op == PHRASE or isinstance(op, (Follow, Near))


def optimize(q: Query) -> Query:
    """Minor query optimizations (Grammar.hs:236-266): prefix-subsumption
    rewrites on And/Or of two QWords. NOTE (as in the reference): this can
    affect the ranking, so it is opt-in.

    The reference matches on binary QBinary nodes; our parser builds n-ary
    QSeq, so the rewrite applies to 2-argument seqs (the same shapes the
    reference parser could produce before flattening).
    """
    if isinstance(q, QSeq) and len(q.args) == 2 and q.op in (AND, OR):
        a, b = q.args
        if (isinstance(a, QWord) and isinstance(b, QWord)
                and a.op == b.op and a.op in (CASE, NOCASE)):
            w1, w2 = a.word, b.word
            if a.op == NOCASE:
                w1c, w2c = w1.lower(), w2.lower()
            else:
                w1c, w2c = w1, w2
            if q.op == AND:
                # the longer word's prefix search subsumes the intersection
                if w2c.startswith(w1c):
                    return b
                if w1c.startswith(w2c):
                    return a
            else:
                # the shorter word's prefix search subsumes the union
                if w2c.startswith(w1c):
                    return a
                if w1c.startswith(w2c):
                    return b
        return QSeq(q.op, tuple(optimize(x) for x in q.args))
    if isinstance(q, QSeq):
        return QSeq(q.op, tuple(optimize(x) for x in q.args))
    if isinstance(q, QContext):
        return QContext(q.contexts, optimize(q.query))
    if isinstance(q, QBoost):
        return QBoost(q.weight, optimize(q.query))
    return q


def set_fuzzy(q: Query) -> Query:
    """setFuzzySearch (Builder.hs:200-204)."""
    if isinstance(q, QWord):
        return QWord(FUZZY, q.word)
    if isinstance(q, QFullWord):
        return QFullWord(FUZZY, q.word)
    if isinstance(q, QPhrase):
        return QPhrase(FUZZY, q.phrase)
    return q


# -- the remaining Builder.hs client surface (Builder.hs:47-230) ------

def q_word(w: str) -> Query:
    """qWord: case-sensitive prefix search."""
    return QWord(CASE, w)


def q_word_nocase(w: str) -> Query:
    return QWord(NOCASE, w)


def q_full_word(w: str) -> Query:
    return QFullWord(CASE, w)


def q_full_word_nocase(w: str) -> Query:
    return QFullWord(NOCASE, w)


def q_phrase(text: str) -> Query:
    """qPhrase: exact case-sensitive word sequence."""
    return q_phrase_words(q_full_word, text)


def q_phrase_nocase(text: str) -> Query:
    return q_phrase_words(q_full_word_nocase, text)


def q_prefix_phrase(text: str) -> Query:
    """qPrefixPhrase (the reference maps both variants to nocase words)."""
    return q_phrase_words(q_word_nocase, text)


def q_range(lb: str, ub: str) -> Query:
    return QRange(lb, ub)


def q_context(cx: str, w: str) -> Query:
    """qContext: case-sensitive word search within one context."""
    return QContext((cx,), QWord(CASE, w))


def q_ands(qs: list[Query]) -> Query:
    return mk_assoc_seq(AND, list(qs))


def q_ors(qs: list[Query]) -> Query:
    return mk_assoc_seq(OR, list(qs))


def q_and_nots(qs: list[Query]) -> Query:
    return mk_left_assoc_seq(AND_NOT, list(qs))


def q_nexts(qs: list[Query]) -> Query:
    return mk_assoc_seq(PHRASE, list(qs))


def q_follow(d: int, q1: Query, q2: Query) -> Query:
    return mk_assoc_seq(Follow(d), [q1, q2])


def q_follows(d: int, qs: list[Query]) -> Query:
    return mk_assoc_seq(Follow(d), list(qs))


def q_nears(d: int, qs: list[Query]) -> Query:
    return mk_assoc_seq(Near(d), list(qs))


def set_nocase(q: Query) -> Query:
    """setNoCaseSearch (Builder.hs:192-196)."""
    if isinstance(q, QWord):
        return QWord(NOCASE, q.word)
    if isinstance(q, QFullWord):
        return QFullWord(NOCASE, q.word)
    if isinstance(q, QPhrase):
        return QPhrase(NOCASE, q.phrase)
    return q


def set_contexts(cxs: list[str], q: Query) -> Query:
    """setContexts (Builder.hs:208-209)."""
    return QContext(tuple(cxs), q)


def set_context(cx: str, q: Query) -> Query:
    return set_contexts([cx], q)


def set_boost(w: float, q: Query) -> Query:
    """setBoost (Builder.hs:226-227)."""
    return QBoost(w, q)
