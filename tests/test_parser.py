from __future__ import annotations

import pytest

from hunt_ray.query import ast as A
from hunt_ray.query.parser import ParseError, parse_query


def test_bare_word_is_nocase_prefix():
    assert parse_query("foo") == A.QWord(A.NOCASE, "foo")


def test_bare_words_implicit_and():
    q = parse_query("foo bar")
    assert q == A.QSeq(A.AND, (A.QWord(A.NOCASE, "foo"), A.QWord(A.NOCASE, "bar")))


def test_case_query():
    assert parse_query("!Car") == A.QWord(A.CASE, "Car")


def test_quoted_word():
    assert parse_query("'Car'") == A.QWord(A.NOCASE, "Car")


def test_phrase_single_word():
    assert parse_query('"exact"') == A.QFullWord(A.NOCASE, "exact")


def test_phrase_multi_word():
    q = parse_query('"take over"')
    assert q == A.QSeq(A.PHRASE, (A.QFullWord(A.NOCASE, "take"),
                                  A.QFullWord(A.NOCASE, "over")))


def test_case_phrase():
    q = parse_query('!"Take Over"')
    assert q == A.QSeq(A.PHRASE, (A.QFullWord(A.CASE, "Take"),
                                  A.QFullWord(A.CASE, "Over")))


def test_fuzzy():
    assert parse_query("~car") == A.QWord(A.FUZZY, "car")


def test_or_and_precedence():
    q = parse_query("a OR b AND c")
    assert isinstance(q, A.QSeq) and q.op == A.OR
    assert q.args[1] == A.QSeq(A.AND, (A.QWord(A.NOCASE, "b"), A.QWord(A.NOCASE, "c")))


def test_and_not():
    q = parse_query("a AND NOT b")
    assert q == A.QSeq(A.AND_NOT, (A.QWord(A.NOCASE, "a"), A.QWord(A.NOCASE, "b")))


def test_andnot_left_assoc_flatten():
    q = parse_query("a AND NOT b AND NOT c")
    assert q.op == A.AND_NOT and len(q.args) == 3


def test_or_prefix_word_not_reserved():
    # "ORganism" must parse as a word (QueryParserTests.hs "OR-prefix words")
    assert parse_query("ORganism") == A.QWord(A.NOCASE, "ORganism")


def test_context_query():
    q = parse_query("who:Rudi")
    assert q == A.QContext(("who",), A.QWord(A.NOCASE, "Rudi"))


def test_multi_context():
    q = parse_query("content,who,title:Rudi")
    assert q == A.QContext(("content", "who", "title"), A.QWord(A.NOCASE, "Rudi"))


def test_context_parens():
    q = parse_query("who:(Rudi Voeller)")
    assert q == A.QContext(("who",), A.QSeq(A.AND, (A.QWord(A.NOCASE, "Rudi"),
                                                    A.QWord(A.NOCASE, "Voeller"))))


def test_range():
    assert parse_query("[2014-02-10 TO 2014-02-16]") == A.QRange("2014-02-10", "2014-02-16")


def test_boost():
    q = parse_query("toList^1.5")
    assert q == A.QBoost(1.5, A.QWord(A.NOCASE, "toList"))


def test_seq_next():
    q = parse_query("a ++ b ++ c")
    assert q.op == A.PHRASE and len(q.args) == 3


def test_near():
    q = parse_query("a NEAR 2 b")
    assert q == A.QSeq(A.Near(2), (A.QWord(A.NOCASE, "a"), A.QWord(A.NOCASE, "b")))


def test_follow_parses_to_near():
    # reference quirk: FOLLOW builds qNear (Parser.hs:125-133)
    assert parse_query("a FOLLOW 3 b") == parse_query("a NEAR 3 b")


def test_escape():
    # the reference re-splits on spaces via qPrefixPhraseNoCase
    # (Builder.hs:69-73,96-97), so an escaped space yields a phrase-seq
    q = parse_query(r"a\ b")
    assert q == A.QSeq(A.PHRASE, (A.QWord(A.NOCASE, "a"), A.QWord(A.NOCASE, "b")))
    assert parse_query(r"a\)b") == A.QWord(A.NOCASE, "a)b")


def test_reserved_word_rejected():
    with pytest.raises(ParseError):
        parse_query("AND")


def test_reference_query_set_parses():
    from hunt_ray.fixtures.queries import REFERENCE_QUERIES

    for _name, _kind, qs in REFERENCE_QUERIES:
        parse_query(qs)  # must not raise


def test_optimize_prefix_subsumption():
    from hunt_ray.query.ast import optimize

    # AND of nested prefixes → longer word (Grammar.hs:240-247)
    q = parse_query("fork forks")
    assert optimize(q) == A.QWord(A.NOCASE, "forks")
    # OR of nested prefixes → shorter word (Grammar.hs:250-257)
    q = parse_query("fork OR forks")
    assert optimize(q) == A.QWord(A.NOCASE, "fork")
    # unrelated words unchanged
    q = parse_query("fork spoon")
    assert optimize(q) == q
    # recursion through boost/context
    q = parse_query("title:(fork forks)")
    assert optimize(q) == A.QContext(("title",), A.QWord(A.NOCASE, "forks"))
