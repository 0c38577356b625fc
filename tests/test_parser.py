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


def test_render_roundtrip_reference_queries():
    """parse → render → parse is identity over the whole reference query
    set (render_query is the ClientInterface serialization path)."""
    from hunt_ray.fixtures.queries import REFERENCE_QUERIES
    from hunt_ray.query.parser import parse_query, render_query

    for _name, _kind, qs in REFERENCE_QUERIES:
        ast1 = parse_query(qs)
        ast2 = parse_query(render_query(ast1))
        assert ast2 == ast1, qs


def test_builder_api_roundtrip():
    """Builder-constructed ASTs serialize and parse back identically
    (Follow renders to FOLLOW syntax, read back as Near — the reference
    parser quirk)."""
    from hunt_ray.query import ast as A
    from hunt_ray.query.parser import parse_query, render_query

    qs = [
        A.q_word("Brain"),
        A.q_word_nocase("brain"),
        A.q_full_word("Pinky"),
        A.q_phrase("take over the world"),
        A.q_prefix_phrase("take over"),
        A.q_ands([A.q_word_nocase("a"), A.q_word_nocase("b"),
                  A.q_word_nocase("c")]),
        A.q_ors([A.q_word_nocase("x"), A.q_full_word_nocase("y")]),
        A.q_and_nots([A.q_word_nocase("all"), A.q_word_nocase("bad")]),
        A.q_nears(2, [A.q_word_nocase("take"), A.q_word_nocase("world")]),
        A.set_boost(2.5, A.q_word_nocase("brain")),
        A.set_context("title", A.q_word_nocase("brain")),
        A.set_contexts(["title", "headlines"], A.q_word_nocase("brain")),
        A.q_range("2013-01-01", "2013-06-30"),
        A.set_nocase(A.q_word("MiXeD")),
        A.q_nexts([A.q_word_nocase("take"), A.q_word_nocase("over")]),
    ]
    for q in qs:
        assert parse_query(render_query(q)) == q, q
    # the documented Follow→Near quirk
    f = A.q_follow(3, A.q_word_nocase("a"), A.q_word_nocase("b"))
    assert parse_query(render_query(f)) == A.q_nears(
        3, [A.q_word_nocase("a"), A.q_word_nocase("b")])


def test_builder_matches_parser_shapes():
    from hunt_ray.query import ast as A
    from hunt_ray.query.parser import parse_query

    assert parse_query("brain") == A.q_word_nocase("brain")
    assert parse_query("!Brain") == A.q_word("Brain")
    assert parse_query('"pinky"') == A.q_phrase_nocase("pinky")
    assert parse_query("a AND b") == A.q_ands(
        [A.q_word_nocase("a"), A.q_word_nocase("b")])
    assert parse_query("title:brain") == A.set_context(
        "title", A.q_word_nocase("brain"))


def test_nesting_depth_guard():
    """Adversarial nesting raises a clean ParseError (the server's error
    channel), never RecursionError; nesting at the documented bound
    still parses."""
    import pytest

    from hunt_ray.query.parser import ParseError, parse_query

    ok = "(" * 64 + "the" + ")" * 64
    assert parse_query(ok) is not None
    for depth in (65, 300, 5000):
        bad = "(" * depth + "the" + ")" * depth
        with pytest.raises(ParseError, match="nesting deeper"):
            parse_query(bad)
    # backtracked alternatives must not leak depth: many sequential
    # (shallow) groups stay parseable far past MAX_DEPTH in total count
    wide = " AND ".join(["(the)"] * 500)
    assert parse_query(wide) is not None
