"""The reference-shaped query set (FIXTURES.md §3).

One query per grammar production, modeled on the reference's interpreter and
parser tests (``test/Hunt/InterpreterTests.hs:32-71``,
``test/Hunt/QueryParserTests.hs:90-193``) over the fixture vocabulary.
"""

REFERENCE_QUERIES: list[tuple[str, str, str]] = [
    # (qid-name, kind, query string)
    ("word_nocase_prefix", "word", "brain"),
    ("word_case_prefix", "fullword-case", "!Bra"),
    ("word_case_prefix_lower", "fullword-case", "!bra"),
    ("word_case_exact_missing", "fullword-case", "!Brain"),
    ("fullword_nocase", "nocase", '"brain"'),
    ("fullword_case_phrase", "phrase", '!"take over the world"'),
    ("prefix_nocase", "prefix", "bra"),
    ("quoted_word_prefix", "prefix", "'brain'"),
    ("phrase_nocase", "phrase", '"take over the world"'),
    ("phrase_two", "phrase", '"over the"'),
    ("implicit_and", "and", "take world"),
    ("and_explicit", "and", "take AND world"),
    ("or_query", "or", "brain OR mission"),
    ("andnot", "andnot", "the AND NOT mission"),
    ("context_title", "context", "title:brain"),
    ("context_multi", "multicontext", "title,headlines:brain"),
    ("context_group", "context", "title:(brain OR date)"),
    ("boost", "boost", "brain^2.5 OR mission"),
    ("boosted_and", "boost", "take^4 AND world^8"),
    ("seq_next", "phrase", "take ++ over ++ the ++ world"),
    ("near_query", "near", "take NEAR 2 world"),
    ("follow_query", "follow", "take FOLLOW 3 world"),
    ("date_range", "range", "datecontext:[2013-01-01 TO 2013-06-30]"),
    ("int_range", "range", "intcontext:[40 TO 1024]"),
    # geo 2-dim range over Morton-interleaved keys (InterpreterTests.hs:
    # 543-560 prop_position_range shape)
    ("geo_range", "range", "geocontext:[1-1 TO 60-20]"),
    ("geo_range_tight", "range", "geocontext:[53.5-9.9 TO 53.7-10.1]"),
    # same rectangles through the STR R-tree structure (position-rtree
    # context, index/rtree.py) plus its Z-scan-pathological thin band —
    # the oracle computes membership per key, so identity across both
    # structures is asserted end-to-end
    ("geo_rtree_range", "range", "geortree:[1-1 TO 60-20]"),
    ("geo_rtree_tight", "range", "geortree:[53.5-9.9 TO 53.7-10.1]"),
    ("geo_rtree_band", "range", "geortree:[0.5-9.9 TO 89.5-10.1]"),
    ("fuzzy", "fuzzy", "~brain"),
    ("headlines_lower", "context", "headlines:PINKY"),
    ("or_of_ands", "or", "(take AND world) OR (brain AND mission)"),
    ("andnot_chain", "andnot", "the AND NOT world AND NOT mission"),
    # compound shapes: local ops under context restriction, boosted range,
    # range mixed into boolean algebra
    ("near_in_context", "multicontext", "title,body:(take NEAR 3 world)"),
    ("boosted_range", "boost", "datecontext:[2013-01-01 TO 2014-12-31]^2"),
    ("range_or_word", "or", "intcontext:[40 TO 1024] OR brain"),
]

# completion (scored-words) shapes for the identity suite — evaluated via
# engine.complete vs the oracle's eval_scored_words (Processor.hs:311-383)
REFERENCE_COMPLETIONS: list[tuple[str, str]] = [
    ("complete_prefix", "bra"),
    ("complete_case", "!bra"),
    ("complete_and_filter", "take AND wor"),
    ("complete_or_last", "take OR wor"),
    ("complete_phrase", '"take over th"'),
    ("complete_boost", "bra^2.5"),
    ("complete_context", "title,body:bra"),
    ("complete_range", "intcontext:[40 TO 1024]"),
    ("complete_fuzzy", "~bra"),      # QFuzzy completes as nocase
    ("complete_broad", "p"),
]
