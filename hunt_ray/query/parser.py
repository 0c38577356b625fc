"""Hunt query-language parser (recursive descent).

Faithful reimplementation of ``Hunt/Query/Language/Parser.hs``:

- precedence (loosest to tightest): OR → AND / AND NOT → ``++`` / NEAR n /
  FOLLOW n → implicit-AND by whitespace → ``^boost`` → context ``c1,c2:`` →
  primary (parens, ``[a TO b]``, ``!`` case, ``~`` fuzzy, phrase, word)
- bare word → case-insensitive prefix word(s) (``qPrefixPhraseNoCase``,
  Parser.hs:209-215); ``"..."`` → nocase full-word phrase; ``!w`` →
  case-sensitive prefix; ``!"..."`` → case-sensitive full-word phrase;
  ``'w'`` → nocase prefix; ``~w`` → fuzzy
- the reference's FOLLOW parses to *Near* (Parser.hs:125-133 — both
  ``nearOp`` and ``followOp`` return ``qNear d``); we replicate the quirk
- word chars: everything except ``\\ " ' ) ( [ ] ^`` and whitespace
  (notWordChar, Grammar.hs:228-234), with backslash escapes
- reserved words OR/AND/++/NEAR/FOLLOW cannot be bare words (Parser.hs:232-238)
"""

from __future__ import annotations

from . import ast as A

NOT_WORD_CHAR = set('\\"\')([]^ \n\r\t')
RESERVED = {"OR", "AND", "++", "NEAR", "FOLLOW"}


class ParseError(ValueError):
    pass


class _P:
    # recursive descent: each '(' nests ~7 Python frames (measured: 462
    # at depth 64), so unbounded nesting hits RecursionError around 130
    # levels — surface adversarial input as a clean ParseError instead
    # (the server's error channel). 64 keeps >500 frames of headroom for
    # deep callers (server handler, Ray task, pytest plugins) and is far
    # beyond any legitimate query
    MAX_DEPTH = 64

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.depth = 0

    # -- low level ---------------------------------------------------

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_spaces(self) -> None:
        while not self.eof() and self.s[self.i].isspace():
            self.i += 1

    def expect(self, lit: str) -> None:
        if not self.s.startswith(lit, self.i):
            raise ParseError(f"expected {lit!r} at {self.i}: {self.s[self.i:self.i+20]!r}")
        self.i += len(lit)

    def try_(self, fn):
        save, save_depth = self.i, self.depth
        try:
            return fn()
        except ParseError:
            self.i = save
            self.depth = save_depth
            return None

    def spaces1(self) -> None:
        if self.eof() or not self.s[self.i].isspace():
            raise ParseError(f"expected whitespace at {self.i}")
        self.skip_spaces()

    # -- grammar -----------------------------------------------------

    def query(self) -> A.Query:
        self.skip_spaces()
        q = self.or_query()
        self.skip_spaces()
        if not self.eof():
            raise ParseError(f"trailing input at {self.i}: {self.s[self.i:]!r}")
        return q

    def or_query(self) -> A.Query:
        qs = [self.and_query()]
        while True:
            if self.try_(self._or_op) is None:
                break
            qs.append(self.and_query())
        return A.mk_assoc_seq(A.OR, qs)

    def _or_op(self):
        self.skip_spaces()
        self.expect("OR")
        self.spaces1()
        return True

    def and_query(self) -> A.Query:
        res = self.neighbor_query()
        while True:
            op = self.try_(self._and_not_op) or self.try_(self._and_op)
            if op is None:
                break
            q = self.neighbor_query()
            res = A.q_and_not(res, q) if op == "andnot" else A.q_and(res, q)
        return res

    def _and_not_op(self):
        self.skip_spaces()
        self.expect("AND")
        self.skip_spaces()
        self.expect("NOT")
        self.spaces1()
        return "andnot"

    def _and_op(self):
        self.skip_spaces()
        self.expect("AND")
        self.spaces1()
        return "and"

    def neighbor_query(self) -> A.Query:
        res = self.context_seq_query()
        while True:
            op = (self.try_(self._next_op) or self.try_(self._near_op)
                  or self.try_(self._follow_op))
            if op is None:
                break
            q = self.context_seq_query()
            if op == "next":
                res = A.q_next(res, q)
            else:
                res = A.q_near(op[1], res, q)
        return res

    def _next_op(self):
        self.skip_spaces()
        self.expect("++")
        self.spaces1()
        return "next"

    def _near_op(self):
        self.skip_spaces()
        self.expect("NEAR")
        self.skip_spaces()
        d = self._digits()
        self.spaces1()
        return ("near", d)

    def _follow_op(self):
        # reference quirk: FOLLOW parses to qNear (Parser.hs:125-133)
        self.skip_spaces()
        self.expect("FOLLOW")
        self.skip_spaces()
        d = self._digits()
        self.spaces1()
        return ("near", d)

    def _digits(self) -> int:
        j = self.i
        while j < len(self.s) and self.s[j].isdigit():
            j += 1
        if j == self.i:
            raise ParseError(f"expected digits at {self.i}")
        v = int(self.s[self.i:j])
        self.i = j
        return v

    def context_seq_query(self) -> A.Query:
        res = self.boost_query()
        while True:
            q = self.try_(self._spaced_boost_query)
            if q is None:
                break
            res = A.q_and(res, q)
        return res

    def _spaced_boost_query(self):
        self.spaces1()
        return self.boost_query()

    def boost_query(self) -> A.Query:
        q = self.context_query()
        save = self.i
        if self.peek() == "^":
            self.i += 1
            try:
                b = self._float()
                return A.QBoost(b, q)
            except ParseError:
                self.i = save
        return q

    def _float(self) -> float:
        j = self.i
        while j < len(self.s) and self.s[j].isdigit():
            j += 1
        if j == self.i:
            raise ParseError("expected number")
        k = j
        if k < len(self.s) and self.s[k] == ".":
            k += 1
            while k < len(self.s) and self.s[k].isdigit():
                k += 1
            if k == j + 1:
                k = j
        v = float(self.s[self.i:k])
        self.i = k
        return v

    def context_query(self) -> A.Query:
        cs = self.try_(self._context_spec) or []
        q = self.primary_query()
        if cs:
            return A.QContext(tuple(cs), q)
        return q

    def _context_spec(self) -> list[str]:
        cs = [self._context_name()]
        while self.peek() == ",":
            self.i += 1
            cs.append(self._context_name())
        self.skip_spaces()
        self.expect(":")
        self.skip_spaces()
        return cs

    def _context_name(self) -> str:
        self.skip_spaces()
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "_"):
            j += 1
        if j == self.i:
            raise ParseError("expected context name")
        name = self.s[self.i:j]
        self.i = j
        self.skip_spaces()
        return name

    def primary_query(self) -> A.Query:
        c = self.peek()
        if c == "(":
            self.depth += 1
            if self.depth > self.MAX_DEPTH:
                raise ParseError(
                    f"query nesting deeper than {self.MAX_DEPTH} at {self.i}")
            self.i += 1
            self.skip_spaces()
            q = self.or_query()
            self.skip_spaces()
            self.expect(")")
            self.depth -= 1
            return q
        if c == "[":
            return self._range_query()
        if c == "!":
            return self._case_query()
        if c == "~":
            return self._fuzzy_query()
        return self._nocase_query()

    def _range_query(self) -> A.Query:
        self.expect("[")
        self.skip_spaces()
        lo = self._word()
        self.spaces1()
        self.expect("TO")
        self.spaces1()
        hi = self._word()
        self.skip_spaces()
        self.expect("]")
        return A.QRange(lo, hi)

    def _case_query(self) -> A.Query:
        self.expect("!")
        self.skip_spaces()
        if self.peek() == '"':
            # !"..." → case-sensitive full-word phrase (qPhrase)
            return A.q_phrase_words(lambda w: A.QFullWord(A.CASE, w), self._phrase())
        if self.peek() == "'":
            return A.QWord(A.CASE, self._quoted_word())
        return A.QWord(A.CASE, self._word())

    def _fuzzy_query(self) -> A.Query:
        self.expect("~")
        self.skip_spaces()
        if self.peek() == "'":
            return A.set_fuzzy(A.QWord(A.CASE, self._quoted_word()))
        return A.set_fuzzy(A.QWord(A.CASE, self._word()))

    def _nocase_query(self) -> A.Query:
        if self.peek() == '"':
            # "..." → nocase full-word phrase (qPhraseNoCase)
            return A.q_phrase_words(lambda w: A.QFullWord(A.NOCASE, w), self._phrase())
        if self.peek() == "'":
            return A.QWord(A.NOCASE, self._quoted_word())
        # bare word(s) → nocase prefix (qPrefixPhraseNoCase)
        return A.q_phrase_words(lambda w: A.QWord(A.NOCASE, w), self._word())

    def _word(self) -> str:
        out = []
        while not self.eof():
            c = self.s[self.i]
            if c == "\\":
                if self.i + 1 < len(self.s) and self.s[self.i + 1] in NOT_WORD_CHAR:
                    out.append(self.s[self.i + 1])
                    self.i += 2
                    continue
                raise ParseError("bad escape")
            if c in NOT_WORD_CHAR:
                break
            out.append(c)
            self.i += 1
        if not out:
            raise ParseError(f"expected word at {self.i}")
        w = "".join(out)
        if w in RESERVED:
            raise ParseError(f"reserved word {w!r}")
        return w

    def _phrase(self) -> str:
        self.expect('"')
        out = []
        while not self.eof() and self.peek() != '"':
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < len(self.s) and self.s[self.i + 1] == '"':
                out.append('"')
                self.i += 2
                continue
            out.append(c)
            self.i += 1
        self.expect('"')
        if not out:
            raise ParseError("empty phrase")
        return "".join(out)

    def _quoted_word(self) -> str:
        self.expect("'")
        out = []
        while not self.eof() and self.peek() != "'":
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < len(self.s) and self.s[self.i + 1] == "'":
                out.append("'")
                self.i += 2
                continue
            out.append(c)
            self.i += 1
        self.expect("'")
        if not out:
            raise ParseError("empty quoted word")
        return "".join(out)


def parse_query(s: str) -> A.Query:
    return _P(s).query()


# -- rendering (AST → query string, parse_query inverse) ---------------

def _esc_word(w: str) -> str:
    return "".join("\\" + c if c in NOT_WORD_CHAR else c for c in w)


def _esc_phrase(p: str) -> str:
    return p.replace('"', '\\"')


def _fmt_num(x: float) -> str:
    s = f"{x:g}"
    return s


def render_query(q: A.Query) -> str:
    """Render an AST back to query-language text such that
    ``parse_query(render_query(q)) == q`` for parser-producible shapes
    (builder-only shapes like explicit Follow render to the FOLLOW syntax,
    which the reference grammar reads back as Near — its documented quirk,
    Parser.hs:125-133)."""
    if isinstance(q, A.QWord):
        if q.op == A.CASE:
            return "!" + _esc_word(q.word)
        if q.op == A.FUZZY:
            return "~" + _esc_word(q.word)
        return _esc_word(q.word)
    if isinstance(q, A.QFullWord):
        body = '"' + _esc_phrase(q.word) + '"'
        if q.op == A.CASE:
            return "!" + body
        if q.op == A.FUZZY:
            return "~" + body
        return body
    if isinstance(q, A.QPhrase):
        body = '"' + _esc_phrase(q.phrase) + '"'
        if q.op == A.CASE:
            return "!" + body
        if q.op == A.FUZZY:
            return "~" + body
        return body
    if isinstance(q, A.QRange):
        return f"[{_esc_word(q.lower)} TO {_esc_word(q.upper)}]"
    if isinstance(q, A.QContext):
        return ",".join(q.contexts) + ":(" + render_query(q.query) + ")"
    if isinstance(q, A.QBoost):
        return "(" + render_query(q.query) + ")^" + _fmt_num(q.weight)
    if isinstance(q, A.QSeq):
        parts = ["(" + render_query(a) + ")" for a in q.args]
        if q.op == A.AND:
            sep = " AND "
        elif q.op == A.OR:
            sep = " OR "
        elif q.op == A.AND_NOT:
            sep = " AND NOT "
        elif q.op == A.PHRASE:
            sep = " ++ "
        elif isinstance(q.op, A.Near):
            sep = f" NEAR {q.op.d} "
        elif isinstance(q.op, A.Follow):
            sep = f" FOLLOW {q.op.d} "
        else:
            raise ValueError(f"render: unknown op {q.op!r}")
        return sep.join(parts)
    raise ValueError(f"render: unknown query node {q!r}")
