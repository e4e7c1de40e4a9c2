"""Surround query parser — span-proximity query language.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj and surround/query/DistanceQuery.java:33 —
the classic "surround" syntax for proximity search:

  ``a AND b``, ``a OR b``, ``a NOT b``   boolean ops (case-insensitive)
  ``a W b`` / ``3W(a, b)``               ordered within-distance
  ``a N b`` / ``4N(a, b, c)``            unordered within-distance
  ``te*``                                prefix term
  ``( )``                                grouping, ``,`` separates
                                         prefix-op arguments

Distance semantics: ``nW``/``nN`` require consecutive operands within
``n`` positions (n = 1 means adjacent), i.e. ``maxgaps = n - 1`` on the
interval source; W is ordered, N unordered. Default distance is 1.

Mapping: distance expressions compile to this repo's interval algebra
(`search/intervals.py` — Ordered/Unordered/Or/Prefix sources), booleans
to BooleanQuery; an interval used where a Query is needed wraps in a
constant-score IntervalQuery, matching the reference's constant-ish
SrndQuery scoring (SimpleTerm.java weights default 1).

Fresh recursive-descent implementation; only the published grammar comes
from the reference.
"""

from __future__ import annotations

import re

from lucene_ray.analysis.analyzers import StandardAnalyzer
from lucene_ray.search import intervals as IV
from lucene_ray.search import query as Q

_TOKEN_RE = re.compile(r"""
    (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) |
    (?P<dist>\d*[wWnN]\b) |
    (?P<word>[^\s(),]+)
""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not"}


class SurroundParseError(ValueError):
    pass


def _lex(text: str):
    out = []
    for m in _TOKEN_RE.finditer(text):
        kind = m.lastgroup
        tok = m.group()
        if kind == "word" and tok.lower() in _KEYWORDS:
            out.append(("kw", tok.lower()))
        elif kind == "dist":
            n = int(tok[:-1]) if len(tok) > 1 else 1
            out.append(("dist", (tok[-1].lower(), max(n, 1))))
        elif kind == "word":
            out.append(("word", tok))
        else:
            out.append((kind, tok))
    return out


def _as_source(node) -> IV.IntervalsSource:
    kind, v = node
    if kind == "src":
        return v
    if kind == "or":
        return IV.Or(tuple(_as_source(p) for p in v))
    raise SurroundParseError(
        "distance operands must be terms, prefixes, OR-groups or nested "
        "distance expressions")


def _as_query(node) -> Q.Query:
    kind, v = node
    if kind == "q":
        return v
    if kind == "or":
        # OR in query context is a scored boolean (SrndBooleanQuery via
        # BasicQueryFactory — review fix: it used to collapse to a
        # constant-score interval Or at the top level)
        return Q.BooleanQuery(should=tuple(_as_query(p) for p in v))
    # a bare term/prefix leaf used in boolean context scores like the
    # ordinary query (SrndTermQuery/SrndPrefixQuery build standard
    # Term/Prefix queries via BasicQueryFactory); composite interval
    # sources stay constant-score interval matches
    if isinstance(v, IV.Term):
        return Q.TermQuery(v.term)
    if isinstance(v, IV.Prefix):
        return Q.PrefixQuery(v.prefix)
    return Q.IntervalQuery(v)


def _dist_source(op: str, n: int, operands) -> IV.IntervalsSource:
    srcs = tuple(_as_source(o) for o in operands)
    if op == "w":
        return IV.Ordered(srcs, maxgaps=n - 1)
    return IV.Unordered(srcs, maxgaps=n - 1)


class _Parser:
    def __init__(self, tokens, analyzer):
        self.toks = tokens
        self.i = 0
        self.an = analyzer

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # or_expr := and_expr (OR and_expr)*
    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == ("kw", "or"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        # defer: inside a distance operand this becomes Intervals.Or,
        # in query context a scored boolean SHOULD
        return ("or", parts)

    # and_expr := not_expr (AND not_expr)*
    def and_expr(self):
        parts = [self.not_expr()]
        while self.peek() == ("kw", "and"):
            self.next()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return ("q", Q.BooleanQuery(must=tuple(_as_query(p) for p in parts)))

    # not_expr := dist_expr (NOT dist_expr)*
    def not_expr(self):
        first = self.dist_expr()
        negs = []
        while self.peek() == ("kw", "not"):
            self.next()
            negs.append(self.dist_expr())
        if not negs:
            return first
        return ("q", Q.BooleanQuery(
            must=(_as_query(first),),
            must_not=tuple(_as_query(n) for n in negs)))

    # dist_expr := primary ((dist) primary)*  (infix W/N, left-assoc)
    def dist_expr(self):
        node = self.primary()
        while self.peek()[0] == "dist":
            _k, (op, n) = self.next()
            right = self.primary()
            node = ("src", _dist_source(op, n, (node, right)))
        return node

    # primary := dist '(' args ')' | '(' or_expr ')' | word
    def primary(self):
        kind, v = self.peek()
        if kind == "dist":
            self.next()
            op, n = v
            if self.peek()[0] != "lparen":
                raise SurroundParseError(f"expected '(' after {n}{op.upper()}")
            self.next()
            args = [self.or_expr()]
            while self.peek()[0] == "comma":
                self.next()
                args.append(self.or_expr())
            if self.peek()[0] != "rparen":
                raise SurroundParseError("unclosed distance-operator args")
            self.next()
            return ("src", _dist_source(op, n, args))
        if kind == "lparen":
            self.next()
            node = self.or_expr()
            if self.peek()[0] != "rparen":
                raise SurroundParseError("unclosed '('")
            self.next()
            return node
        if kind == "word":
            self.next()
            if v.endswith("*") and len(v) > 1:
                return ("src", IV.Prefix(self.an.normalize(v[:-1])))
            return ("src", IV.Term(self.an.normalize(v)))
        raise SurroundParseError(f"unexpected token {v!r}")


def parse_surround(text: str, analyzer=StandardAnalyzer) -> Q.Query:
    """Parse a surround expression into a Query. Raises
    :class:`SurroundParseError` on malformed input (the reference's parser
    also rejects rather than degrading)."""
    toks = _lex(text)
    if not toks:
        raise SurroundParseError("empty surround query")
    p = _Parser(toks, analyzer)
    node = p.or_expr()
    if p.i < len(toks):
        raise SurroundParseError(
            f"trailing input at token {p.i}: {toks[p.i]!r}")
    return _as_query(node)
