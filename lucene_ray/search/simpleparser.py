"""SimpleQueryParser — the lenient end-user syntax.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java:33-105 — a parser "for human-entered queries" that
NEVER throws: any malformed fragment degrades to literal terms. Operators:

  ``+``      AND (binds tighter than OR)
  ``|``      OR (also the implicit operator between adjacent clauses,
             SimpleQueryParser.java:62 ``defaultOperator = SHOULD``)
  ``-``      NOT (prefix on a clause)
  ``"..."``  phrase, optional ``~N`` slop suffix
  ``term*``  prefix query
  ``term~N`` fuzzy query
  ``( )``    grouping
  ``\\x``    escape

Multi-field: like the reference's ``weights`` map (SimpleQueryParser.java:87
``newDefaultQuery`` — one SHOULD clause per field, boosted), pass
``field_weights={field_or_None: boost}`` and every leaf becomes a
disjunction across those fields.

This is a fresh recursive-descent implementation over the repo's Query
dataclasses; only the published operator semantics come from the reference.
"""

from __future__ import annotations

from lucene_ray.analysis.analyzers import StandardAnalyzer
from lucene_ray.search import query as Q

# term-break chars: '-' is deliberately absent — it only acts as the NOT
# operator at a clause boundary (see _lex), never mid-word ("wi-fi")
_SPECIAL = set('+|"()\\ \t\n\r')


def _lex(text: str):
    """Token stream: '(' ')' '|' '+' '-' ('phrase', body, slop)
    ('term', raw). Lenient: an unterminated quote swallows the rest as the
    phrase body; '&&'/'||' collapse to AND/OR."""
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\n\r":
            i += 1
            continue
        if c in "()|+":
            if c == "|" and i + 1 < n and text[i + 1] == "|":
                i += 1
            out.append(c)
            i += 1
            continue
        if c == "&" and i + 1 < n and text[i + 1] == "&":
            out.append("+")
            i += 2
            continue
        if c == "-":
            # NOT operator only at a clause boundary (start / after
            # whitespace / after an operator or open paren) — a '-' inside
            # a word like "wi-fi" is part of the term, as in the reference
            if i == 0 or text[i - 1] in " \t\n\r(|+-":
                out.append("-")
                i += 1
                continue
            # else fall through to the term scanner below
        if c == '"':
            j = i + 1
            buf = []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    j += 1
                buf.append(text[j])
                j += 1
            j += 1  # past closing quote (or end)
            slop = 0
            if j < n and text[j] == "~":
                k = j + 1
                while k < n and text[k].isdigit():
                    k += 1
                if k > j + 1:
                    slop = int(text[j + 1:k])
                    j = k
            out.append(("phrase", "".join(buf), slop))
            i = j
            continue
        # bare term: consume until whitespace/special (escapes pass through)
        j = i
        buf = []
        while j < n and text[j] not in _SPECIAL or (j < n and text[j] == "\\"):
            if text[j] == "\\" and j + 1 < n:
                buf.append(text[j + 1])
                j += 2
                continue
            if text[j] in _SPECIAL:
                break
            buf.append(text[j])
            j += 1
        if buf:
            out.append(("term", "".join(buf)))
            i = j
        else:
            i += 1  # lone backslash etc.
    return out


def _fielded(make, field_weights):
    """Apply the weights map: one boosted clause per field, OR-combined
    (SimpleQueryParser.java:87 newDefaultQuery)."""
    if not field_weights:
        return make(None, 1.0)
    items = [(f, w) for f, w in field_weights.items()]
    if len(items) == 1:
        f, w = items[0]
        return make(f, w)
    subs = tuple(make(f, w) for f, w in items)
    subs = tuple(s for s in subs if s is not None)
    if not subs:
        return None
    return Q.BooleanQuery(should=subs)


def _atom_query(tok, analyzer, field_weights):
    """One leaf token -> Query (or None when analysis drops everything)."""
    if tok[0] == "phrase":
        words = tuple(analyzer.tokens(tok[1]))
        if not words:
            return None
        if len(words) == 1:
            return _fielded(
                lambda f, w: Q.TermQuery(words[0], boost=w, field=f),
                field_weights)
        slop = tok[2]
        return _fielded(
            lambda f, w: Q.PhraseQuery(words, slop=slop, boost=w, field=f),
            field_weights)
    raw = tok[1]
    if raw.endswith("*") and len(raw) > 1:
        pre = analyzer.normalize(raw[:-1])
        return _fielded(lambda f, w: Q.PrefixQuery(pre, boost=w, field=f),
                        field_weights)
    if raw == "*":
        return Q.MatchAllDocsQuery()
    if "~" in raw:
        base, _, suf = raw.rpartition("~")
        if base and (suf.isdigit() or suf == ""):
            max_e = int(suf) if suf else 2
            t = analyzer.normalize(base)
            return _fielded(
                lambda f, w: Q.FuzzyQuery(t, max_edits=max_e, boost=w, field=f),
                field_weights)
    words = tuple(analyzer.tokens(raw))
    if not words:
        return None
    if len(words) == 1:
        return _fielded(lambda f, w: Q.TermQuery(words[0], boost=w, field=f),
                        field_weights)
    # one whitespace-free input that analyzes to several tokens behaves
    # like a phrase (the classic parser does the same)
    return _fielded(lambda f, w: Q.PhraseQuery(words, boost=w, field=f),
                    field_weights)


def _parse_seq(tokens, i, analyzer, field_weights, depth=0):
    """or_expr := and_expr (('|' | adjacency) and_expr)* until ')'/end.
    Returns (query_or_None, next_i). Negated and-chains become MUST_NOT of
    the enclosing boolean (SimpleQueryParser.java negation semantics). At
    depth 0 a stray ')' is skipped (lenient) instead of ending the parse."""
    shoulds: list = []
    nots: list = []

    def _parse_and(i):
        pos: list = []
        neg: list = []
        expect_atom = True
        while i < len(tokens):
            t = tokens[i]
            if t == "|" or t == ")":
                break
            if t == "+":
                i += 1
                expect_atom = True
                continue
            if not expect_atom:
                break  # adjacency -> new OR clause
            negated = False
            while i < len(tokens) and tokens[i] == "-":
                negated = not negated
                i += 1
            if i >= len(tokens):
                break
            if tokens[i] in ("|", ")", "+"):
                continue  # dangling '-': lenient skip
            t = tokens[i]
            if t == "(":
                sub, i = _parse_seq(tokens, i + 1, analyzer, field_weights,
                                    depth + 1)
                if i < len(tokens) and tokens[i] == ")":
                    i += 1
                q = sub
            elif isinstance(t, tuple):
                q = _atom_query(t, analyzer, field_weights)
                i += 1
            else:  # stray operator: lenient skip
                i += 1
                continue
            if q is not None:
                (neg if negated else pos).append(q)
            expect_atom = False
        return pos, neg, i

    i0 = i
    while i < len(tokens):
        if tokens[i] == ")":
            if depth:
                break
            i += 1  # stray top-level ')': lenient skip, keep parsing
            continue
        if tokens[i] == "|":
            i += 1
            continue
        pos, neg, i2 = _parse_and(i)
        if i2 == i:  # no progress (lenient guard)
            i2 += 1
        i = i2
        if pos and (len(pos) > 1 or neg):
            shoulds.append(Q.BooleanQuery(must=tuple(pos),
                                          must_not=tuple(neg)))
        elif pos:
            shoulds.append(pos[0])
        elif neg:
            nots.extend(neg)
    if not shoulds and not nots:
        return None, i
    if len(shoulds) == 1 and not nots:
        return shoulds[0], i
    return Q.BooleanQuery(should=tuple(shoulds), must_not=tuple(nots)), i


def parse_simple_query(
    text: str,
    analyzer=StandardAnalyzer,
    field_weights: "dict | None" = None,
) -> Q.Query:
    """Parse the simple syntax; never raises. Empty/all-dropped input ->
    MatchAllDocsQuery (consistent with the classic parser's empty-string
    behavior in this repo)."""
    q, _i = _parse_seq(_lex(text), 0, analyzer, field_weights)
    return q if q is not None else Q.MatchAllDocsQuery()
