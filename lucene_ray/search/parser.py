"""Classic query parser — the subset of Lucene's classic syntax we serve.

Grammar modeled on queryparser/classic/QueryParserBase.java:90-464:

    query     := clause+
    clause    := [+|-] atom [^boost]
    atom      := '"' words '"' [~slop]      phrase
               | '[' t TO t ']' / '{..}'   term range (incl/excl bounds)
               | word'~'[n]                 fuzzy (default 2 edits)
               | word with * or ?           wildcard (trailing-*-only -> prefix)
               | word                       term
    field prefixes: "title:term" / 'title:"a phrase"' scope the atom to a
    named field when ``fields`` lists it; the default text field's name (or
    an unknown field) strips to the default field.

Bare clauses are SHOULD, '+' is MUST, '-' is MUST_NOT; explicit AND/OR/NOT
connectors rewrite like the reference's default OR semantics. Query terms
run through Analyzer.normalize (lowercase), and phrase words through the
full analyzer (QueryParser analyzes quoted text).
"""

from __future__ import annotations

import re

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.search import query as Q

_TOKEN_RE = re.compile(
    r"""
    \s*(
        [+-]?(?:[A-Za-z_][A-Za-z0-9_]*:)?\"[^\"]*\"(?:~\d+)?  # [field:]phrase [~slop]
      | \[[^\]]*\]                 # inclusive range
      | \{[^}]*\}                  # exclusive range
      | AND | OR | NOT
      | [+-]?\(                    # group open (with optional occur)
      | \)(?:\^\d+(?:\.\d+)?)?     # group close (with optional boost)
      | [+-]?[^\s()]+              # term-ish
    )
    """,
    re.VERBOSE,
)

_RANGE_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$", re.IGNORECASE)


def parse_query(
    text: str,
    analyzer: Analyzer = StandardAnalyzer,
    fields: "set[str] | None" = None,
    field_analyzers: "dict[str, Analyzer] | None" = None,
) -> Q.Query:
    """``field_analyzers`` maps named fields to their own analyzers —
    the PerFieldAnalyzerWrapper role (analysis/miscellaneous/
    PerFieldAnalyzerWrapper.java:51): a ``title:foo`` atom analyzes with
    title's analyzer, everything else with the default (the classic
    QueryParser consults the wrapper per field the same way)."""
    # Query-side analysis must NOT run the index-side synonym injection:
    # injected terms ride at the SAME position in the index, but tokens()
    # appends them, which would turn "world" into PhraseQuery(world, earth)
    # — a query that can never match. Synonym matching happens because the
    # INDEX carries the injected postings.
    import dataclasses

    def _strip_syn(a: Analyzer) -> Analyzer:
        return dataclasses.replace(a, synonyms=()) if a.synonyms else a

    analyzer = _strip_syn(analyzer)
    fa = {f: _strip_syn(a) for f, a in (field_analyzers or {}).items()}
    tokens = [m.group(1) for m in _TOKEN_RE.finditer(text.strip())]
    if not tokens:
        return Q.MatchAllDocsQuery()
    # A stray top-level ')' makes _parse_tokens stop early; keep consuming
    # so text after the unbalanced paren is not silently dropped — each
    # resumed run contributes its clauses as SHOULD (same as whitespace).
    clauses: list[Q.Query] = []
    i, n = 0, len(tokens)
    while i < n:
        q, i = _parse_tokens(tokens, i, analyzer, fields or set(), fa)
        if q is not None:
            clauses.append(q)
        if i < n and (tokens[i] == ")" or tokens[i].startswith(")^")):
            i += 1  # unmatched close paren: treat as noise
    if not clauses:
        return Q.MatchAllDocsQuery()
    if len(clauses) == 1:
        return clauses[0]
    return Q.BooleanQuery(should=tuple(clauses))


def _parse_tokens(
    tokens: list[str], i: int, analyzer: Analyzer, fields: set[str],
    field_analyzers: "dict[str, Analyzer] | None" = None
) -> "tuple[Q.Query | None, int]":
    """Parse a clause run until ')' or end-of-input (recursive for groups —
    the classic grammar's '(' query ')' [^boost] production)."""
    must: list[Q.Query] = []
    should: list[Q.Query] = []
    must_not: list[Q.Query] = []

    pending_op: str | None = None
    prev_to_must = False
    n = len(tokens)
    while i < n:
        raw = tokens[i]
        if raw == ")" or raw.startswith(")^"):
            break  # caller consumes the close token
        i += 1
        if raw in ("AND", "OR", "NOT"):
            pending_op = raw
            continue
        occur = "should"
        if raw.startswith("+"):
            occur, raw = "must", raw[1:]
        elif raw.startswith("-"):
            occur, raw = "must_not", raw[1:]
        if pending_op == "NOT":
            occur = "must_not"
        elif pending_op == "AND":
            occur = "must"
            if prev_to_must and should:
                must.append(should.pop())
        if raw == "(":
            q, i = _parse_tokens(tokens, i, analyzer, fields,
                                 field_analyzers)
            boost = 1.0
            if i < n and (tokens[i] == ")" or tokens[i].startswith(")^")):
                if tokens[i].startswith(")^"):
                    boost = float(tokens[i][2:])
                i += 1
        else:
            q, boost = _parse_atom(raw, analyzer, fields, field_analyzers)
        if q is None:
            pending_op = None
            continue
        if boost != 1.0:
            q = Q.BoostQuery(q, boost)
        {"must": must, "should": should, "must_not": must_not}[occur].append(q)
        prev_to_must = occur == "should"
        pending_op = None

    if not must and not must_not:
        if not should:
            return None, i
        if len(should) == 1:
            return should[0], i
    if len(must) == 1 and not should and not must_not:
        return must[0], i
    return (
        Q.BooleanQuery(must=tuple(must), should=tuple(should), must_not=tuple(must_not)),
        i,
    )


def _normalize_pattern(analyzer, w: str) -> str:
    """Normalize (lowercase/fold) only the literal fragments of a
    wildcard pattern, leaving ``*``/``?`` in place — so "Ta*LE" becomes
    "ta*le" rather than a literal term containing '*'."""
    out, frag = [], []
    for ch in w:
        if ch in "*?":
            if frag:
                out.append(analyzer.normalize("".join(frag)))
                frag = []
            out.append(ch)
        else:
            frag.append(ch)
    if frag:
        out.append(analyzer.normalize("".join(frag)))
    return "".join(out)


def _parse_atom(
    raw: str, analyzer: Analyzer, fields: set[str],
    field_analyzers: "dict[str, Analyzer] | None" = None,
) -> tuple[Q.Query | None, float]:
    boost = 1.0
    # field prefix: scope to a known named field; the default field's name
    # (or an unknown field) strips to the default, matching classic-parser
    # behavior of resolving every term against a field
    field: str | None = None
    fp = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", raw)
    if fp and not raw.startswith("http"):
        name, rest = fp.group(1), fp.group(2)
        if name in fields:
            field, raw = name, rest
            if field_analyzers and name in field_analyzers:
                analyzer = field_analyzers[name]  # PerFieldAnalyzerWrapper
        else:
            raw = rest

    m = re.search(r"\^(\d+(?:\.\d+)?)$", raw)
    if m and not raw.startswith('"'):
        boost = float(m.group(1))
        raw = raw[: m.start()]
    if raw.startswith('"'):
        mm = re.match(r'^"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?$', raw)
        if mm is None:
            # unterminated / malformed quote: treat the remainder as a
            # plain term atom (same leniency as a stray ')'; the
            # reference throws ParseException — garbage-in never 500s
            # here, matching the rest of this parser's error model)
            raw = raw.strip('"')
            if not raw:
                return None, boost
            terms = analyzer.tokens(raw)
            if not terms:
                return None, boost
            if len(terms) == 1:
                return Q.TermQuery(terms[0], field=field), boost
            return Q.PhraseQuery(tuple(terms), field=field), boost
        body = mm.group(1)
        slop = int(mm.group(2) or 0)
        if mm.group(3):
            boost = float(mm.group(3))
        if "*" in body or "?" in body:
            # ComplexPhraseQueryParser role (complexPhrase/
            # ComplexPhraseQueryParser.java:66): a quoted phrase with
            # wildcard slots -> segment-expanded PhraseWildcardQuery.
            # Mid-word patterns ("s*k", "te?t") keep their wildcards and
            # normalize only the literal fragments — they used to be
            # normalized into literal '*'-containing terms that silently
            # matched nothing.
            slots = tuple(
                _normalize_pattern(analyzer, w)
                if ("*" in w or "?" in w) and w != "*"
                else analyzer.normalize(w)
                for w in body.split() if w
            )
            if not slots:
                return None, boost
            return Q.PhraseWildcardQuery(slots, field=field), boost
        words = tuple(analyzer.tokens(body))
        if not words:
            return None, boost
        if len(words) == 1:
            return Q.TermQuery(words[0], field=field), boost
        return Q.PhraseQuery(words, slop=slop, field=field), boost

    rm = _RANGE_RE.match(raw)
    if rm:
        lo = None if rm.group(2) == "*" else analyzer.normalize(rm.group(2))
        hi = None if rm.group(3) == "*" else analyzer.normalize(rm.group(3))
        return (
            Q.TermRangeQuery(lo, hi, rm.group(1) == "[", rm.group(4) == "]",
                             field=field),
            boost,
        )

    fm = re.match(r"^(.+?)~(\d*)$", raw)
    if fm and "*" not in raw and "?" not in raw:
        max_e = int(fm.group(2)) if fm.group(2) else 2
        return Q.FuzzyQuery(analyzer.normalize(fm.group(1)), max_edits=max_e,
                            field=field), boost

    if "*" in raw or "?" in raw:
        norm = analyzer.normalize(raw)
        if norm == "*":
            # QueryParserBase rewrites a pure-wildcard term: `f:*` means
            # "docs where field f exists" (FieldExistsQuery), and a bare
            # `*` (or `*:*`) means every document
            if field is None:
                return Q.MatchAllDocsQuery(), boost
            return Q.FieldExistsQuery(field), boost
        if norm.endswith("*") and "*" not in norm[:-1] and "?" not in norm:
            return Q.PrefixQuery(norm[:-1], field=field), boost
        return Q.WildcardQuery(norm, field=field), boost

    terms = analyzer.tokens(raw)
    if not terms:
        return None, boost
    if len(terms) == 1:
        return Q.TermQuery(terms[0], field=field), boost
    return Q.PhraseQuery(tuple(terms), field=field), boost



def parse_multi_field(
    text: str,
    mf_fields: tuple,
    boosts: "dict | None" = None,
    analyzer: Analyzer = StandardAnalyzer,
    field_analyzers: "dict[str, Analyzer] | None" = None,
) -> Q.Query:
    """MultiFieldQueryParser (queryparser/classic/MultiFieldQueryParser.java:42,
    getFieldQuery at :118): parse classic syntax, then expand every
    UNFIELDED leaf clause into a SHOULD-disjunction of per-field copies —
    ``mf_fields`` entries are field names, with ``None`` = the default
    body field; ``boosts[field]`` multiplies that copy's boost (the
    reference's Map<String,Float> ctor). Explicit ``field:`` atoms in the
    text stay as written, exactly like the reference.

    Deviation, documented: per-field copies reuse the default analyzer's
    token form (the reference re-analyzes per field); identical whenever
    the fields share one analyzer chain."""
    import dataclasses

    known = {f for f in mf_fields if f} | set(field_analyzers or ())
    base = parse_query(text, analyzer=analyzer, fields=known,
                       field_analyzers=field_analyzers)
    leaf = (Q.TermQuery, Q.PhraseQuery, Q.PrefixQuery, Q.WildcardQuery,
            Q.FuzzyQuery, Q.RegexpQuery, Q.TermRangeQuery,
            Q.MultiPhraseQuery)

    def _expand(q: Q.Query) -> Q.Query:
        if isinstance(q, leaf) and q.field is None:
            copies = []
            for f in mf_fields:
                c = q if f is None else dataclasses.replace(q, field=f)
                b = (boosts or {}).get(f, 1.0)
                if b != 1.0:
                    c = dataclasses.replace(c, boost=c.boost * b)
                copies.append(c)
            if len(copies) == 1:
                return copies[0]
            return Q.BooleanQuery(should=tuple(copies))
        if isinstance(q, Q.BooleanQuery):
            return dataclasses.replace(
                q,
                must=tuple(_expand(s) for s in q.must),
                should=tuple(_expand(s) for s in q.should),
                must_not=tuple(_expand(s) for s in q.must_not),
                filter=tuple(_expand(s) for s in q.filter),
            )
        if isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
            return dataclasses.replace(q, query=_expand(q.query))
        return q

    return _expand(base)
