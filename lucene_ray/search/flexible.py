"""Flexible query parser — the flexible framework's config-pipeline role
(lucene/queryparser/src/java/org/apache/lucene/queryparser/flexible/
standard/StandardQueryParser.java:71) with PRECEDENCE semantics — the
AND-over-OR folding below is PrecedenceQueryParser's behavior
(queryparser/flexible/precedence/PrecedenceQueryParser.java:38 and its
BooleanModifiersQueryNodeProcessor), not StandardQueryParser's, which
reproduces the classic parser's modifier rewrite.

The reference's flexible framework parses to a query-node tree and runs
a CONFIG-DRIVEN processor pipeline over it (default operator, phrase
slop, fuzzy config, multi-field expansion — StandardQueryNodeProcessor
Pipeline.java:56). This module is that pipeline's semantics over the
engine's own Query dataclasses, reusing the classic lexer/atom parser
(search/parser.py) for the leaves:

* **operator precedence** — AND binds tighter than OR, so
  ``a AND b OR c`` parses as ``(+a +b) c`` with an OR between, matching
  docs with (a∧b) ∨ c. The classic parser's modifier-rewrite instead
  yields ``+a +b c`` (a∧b required, c optional) — a different MATCH SET,
  the known classic-parser precedence wart the flexible/precedence
  parsers exist to fix (flexible/standard/processors/
  BooleanQuery2ModifierNodeProcessor.java:63).
* **default operator** — bare juxtaposition joins at the configured
  operator's precedence level (``setDefaultOperator``).
* **config defaults** — ``phrase_slop`` applies to quoted phrases with
  no explicit ``~n`` (setPhraseSlop); ``fuzzy_max_edits`` to bare
  ``term~`` fuzzies (setFuzzyMinSim's modern shape).
* **multi-field expansion** — an unfielded leaf expands across
  ``multi_fields`` as a DisjunctionMaxQuery with optional per-field
  boosts (setMultiFields, MultiFieldQueryNodeProcessor.java:56).
"""

from __future__ import annotations

import dataclasses

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.search import query as Q
from lucene_ray.search.parser import _TOKEN_RE, _parse_atom


def parse_flexible(
    text: str,
    analyzer: Analyzer = StandardAnalyzer,
    default_operator: str = "or",
    fields: "set[str] | None" = None,
    field_analyzers: "dict[str, Analyzer] | None" = None,
    phrase_slop: int = 0,
    fuzzy_max_edits: int = 2,
    multi_fields: "tuple[str, ...] | None" = None,
    field_boosts: "dict[str, float] | None" = None,
) -> Q.Query:
    """Parse with AND-over-OR precedence and the config knobs above."""
    analyzer = _strip_syn(analyzer)
    fa = {f: _strip_syn(a) for f, a in (field_analyzers or {}).items()}
    fields = set(fields or ()) | set(multi_fields or ())
    cfg = {
        "analyzer": analyzer, "fields": fields, "fa": fa,
        "phrase_slop": phrase_slop, "fuzzy_max_edits": fuzzy_max_edits,
        "multi_fields": tuple(multi_fields or ()),
        "field_boosts": dict(field_boosts or {}),
        "default_operator": default_operator.lower(),
    }
    tokens = [m.group(1) for m in _TOKEN_RE.finditer(text.strip())]
    if not tokens:
        return Q.MatchAllDocsQuery()
    q, _i = _parse_expr(tokens, 0, cfg)
    return q if q is not None else Q.MatchAllDocsQuery()


def _strip_syn(a: Analyzer) -> Analyzer:
    # query-side analysis never injects index-side synonyms (see
    # parser.parse_query for the rationale)
    return dataclasses.replace(a, synonyms=()) if a.synonyms else a


def _parse_expr(tokens: list, i: int, cfg: dict):
    """One parenthesis level: collect (connector, sign, primary) triples,
    then fold with AND binding tighter than OR. The implicit connector
    of bare juxtaposition is the configured default operator."""
    items: list = []   # (connector-before-this-item, sign, Query)
    n = len(tokens)
    pending_conn: str | None = None
    pending_neg = False
    while i < n:
        raw = tokens[i]
        if raw == ")" or raw.startswith(")^"):
            break  # caller consumes
        i += 1
        if raw in ("AND", "OR"):
            pending_conn = raw
            continue
        if raw == "NOT":
            pending_neg = True
            continue
        sign = "pos"
        if raw.startswith("+") and raw != "+":
            raw = raw[1:]
        elif raw.startswith("-") and raw != "-":
            sign, raw = "neg", raw[1:]
        if pending_neg:
            sign = "neg"
        if raw == "(" or raw in ("+(", "-("):
            if raw == "-(":
                sign = "neg"
            q, i = _parse_expr(tokens, i, cfg)
            boost = 1.0
            if i < n and (tokens[i] == ")" or tokens[i].startswith(")^")):
                if tokens[i].startswith(")^"):
                    boost = float(tokens[i][2:])
                i += 1
            if q is not None and boost != 1.0:
                q = Q.BoostQuery(q, boost)
        else:
            q = _leaf(raw, cfg)
        if q is not None:
            items.append((pending_conn, sign, q))
        pending_conn = None
        pending_neg = False

    if not items:
        return None, i
    # fold: AND (explicit, or implicit when default=and) extends the
    # current group; OR starts a new one — groups then join with OR
    imp = "AND" if cfg["default_operator"] == "and" else "OR"
    groups: list[list] = [[items[0][1:]]]
    for conn, sign, q in items[1:]:
        c = conn or imp
        if c == "AND" or sign == "neg":
            # NOT/'-' binds to the current group (a NOT b == a AND NOT b)
            groups[-1].append((sign, q))
        else:
            groups.append([(sign, q)])
    ors = [_combine(g, "and") for g in groups]
    ors = [o for o in ors if o is not None]
    if not ors:
        return None, i
    if len(ors) == 1:
        return ors[0], i
    return Q.BooleanQuery(should=tuple(ors)), i


def _combine(group: list, op: str) -> "Q.Query | None":
    pos = [q for s, q in group if s == "pos"]
    neg = [q for s, q in group if s == "neg"]
    if not pos and not neg:
        return None
    if len(pos) == 1 and not neg:
        return pos[0]
    if op == "and":
        return Q.BooleanQuery(must=tuple(pos), must_not=tuple(neg))
    return Q.BooleanQuery(should=tuple(pos), must_not=tuple(neg))


def _leaf(raw: str, cfg: dict) -> "Q.Query | None":
    """One leaf atom through the classic atom parser, then the flexible
    config processors: default phrase slop, default fuzzy edits,
    multi-field expansion for unfielded atoms."""
    import re

    analyzer, fields, fa = cfg["analyzer"], cfg["fields"], cfg["fa"]

    has_field = bool(re.match(r"^[A-Za-z_][A-Za-z0-9_]*:", raw)) \
        and raw.split(":", 1)[0] in fields
    mf = cfg["multi_fields"]
    if mf and not has_field:
        parts = []
        for f in mf:
            q, boost = _parse_atom(f"{f}:{raw}", analyzer, fields, fa)
            if q is None:
                continue
            q = _apply_defaults(q, raw, cfg)
            b = boost * cfg["field_boosts"].get(f, 1.0)
            parts.append(Q.BoostQuery(q, b) if b != 1.0 else q)
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return Q.DisjunctionMaxQuery(tuple(parts), tie_breaker=0.0)
    q, boost = _parse_atom(raw, analyzer, fields, fa)
    if q is None:
        return None
    q = _apply_defaults(q, raw, cfg)
    return Q.BoostQuery(q, boost) if boost != 1.0 else q


def _apply_defaults(q: Q.Query, raw: str, cfg: dict) -> Q.Query:
    if isinstance(q, Q.PhraseQuery) and q.slop == 0 \
            and cfg["phrase_slop"] > 0 and "~" not in raw:
        q = dataclasses.replace(q, slop=cfg["phrase_slop"])
    if isinstance(q, Q.FuzzyQuery) and raw.rstrip().endswith("~") \
            and cfg["fuzzy_max_edits"] != q.max_edits:
        q = dataclasses.replace(q, max_edits=cfg["fuzzy_max_edits"])
    return q
