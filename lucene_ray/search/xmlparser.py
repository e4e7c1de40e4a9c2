"""XML query parser — the queryparser/xml CoreParser role
(lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:48 and its builders/ registry): queries arrive as an
XML tree, each element dispatched to a builder keyed by tag name.

Implemented builders (the CoreParser set minus the Span* family, which
maps onto the intervals algebra, and FuzzyLikeThis/LikeThis, which the
engine serves as MoreLikeThis):

    TermQuery, TermsQuery, BooleanQuery (Clause occurs=
    must|should|mustNot|filter), MatchAllDocsQuery, ConstantScoreQuery,
    DisjunctionMaxQuery (tieBreaker), RangeQuery (terms),
    BoostingTermQuery (-> boosted term; payload scoring needs a payload
    field),
    UserQuery (delegates to the classic parser, the reference's
    UserInputQueryBuilder), PhraseQuery (convenience), SpanTerm /
    SpanNear / SpanOr (mapped to the engine's span/interval queries).

Every element honors the ``boost`` attribute, like the reference's
builders. The registry is an extensible dict — user builders register
with :func:`register_builder` (the CoreParser.addQueryBuilder
extension point)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.search import query as Q


class XMLParseError(ValueError):
    pass


def parse_xml_query(text: str, analyzer: Analyzer = StandardAnalyzer,
                    fields: "set[str] | None" = None) -> Q.Query:
    """Parse one XML query document into a Query tree."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise XMLParseError(f"malformed query XML: {e}") from e
    return _build(root, analyzer, fields or set())


_BUILDERS: dict = {}


def register_builder(tag: str, fn) -> None:
    """CoreParser.addQueryBuilder extension point: ``fn(elem, analyzer,
    fields, build_child) -> Query``."""
    _BUILDERS[tag] = fn


def _build(el: ET.Element, analyzer: Analyzer, fields: set) -> Q.Query:
    fn = _BUILDERS.get(el.tag)
    if fn is None:
        raise XMLParseError(f"unknown query element <{el.tag}>")
    q = fn(el, analyzer, fields,
           lambda child: _build(child, analyzer, fields))
    boost = el.get("boost")
    if boost is not None and float(boost) != 1.0:
        q = Q.BoostQuery(q, float(boost))
    return q


def _field(el: ET.Element) -> "str | None":
    f = el.get("fieldName")
    return f or None


def _text(el: ET.Element) -> str:
    return (el.text or "").strip()


def _b_term(el, analyzer, _fields, _child):
    return Q.TermQuery(analyzer.normalize(_text(el)), field=_field(el))


def _b_terms(el, analyzer, _fields, _child):
    # TermsQueryBuilder analyzes the element text into terms
    terms = tuple(analyzer.tokens(_text(el)))
    return Q.TermInSetQuery(terms, field=_field(el))


def _b_boolean(el, _analyzer, _fields, child):
    must, should, must_not, filt = [], [], [], []
    for cl in el:
        if cl.tag != "Clause":
            raise XMLParseError(
                f"<BooleanQuery> children must be <Clause>, got <{cl.tag}>")
        occurs = cl.get("occurs", "should")
        subs = list(cl)
        if len(subs) != 1:
            raise XMLParseError("<Clause> must hold exactly one query")
        q = child(subs[0])
        {"must": must, "should": should, "mustNot": must_not,
         "filter": filt}.get(occurs, should).append(q)
    kw = {}
    msm = el.get("minimumNumberShouldMatch")
    if msm is not None:
        kw["minimum_should_match"] = int(msm)
    return Q.BooleanQuery(must=tuple(must), should=tuple(should),
                          must_not=tuple(must_not), filter=tuple(filt),
                          **kw)


def _b_match_all(_el, _analyzer, _fields, _child):
    return Q.MatchAllDocsQuery()


def _b_constant(el, _analyzer, _fields, child):
    subs = list(el)
    if len(subs) != 1:
        raise XMLParseError("<ConstantScoreQuery> must hold one query")
    return Q.ConstantScoreQuery(child(subs[0]))


def _b_dismax(el, _analyzer, _fields, child):
    tie = float(el.get("tieBreaker", "0"))
    return Q.DisjunctionMaxQuery(tuple(child(c) for c in el),
                                 tie_breaker=tie)


def _b_range(el, analyzer, _fields, _child):
    lo = el.get("lowerTerm")
    hi = el.get("upperTerm")
    return Q.TermRangeQuery(
        analyzer.normalize(lo) if lo is not None else None,
        analyzer.normalize(hi) if hi is not None else None,
        el.get("includeLower", "true") == "true",
        el.get("includeUpper", "true") == "true",
        field=_field(el),
    )


def _b_point_range(el, _analyzer, _fields, _child):
    # numeric point ranges are served by parquet predicate pushdown in
    # this engine (the survey's BKD mapping), not a Query-tree leaf
    raise XMLParseError(
        "<PointRangeQuery> is not a Query-tree leaf here: numeric ranges "
        "run as parquet filter pushdown (index/sorted.py, "
        "sorted_range_count) — filter the Dataset instead")


def _b_boosting_term(el, analyzer, _fields, _child):
    # BoostingTermBuilder scores by payload in the reference; without a
    # payload field configured this is the boosted-term degenerate case
    return Q.TermQuery(analyzer.normalize(_text(el)), field=_field(el))


def _b_user(el, analyzer, fields, _child):
    from lucene_ray.search.parser import parse_query

    return parse_query(_text(el), analyzer, fields=fields)


def _b_phrase(el, analyzer, _fields, _child):
    words = tuple(analyzer.tokens(_text(el)))
    slop = int(el.get("slop", "0"))
    if len(words) == 1:
        return Q.TermQuery(words[0], field=_field(el))
    return Q.PhraseQuery(words, slop=slop, field=_field(el))


def _b_span_term(el, analyzer, _fields, _child):
    return Q.TermQuery(analyzer.normalize(_text(el)), field=_field(el))


def _b_span_near(el, analyzer, _fields, child):
    terms = []
    for c in el:
        sub = child(c)
        if not isinstance(sub, Q.TermQuery):
            raise XMLParseError(
                "<SpanNear> children must be term-like in this engine")
        terms.append(sub.term)
    return Q.SpanNearQuery(
        tuple(terms),
        slop=int(el.get("slop", "0")),
        in_order=el.get("inOrder", "true") == "true",
    )


def _b_span_or(el, _analyzer, _fields, child):
    return Q.BooleanQuery(should=tuple(child(c) for c in el))


for _tag, _fn in {
    "TermQuery": _b_term,
    "TermsQuery": _b_terms,
    "BooleanQuery": _b_boolean,
    "MatchAllDocsQuery": _b_match_all,
    "ConstantScoreQuery": _b_constant,
    "DisjunctionMaxQuery": _b_dismax,
    "RangeQuery": _b_range,
    "PointRangeQuery": _b_point_range,
    "BoostingTermQuery": _b_boosting_term,
    "UserQuery": _b_user,
    "PhraseQuery": _b_phrase,
    "SpanTerm": _b_span_term,
    "SpanNear": _b_span_near,
    "SpanOr": _b_span_or,
}.items():
    register_builder(_tag, _fn)
