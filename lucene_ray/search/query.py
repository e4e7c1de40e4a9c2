"""Query AST — the engine's equivalent of org.apache.lucene.search.Query.

Plain dataclasses; rewrite/weight/scorer phases (search/TermQuery.java:120)
collapse into: (1) analyze/rewrite on the driver, (2) global term-stats
lookup (TermStates.build, index/TermStates.java:96-140), (3) per-segment
vectorized evaluation (search/scoring.py). All queries serialize to JSON so
they cross the actor boundary cheaply.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    def to_dict(self) -> dict:
        raise NotImplementedError


@dataclass(frozen=True)
class TermQuery(Query):
    """search/TermQuery.java:39 — single-term BM25-scored posting scan.

    ``field=None`` targets the index's default field (the Term(field, text)
    pair of the reference); a named field scopes the term to that field's
    dictionary section and norms."""

    term: str
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "term", "term": self.term, "boost": self.boost,
                "field": self.field}


@dataclass(frozen=True)
class BooleanQuery(Query):
    """search/BooleanQuery.java:40 — MUST / SHOULD / FILTER / MUST_NOT with
    minimumNumberShouldMatch (BooleanQuery.java:45)."""

    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    minimum_should_match: int = 0
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "bool",
            "must": [q.to_dict() for q in self.must],
            "should": [q.to_dict() for q in self.should],
            "must_not": [q.to_dict() for q in self.must_not],
            "filter": [q.to_dict() for q in self.filter],
            "minimum_should_match": self.minimum_should_match,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class PhraseQuery(Query):
    """search/PhraseQuery.java:71 — exact positional phrase (slop=0) or
    sloppy within-window match. Scored like Lucene: idf summed over terms
    (BM25Similarity.idfExplain(termStats[])), freq = number of phrase
    occurrences in the doc."""

    terms: tuple
    slop: int = 0
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {
            "type": "phrase",
            "terms": list(self.terms),
            "slop": self.slop,
            "boost": self.boost,
            "field": self.field,
        }


@dataclass(frozen=True)
class SynonymQuery(Query):
    """search/SynonymQuery.java:52 — terms scored as one pseudo-term:
    df = max over terms, ttf = sum, freq = sum of per-term freqs."""

    terms: tuple
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "synonym", "terms": list(self.terms),
                "boost": self.boost, "field": self.field}


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """search/BlendedTermQuery.java:270-300 — the terms' statistics blend
    (df = max of docFreqs, ttf = sum, BlendedTermQuery.rewrite), each term
    scores as a TermQuery carrying the blended stats, and the rewritten
    disjunction combines via DisjunctionMax with tie_breaker 0.01
    (DISJUNCTION_MAX_REWRITE, BlendedTermQuery.java:190)."""

    terms: tuple
    tie_breaker: float = 0.01
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "blended_term", "terms": list(self.terms),
                "tie_breaker": self.tie_breaker, "boost": self.boost,
                "field": self.field}


@dataclass(frozen=True)
class PrefixQuery(Query):
    """search/PrefixQuery.java — constant-score multi-term expansion."""

    prefix: str
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "prefix", "prefix": self.prefix, "boost": self.boost,
                "field": self.field}


@dataclass(frozen=True)
class WildcardQuery(Query):
    """search/WildcardQuery.java:38 — '*' and '?' over the term dict."""

    pattern: str
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "wildcard", "pattern": self.pattern,
                "boost": self.boost, "field": self.field}


def rewrite_leading_wildcard(pattern: str,
                             reverse_field: str) -> "Query":
    """Reversed-wildcard serving pattern: when a second field indexes the
    same text through ReverseStringFilter
    (analysis/reverse/ReverseStringFilter.java:44), a pure LEADING
    wildcard ``*suffix`` rewrites to ``PrefixQuery(suffix[::-1],
    field=reverse_field)`` — a contiguous term-dictionary range scan
    instead of a full-dictionary regex scan (the dominant cost at a
    10^9-term dictionary). Patterns that aren't a pure leading ``*``
    (interior ``*``/``?``) fall back to the ordinary WildcardQuery over
    the default field."""
    body = pattern[1:]
    if pattern.startswith("*") and body and "*" not in body \
            and "?" not in body:
        return PrefixQuery(prefix=body[::-1], field=reverse_field)
    return WildcardQuery(pattern=pattern)


@dataclass(frozen=True)
class RegexpQuery(Query):
    """search/RegexpQuery.java — anchored regex over the term dict."""

    pattern: str
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "regexp", "pattern": self.pattern,
                "boost": self.boost, "field": self.field}


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """search/FuzzyQuery.java:27-50 — terms within edit distance
    ``max_edits`` (default 2, optional transpositions like the reference)."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    transpositions: bool = True  # Damerau (reference default) vs plain Levenshtein
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {
            "type": "fuzzy",
            "term": self.term,
            "max_edits": self.max_edits,
            "prefix_length": self.prefix_length,
            "transpositions": self.transpositions,
            "boost": self.boost,
            "field": self.field,
        }


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """search/TermRangeQuery.java — lexicographic term range."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {
            "type": "range",
            "lower": self.lower,
            "upper": self.upper,
            "include_lower": self.include_lower,
            "include_upper": self.include_upper,
            "boost": self.boost,
            "field": self.field,
        }


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """search/TermInSetQuery.java:73 — doc matches if it contains any of the
    terms; constant score."""

    terms: tuple
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "in_set", "terms": list(self.terms),
                "boost": self.boost, "field": self.field}


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    """search/MatchAllDocsQuery.java — every doc, score = boost."""

    boost: float = 1.0

    def to_dict(self):
        return {"type": "match_all", "boost": self.boost}


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    """search/MatchNoDocsQuery.java — matches nothing (the rewrite target
    for provably-empty queries, e.g. an empty join from-side)."""

    def to_dict(self):
        return {"type": "match_none"}


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """search/FieldExistsQuery.java:63 — matches every doc that indexed the
    field, constant score = boost. Adapted to the dense-norms layout: a doc
    "has" an analyzed field when analysis produced >= 1 token for it (norm
    byte > 0); an unknown field matches nothing. ``field=None`` = the
    default body field. The classic parser maps a bare ``field:*`` atom
    here (QueryParserBase rewrites pure-wildcard terms the same way)."""

    field: "str | None" = None
    boost: float = 1.0

    def to_dict(self):
        return {"type": "field_exists", "field": self.field, "boost": self.boost}


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """search/ConstantScoreQuery.java — wrap any query, score = boost."""

    query: Query
    boost: float = 1.0

    def to_dict(self):
        return {"type": "const", "query": self.query.to_dict(), "boost": self.boost}


@dataclass(frozen=True)
class BoostQuery(Query):
    """search/BoostQuery.java — multiply wrapped query's scores."""

    query: Query
    boost: float

    def to_dict(self):
        return {"type": "boost", "query": self.query.to_dict(), "boost": self.boost}


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """search/MultiPhraseQuery.java:236 — exact phrase where each position
    accepts any of several alternative terms."""

    positions: tuple  # tuple[tuple[str, ...], ...]
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {
            "type": "multi_phrase",
            "positions": [list(p) for p in self.positions],
            "boost": self.boost,
            "field": self.field,
        }


def is_wildcard_slot(key: str) -> bool:
    """A phrase slot is a wildcard pattern iff its TERM part (field
    marker stripped) contains ``*`` or ``?`` — trailing ``*`` (prefix),
    mid-word ``s*k``, and single-char ``?`` all count, matching the
    reference ComplexPhraseQueryParser's wildcard support. The bare
    ``'*'`` term stays a concrete (unmatchable) term, fielded or not."""
    from lucene_ray.index.fields import split_key

    _f, t = split_key(key)
    if t == "*":
        return False
    return "*" in t or "?" in t


@dataclass(frozen=True)
class PhraseWildcardQuery(Query):
    """sandbox/src/java/org/apache/lucene/search/PhraseWildcardQuery.java:63
    — a phrase where a slot may be a wildcard pattern (trailing-``*``
    prefix, mid-word ``*``, single-char ``?``), expanded against EACH
    SEGMENT'S OWN dictionary (the reference's segment-based expansion
    that shares no global automaton state), then matched exactly like
    MultiPhraseQuery. Scoring: phrase BM25 with idf summed over the
    CONCRETE slots only — wildcard slots contribute the freq but no idf,
    which keeps scores identical across segment layouts WHILE every
    slot's expansion fits under ``max_expansions``; past the cap each
    segment keeps its first ``max_expansions`` dictionary-order matches,
    so the surviving MATCH SET (not just scores) is segment-layout-
    dependent — the same per-segment truncation the reference applies
    (documented deviation from the reference's collected TermStates). A
    phrase of ONLY wildcard slots is constant-score = boost. The classic
    parser maps a quoted phrase containing ``*``/``?`` here (the
    ComplexPhraseQueryParser role, complexPhrase/ComplexPhraseQueryParser
    .java:66)."""

    slots: tuple  # str per position; '*'/'?' in term part = pattern slot
    max_expansions: int = 128
    boost: float = 1.0
    field: "str | None" = None

    def leaf_terms(self, out: set):
        for s in self.slots:
            if not is_wildcard_slot(s):
                out.add(s)

    def to_dict(self):
        return {"type": "phrase_wildcard", "slots": list(self.slots),
                "max_expansions": self.max_expansions, "boost": self.boost,
                "field": self.field}


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity spans — the queries/spans SpanNearQuery role
    (queries/spans/SpanNearQuery.java): all terms within a window of
    ``len(terms) + slop`` positions, ordered or unordered.

    ``in_order=True`` is exactly the sloppy-phrase matcher. Unordered
    semantics here: a match is an occurrence of the FIRST term such that
    every other term has an occurrence within ``len+slop-1`` positions in
    EITHER direction; freq = number of such anchor occurrences
    (documented deviation from the reference's minimal-interval spans —
    same match set for the common case, simpler freq accounting)."""

    terms: tuple
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {
            "type": "span_near",
            "terms": list(self.terms),
            "slop": self.slop,
            "in_order": self.in_order,
            "boost": self.boost,
            "field": self.field,
        }


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Minimal-interval algebra query — queries/intervals/IntervalQuery.java
    over an :mod:`lucene_ray.search.intervals` source tree
    (Intervals.java:56 factories: ordered/unordered + maxgaps, or,
    containing, containedBy). Matches docs where the source produces at
    least one interval.

    Scoring: ``score_mode="constant"`` gives ``boost`` per matching doc
    (the filter use); ``"saturation"`` reproduces the reference's
    IntervalScorer + saturationFunction contract
    (IntervalScorer.java:60-68): freq = sum over the doc's intervals of
    1/max(width - minExtent + 1, 1), score = boost * freq/(freq+pivot)."""

    source: "object"  # IntervalsSource
    boost: float = 1.0
    field: str | None = None  # resolve_fields rewrites leaves to field keys
    score_mode: str = "constant"
    pivot: float = 1.0

    def to_dict(self):
        return {
            "type": "intervals",
            "source": self.source.to_dict(),
            "boost": self.boost,
            "field": self.field,
            "score_mode": self.score_mode,
            "pivot": self.pivot,
        }


@dataclass(frozen=True)
class CombinedFieldQuery(Query):
    """BM25F over several fields treated as one combined pseudo-field
    (sandbox/.../search/CombinedFieldQuery.java:303-420 semantics, simple
    BM25F variant):

        tf~(d,t)  = sum_f w_f * tf_f(d,t)
        dl~(d)    = sum_f w_f * len_f(d)          (EXACT lengths — the
                     reference sums smallfloat-quantized per-field norms;
                     we use exact lengths, a documented deviation)
        avgdl~    = sum_f w_f * sumTTF_f / docCount
        df~(t)    = max_f df_f(t)                 (pseudo collection stats)
        score(d)  = sum_t idf(df~) * tf~ / (tf~ + k1*(1-b+b*dl~/avgdl~))

    ``fields`` is a tuple of (field_name_or_None, weight)."""

    terms: tuple
    fields: tuple  # tuple[(str | None, float), ...]
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "combined_field",
            "terms": list(self.terms),
            "fields": [[f, w] for f, w in self.fields],
            "boost": self.boost,
        }


@dataclass(frozen=True)
class FeatureQuery(Query):
    """Static per-doc feature scoring — document/FeatureField.java:96.

    The reference stores the feature value as the pseudo-frequency of a
    term in a "feature" field and exposes newSaturationQuery /
    newLogQuery / newSigmoidQuery / newLinearQuery over it
    (FeatureField.java:356-438); here the feature is a ``feat_<name>``
    docs.parquet column written at build time (build_index(features=...)).
    Matches every doc whose feature value is > 0 (the reference matches
    docs that indexed the feature term); score per function:

        saturation: boost * v / (v + pivot)
        log:        boost * log(a + v)          (a = scaling factor)
        sigmoid:    boost * v^a / (v^a + pivot^a)
        linear:     boost * v

    Compose with a relevance query through BooleanQuery ``should`` — the
    reference's recommended ranking pattern."""

    feature: str
    function: str = "saturation"  # saturation | log | sigmoid | linear
    pivot: float = 1.0
    a: float = 1.0
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "feature",
            "feature": self.feature,
            "function": self.function,
            "pivot": self.pivot,
            "a": self.a,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class DistanceFeatureQuery(Query):
    """Distance-decay feature scoring — the LongPoint.newDistanceFeatureQuery
    role (document/LongPoint.java:187, LongDistanceFeatureQuery): rank docs
    by proximity of a stored numeric value to an ``origin`` (recency
    boosting is the canonical use). Scores

        boost * pivot / (pivot + |v - origin|)

    over a dense ``feat_<name>`` column written by build_index(features=...)
    — at ``v == origin`` the score is ``boost``; at distance ``pivot`` it
    halves. The geo variant (LatLonPoint.newDistanceFeatureQuery) lives in
    pipelines/geo.py:distance_feature. Compose through BooleanQuery
    ``should`` next to a relevance query, like FeatureQuery."""

    feature: str
    origin: float
    pivot: float
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "distance_feature",
            "feature": self.feature,
            "origin": self.origin,
            "pivot": self.pivot,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """Payload-driven scoring — queries/payloads/PayloadScoreQuery.java:47
    with PayloadFunction (Max/Min/Sum/AveragePayloadFunction) and the
    float payload decoder. Matches docs containing ``term``; per doc the
    term occurrences' payloads (the float32 ``payload`` positions column
    written when the index was built with
    ``Analyzer(payload_delimiter=...)``) aggregate through ``function``
    (sum | min | max | avg). ``include_span_score`` multiplies the
    payload score by the term's BM25 score, the reference's
    includeSpanScore=true mode; False scores by payload alone."""

    term: str
    function: str = "sum"  # sum | min | max | avg
    include_span_score: bool = False
    boost: float = 1.0
    field: "str | None" = None

    def to_dict(self):
        return {
            "type": "payload_score",
            "term": self.term,
            "function": self.function,
            "include_span_score": self.include_span_score,
            "boost": self.boost,
            "field": self.field,
        }


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """queries/CommonTermsQuery.java:55 — df-split scoring: docs must match
    at least one low-frequency term (df <= max_doc_freq); high-frequency
    terms only add score where they co-occur. With no low-freq terms the
    query degrades to a plain disjunction of the high-freq terms."""

    terms: tuple
    max_doc_freq: int = 1000
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "common_terms",
            "terms": list(self.terms),
            "max_doc_freq": self.max_doc_freq,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class CoveringQuery(Query):
    """sandbox/search/CoveringQuery.java:56-79 + CoveringScorer.java:129-135:
    matches docs where at least ``minMatch`` of the sub-queries match,
    where minMatch is a per-document long value — here a dense
    ``feat_<name>`` column (``min_match_feature``), falling back to the
    constant ``min_match``. Values < 1 are treated as 1 (at least one
    sub must match); values > len(queries) match nothing. Score = sum of
    the matching sub-queries' scores (CoveringScorer.score)."""

    queries: tuple
    min_match_feature: str | None = None
    min_match: int = 1
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "covering",
            "queries": [q.to_dict() for q in self.queries],
            "min_match_feature": self.min_match_feature,
            "min_match": self.min_match,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class DocValuesRangeQuery(Query):
    """document/SortedNumericDocValuesField.java:108 ``newSlowRangeQuery``
    (executor: document/SortedNumericDocValuesRangeQuery.java:48): match
    every doc whose NUMERIC doc-values ``feature`` lies in
    ``[lower, upper]`` by scanning the values, not a points index —
    constant score = boost. ``None`` = open end. Reads through
    ``SegmentReader.feature``, so committed numeric DV UPDATE generations
    are visible (later generations win). An unknown feature matches
    nothing (like an unindexed DV field). The intended role is the
    verification side of :class:`IndexOrDocValuesQuery`: as a non-leading
    FILTER clause the engine probes only the lead candidates."""

    feature: str
    lower: "float | None" = None
    upper: "float | None" = None
    boost: float = 1.0

    def to_dict(self):
        return {"type": "dv_range", "feature": self.feature,
                "lower": self.lower, "upper": self.upper, "boost": self.boost}


@dataclass(frozen=True)
class DocValuesSetQuery(Query):
    """document/SortedDocValuesField.java:126 ``newSlowSetQuery`` (and
    :114 ``newSlowExactQuery`` = a 1-element set): match docs whose
    STRING doc value ``name`` equals one of ``values`` by scanning the
    doc values — constant score = boost. String-DV update generations
    overlay (``SegmentReader.string_values``). Unknown DV name matches
    nothing."""

    name: str
    values: tuple  # tuple[str, ...]
    boost: float = 1.0

    def to_dict(self):
        return {"type": "dv_set", "name": self.name,
                "values": list(self.values), "boost": self.boost}


@dataclass(frozen=True)
class RangeFieldQuery(Query):
    """document/RangeFieldQuery.java:73 (DoubleRange/LongRange range
    FIELDS): every doc carries a [min, max] range (two numeric DV
    features here); the query range [lower, upper] matches by
    ``relation``:

    * ``intersects`` — doc.max >= lower and doc.min <= upper;
    * ``within``     — the doc range lies inside the query range;
    * ``contains``   — the doc range contains the query range;
    * ``crosses``    — intersects and NOT within
      (RangeFieldQuery.java:260 — the doc-level matches() composition).

    Constant score = boost; one vectorized column comparison per
    segment (the reference walks its BKD tree to the same predicate)."""

    min_feature: str
    max_feature: str
    lower: float
    upper: float
    relation: str = "intersects"
    boost: float = 1.0

    def to_dict(self):
        return {"type": "range_field", "min_feature": self.min_feature,
                "max_feature": self.max_feature, "lower": self.lower,
                "upper": self.upper, "relation": self.relation,
                "boost": self.boost}


@dataclass(frozen=True)
class SpanPayloadCheckQuery(Query):
    """queries/payloads/SpanPayloadCheckQuery.java:54: an exact-phrase
    span of ``terms`` is accepted only when the payload at EACH of its
    positions equals the expected ``payloads`` sequence (the reference
    compares byte payloads via its PayloadMatcher; this build path's
    payloads are the DelimitedPayloadTokenFilter floats). Constant
    score = boost over docs with >= 1 accepted span;
    ``Searcher.payload_check_freqs`` exposes the per-doc span counts."""

    terms: tuple
    payloads: tuple  # expected float payload per slot, len == len(terms)
    boost: float = 1.0
    field: str | None = None

    def to_dict(self):
        return {"type": "payload_check", "terms": list(self.terms),
                "payloads": list(self.payloads), "boost": self.boost,
                "field": self.field}


@dataclass(frozen=True)
class ScoringRewriteQuery(Query):
    """MultiTermQuery.SCORING_BOOLEAN_REWRITE
    (search/MultiTermQuery.java:86 ``SCORING_BOOLEAN_QUERY_REWRITE`` /
    ScoringRewrite.java:39): instead of the default constant-score doc
    union, the wrapped multi-term query rewrites — against the
    TOP-LEVEL reader's dictionary, like Query.rewrite(IndexSearcher) —
    into a BooleanQuery of SHOULD TermQueries, each BM25-scored with
    its own global stats. The rewrite happens in ``Searcher._prep``
    (the per-search rewrite step); the query reaching evaluation has
    already dissolved."""

    query: Query  # a Prefix/Wildcard/Regexp/Fuzzy/TermRange/TermInSet query

    def to_dict(self):
        return {"type": "scoring_rewrite", "query": self.query.to_dict()}


@dataclass(frozen=True)
class FunctionRangeQuery(Query):
    """queries/function/FunctionRangeQuery.java:44 (+
    ValueSourceScorer.java:39): match docs where a computed function of
    per-doc numeric doc values lies in [lower, upper]; like the
    reference's ValueSourceScorer the SCORE IS the function value
    (× boost). ``expression`` is a search/expressions.py arithmetic
    expression whose variables are the ``features`` (feat_ DV names) —
    the DoubleValuesSource analog. Missing feature column -> no matches."""

    expression: str
    features: tuple  # tuple[str, ...] feat_ DV names used as variables
    lower: "float | None" = None
    upper: "float | None" = None
    boost: float = 1.0

    def to_dict(self):
        return {"type": "function_range", "expression": self.expression,
                "features": list(self.features), "lower": self.lower,
                "upper": self.upper, "boost": self.boost}


@dataclass(frozen=True)
class DocValuesMultiRangeQuery(Query):
    """sandbox/search/SortedNumericDocValuesMultiRangeQuery.java:49 (built
    via DocValuesMultiRangeQuery.java:35's builder): match docs whose
    numeric DV ``feature`` falls in ANY of the [lower, upper] ``ranges``
    — the reference sorts and merges overlapping clauses into disjoint
    intervals before matching; scoring._dv_mask does the same, then one
    vectorized searchsorted per column. Constant score = boost."""

    feature: str
    ranges: tuple  # tuple[tuple[float, float], ...] inclusive bounds
    boost: float = 1.0

    def to_dict(self):
        return {"type": "dv_multi_range", "feature": self.feature,
                "ranges": [list(r) for r in self.ranges],
                "boost": self.boost}


@dataclass(frozen=True)
class IndexOrDocValuesQuery(Query):
    """search/IndexOrDocValuesQuery.java:68 — two execution plans of the
    SAME predicate: an index-driven query (cheap to iterate all matches)
    and a doc-values query (cheap to verify a given doc). The reference
    picks per-segment by lead cost (ScorerSupplier.get(leadCost)); this
    engine's analog: evaluated standalone (it must produce the full doc
    set) it runs ``index_query``; as a FILTER clause of a conjunction
    that already has lead candidates it verifies only those candidates
    through ``dv_query``'s column (scoring.py ``_dv_mask_at``). The two
    sub-queries MUST match the same docs — that is the caller's contract,
    exactly as in the reference."""

    index_query: Query
    dv_query: Query

    def to_dict(self):
        return {"type": "index_or_dv",
                "index_query": self.index_query.to_dict(),
                "dv_query": self.dv_query.to_dict()}


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """search/DisjunctionMaxQuery.java — union of disjuncts scored as
    max(sub scores) + tie_breaker * (sum of the other matching subs)."""

    queries: tuple
    tie_breaker: float = 0.0
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "dis_max",
            "queries": [q.to_dict() for q in self.queries],
            "tie_breaker": self.tie_breaker,
            "boost": self.boost,
        }


def query_from_dict(d: dict) -> Query:
    t = d["type"]
    if t == "term":
        return TermQuery(d["term"], d.get("boost", 1.0), d.get("field"))
    if t == "bool":
        return BooleanQuery(
            must=tuple(query_from_dict(q) for q in d.get("must", [])),
            should=tuple(query_from_dict(q) for q in d.get("should", [])),
            must_not=tuple(query_from_dict(q) for q in d.get("must_not", [])),
            filter=tuple(query_from_dict(q) for q in d.get("filter", [])),
            minimum_should_match=d.get("minimum_should_match", 0),
            boost=d.get("boost", 1.0),
        )
    if t == "phrase":
        return PhraseQuery(tuple(d["terms"]), d.get("slop", 0), d.get("boost", 1.0),
                           d.get("field"))
    if t == "synonym":
        return SynonymQuery(tuple(d["terms"]), d.get("boost", 1.0), d.get("field"))
    if t == "blended_term":
        return BlendedTermQuery(
            tuple(d["terms"]), d.get("tie_breaker", 0.01),
            d.get("boost", 1.0), d.get("field"),
        )
    if t == "prefix":
        return PrefixQuery(d["prefix"], d.get("boost", 1.0), d.get("field"))
    if t == "wildcard":
        return WildcardQuery(d["pattern"], d.get("boost", 1.0), d.get("field"))
    if t == "regexp":
        return RegexpQuery(d["pattern"], d.get("boost", 1.0), d.get("field"))
    if t == "fuzzy":
        return FuzzyQuery(
            d["term"], d.get("max_edits", 2), d.get("prefix_length", 0),
            d.get("transpositions", True), d.get("boost", 1.0), d.get("field")
        )
    if t == "range":
        return TermRangeQuery(
            d.get("lower"), d.get("upper"),
            d.get("include_lower", True), d.get("include_upper", True),
            d.get("boost", 1.0), d.get("field"),
        )
    if t == "in_set":
        return TermInSetQuery(tuple(d["terms"]), d.get("boost", 1.0), d.get("field"))
    if t == "span_near":
        return SpanNearQuery(
            tuple(d["terms"]), d.get("slop", 0), d.get("in_order", True),
            d.get("boost", 1.0), d.get("field"),
        )
    if t == "intervals":
        from lucene_ray.search.intervals import source_from_dict

        return IntervalQuery(
            source_from_dict(d["source"]), d.get("boost", 1.0), d.get("field"),
            d.get("score_mode", "constant"), d.get("pivot", 1.0),
        )
    if t == "combined_field":
        return CombinedFieldQuery(
            tuple(d["terms"]),
            tuple((f, float(w)) for f, w in d["fields"]),
            d.get("boost", 1.0),
        )
    if t == "match_all":
        return MatchAllDocsQuery(d.get("boost", 1.0))
    if t == "field_exists":
        return FieldExistsQuery(d.get("field"), d.get("boost", 1.0))
    if t == "match_none":
        return MatchNoDocsQuery()
    if t == "phrase_wildcard":
        return PhraseWildcardQuery(
            tuple(d["slots"]), d.get("max_expansions", 128),
            d.get("boost", 1.0), d.get("field"),
        )
    if t == "const":
        return ConstantScoreQuery(query_from_dict(d["query"]), d.get("boost", 1.0))
    if t == "boost":
        return BoostQuery(query_from_dict(d["query"]), d["boost"])
    if t == "dis_max":
        return DisjunctionMaxQuery(
            tuple(query_from_dict(q) for q in d["queries"]),
            d.get("tie_breaker", 0.0),
            d.get("boost", 1.0),
        )
    if t == "covering":
        return CoveringQuery(
            tuple(query_from_dict(q) for q in d["queries"]),
            d.get("min_match_feature"),
            d.get("min_match", 1),
            d.get("boost", 1.0),
        )
    if t == "multi_phrase":
        return MultiPhraseQuery(
            tuple(tuple(p) for p in d["positions"]), d.get("boost", 1.0),
            d.get("field"),
        )
    if t == "feature":
        return FeatureQuery(
            d["feature"], d.get("function", "saturation"),
            d.get("pivot", 1.0), d.get("a", 1.0), d.get("boost", 1.0),
        )
    if t == "distance_feature":
        return DistanceFeatureQuery(
            d["feature"], d["origin"], d["pivot"], d.get("boost", 1.0)
        )
    if t == "payload_score":
        return PayloadScoreQuery(
            d["term"], d.get("function", "sum"),
            d.get("include_span_score", False), d.get("boost", 1.0),
            d.get("field"),
        )
    if t == "common_terms":
        return CommonTermsQuery(
            tuple(d["terms"]), d.get("max_doc_freq", 1000), d.get("boost", 1.0)
        )
    if t == "dv_range":
        return DocValuesRangeQuery(
            d["feature"], d.get("lower"), d.get("upper"), d.get("boost", 1.0)
        )
    if t == "dv_set":
        return DocValuesSetQuery(
            d["name"], tuple(d["values"]), d.get("boost", 1.0)
        )
    if t == "dv_multi_range":
        return DocValuesMultiRangeQuery(
            d["feature"], tuple(tuple(r) for r in d["ranges"]),
            d.get("boost", 1.0),
        )
    if t == "range_field":
        return RangeFieldQuery(
            d["min_feature"], d["max_feature"], d["lower"], d["upper"],
            d.get("relation", "intersects"), d.get("boost", 1.0),
        )
    if t == "payload_check":
        return SpanPayloadCheckQuery(
            tuple(d["terms"]), tuple(d["payloads"]), d.get("boost", 1.0),
            d.get("field"),
        )
    if t == "scoring_rewrite":
        return ScoringRewriteQuery(query_from_dict(d["query"]))
    if t == "function_range":
        return FunctionRangeQuery(
            d["expression"], tuple(d["features"]), d.get("lower"),
            d.get("upper"), d.get("boost", 1.0),
        )
    if t == "index_or_dv":
        return IndexOrDocValuesQuery(
            query_from_dict(d["index_query"]), query_from_dict(d["dv_query"])
        )
    raise ValueError(f"unknown query type {t}")


def collect_scored_terms(q: Query, out: set[str]) -> None:
    """Storage keys whose global (df, ttf) stats the scorers need.

    Run AFTER :func:`resolve_fields` so field-scoped terms are already
    storage keys; CombinedFieldQuery keeps (field, term) pairs and expands
    here."""
    if isinstance(q, TermQuery):
        out.add(q.term)
    elif isinstance(q, (PhraseQuery, SynonymQuery, SpanNearQuery,
                        BlendedTermQuery)):
        out.update(q.terms)
    elif isinstance(q, BooleanQuery):
        for sub in (*q.must, *q.should, *q.must_not, *q.filter):
            collect_scored_terms(sub, out)
    elif isinstance(q, (ConstantScoreQuery, BoostQuery)):
        collect_scored_terms(q.query, out)
    elif isinstance(q, (DisjunctionMaxQuery, CoveringQuery)):
        for sub in q.queries:
            collect_scored_terms(sub, out)
    elif isinstance(q, MultiPhraseQuery):
        for p in q.positions:
            out.update(p)
    elif isinstance(q, PhraseWildcardQuery):
        # concrete slots only: wildcard expansions are per-segment and
        # deliberately carry no idf (see the query docstring)
        q.leaf_terms(out)
    elif isinstance(q, CommonTermsQuery):
        out.update(q.terms)
    elif isinstance(q, PayloadScoreQuery):
        if q.include_span_score:
            out.add(q.term)
    elif isinstance(q, IndexOrDocValuesQuery):
        collect_scored_terms(q.index_query, out)
        collect_scored_terms(q.dv_query, out)
    elif isinstance(q, CombinedFieldQuery):
        from lucene_ray.index.fields import field_key

        for f, _w in q.fields:
            for t in q.terms:
                out.add(field_key(f, t))


def resolve_fields(q: Query) -> Query:
    """Rewrite field-scoped queries into storage-key form: every term of a
    query with ``field=F`` becomes its ``\\x01F\\x1f``-prefixed dictionary
    key and ``field`` resets to None, so the whole evaluation layer works
    on plain keys. Idempotent; queries without fields pass through
    unchanged. CombinedFieldQuery is left intact (its evaluator needs the
    (field, term) structure)."""
    import dataclasses

    from lucene_ray.index.fields import field_key, field_prefix

    if isinstance(q, (TermQuery, PayloadScoreQuery)) and q.field:
        return dataclasses.replace(q, term=field_key(q.field, q.term), field=None)
    if isinstance(q, (PhraseQuery, SynonymQuery, TermInSetQuery, SpanNearQuery,
                      BlendedTermQuery, SpanPayloadCheckQuery)) and q.field:
        return dataclasses.replace(
            q, terms=tuple(field_key(q.field, t) for t in q.terms), field=None
        )
    if isinstance(q, PrefixQuery) and q.field:
        return dataclasses.replace(
            q, prefix=field_prefix(q.field) + q.prefix, field=None
        )
    if isinstance(q, FuzzyQuery) and q.field:
        return q  # handled field-aware in _fuzzy_expand (band over section)
    if isinstance(q, (WildcardQuery, RegexpQuery)) and q.field:
        return q  # handled field-aware in _eval_multiterm (section scan)
    if isinstance(q, TermRangeQuery) and q.field:
        pref = field_prefix(q.field)
        lower = pref + q.lower if q.lower is not None else pref
        # open upper bound must cap the WHOLE field section, including
        # astral-plane terms (CJK Ext-B ideographs sort above ￿)
        upper = pref + q.upper if q.upper is not None else pref + chr(0x10FFFF)
        return dataclasses.replace(q, lower=lower, upper=upper, field=None)
    if isinstance(q, PhraseWildcardQuery) and q.field:
        # pattern or concrete, the slot rekeys the same way: the field
        # marker prefixes the whole term part (wildcards stay in place;
        # expand_wildcard_slots splits the key back apart)
        return dataclasses.replace(
            q,
            slots=tuple(field_key(q.field, s) for s in q.slots),
            field=None,
        )
    if isinstance(q, MultiPhraseQuery) and q.field:
        return dataclasses.replace(
            q,
            positions=tuple(
                tuple(field_key(q.field, t) for t in p) for p in q.positions
            ),
            field=None,
        )
    if isinstance(q, BooleanQuery):
        return dataclasses.replace(
            q,
            must=tuple(resolve_fields(s) for s in q.must),
            should=tuple(resolve_fields(s) for s in q.should),
            must_not=tuple(resolve_fields(s) for s in q.must_not),
            filter=tuple(resolve_fields(s) for s in q.filter),
        )
    if isinstance(q, IntervalQuery) and q.field:
        from lucene_ray.search.intervals import rewrite_terms

        fld = q.field
        return dataclasses.replace(
            q, source=rewrite_terms(q.source, lambda t: field_key(fld, t)),
            field=None,
        )
    if isinstance(q, (ConstantScoreQuery, BoostQuery)):
        return dataclasses.replace(q, query=resolve_fields(q.query))
    if isinstance(q, (DisjunctionMaxQuery, CoveringQuery)):
        return dataclasses.replace(
            q, queries=tuple(resolve_fields(s) for s in q.queries)
        )
    if isinstance(q, IndexOrDocValuesQuery):
        return dataclasses.replace(
            q, index_query=resolve_fields(q.index_query),
            dv_query=resolve_fields(q.dv_query),
        )
    if isinstance(q, ScoringRewriteQuery):
        return dataclasses.replace(q, query=resolve_fields(q.query))
    return q
