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
    """search/TermQuery.java:39 — single-term BM25-scored posting scan."""

    term: str
    boost: float = 1.0

    def to_dict(self):
        return {"type": "term", "term": self.term, "boost": self.boost}


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

    def to_dict(self):
        return {
            "type": "phrase",
            "terms": list(self.terms),
            "slop": self.slop,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class SynonymQuery(Query):
    """search/SynonymQuery.java:52 — terms scored as one pseudo-term:
    df = max over terms, ttf = sum, freq = sum of per-term freqs."""

    terms: tuple
    boost: float = 1.0

    def to_dict(self):
        return {"type": "synonym", "terms": list(self.terms), "boost": self.boost}


@dataclass(frozen=True)
class PrefixQuery(Query):
    """search/PrefixQuery.java — constant-score multi-term expansion."""

    prefix: str
    boost: float = 1.0

    def to_dict(self):
        return {"type": "prefix", "prefix": self.prefix, "boost": self.boost}


@dataclass(frozen=True)
class WildcardQuery(Query):
    """search/WildcardQuery.java:38 — '*' and '?' over the term dict."""

    pattern: str
    boost: float = 1.0

    def to_dict(self):
        return {"type": "wildcard", "pattern": self.pattern, "boost": self.boost}


@dataclass(frozen=True)
class RegexpQuery(Query):
    """search/RegexpQuery.java — anchored regex over the term dict."""

    pattern: str
    boost: float = 1.0

    def to_dict(self):
        return {"type": "regexp", "pattern": self.pattern, "boost": self.boost}


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """search/FuzzyQuery.java:27-50 — terms within edit distance
    ``max_edits`` (default 2, optional transpositions like the reference)."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    transpositions: bool = True  # Damerau (reference default) vs plain Levenshtein
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "fuzzy",
            "term": self.term,
            "max_edits": self.max_edits,
            "prefix_length": self.prefix_length,
            "transpositions": self.transpositions,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """search/TermRangeQuery.java — lexicographic term range."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0

    def to_dict(self):
        return {
            "type": "range",
            "lower": self.lower,
            "upper": self.upper,
            "include_lower": self.include_lower,
            "include_upper": self.include_upper,
            "boost": self.boost,
        }


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """search/TermInSetQuery.java:73 — doc matches if it contains any of the
    terms; constant score."""

    terms: tuple
    boost: float = 1.0

    def to_dict(self):
        return {"type": "in_set", "terms": list(self.terms), "boost": self.boost}


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    """search/MatchAllDocsQuery.java — every doc, score = boost."""

    boost: float = 1.0

    def to_dict(self):
        return {"type": "match_all", "boost": self.boost}


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

    def to_dict(self):
        return {
            "type": "multi_phrase",
            "positions": [list(p) for p in self.positions],
            "boost": self.boost,
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
        return TermQuery(d["term"], d.get("boost", 1.0))
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
        return PhraseQuery(tuple(d["terms"]), d.get("slop", 0), d.get("boost", 1.0))
    if t == "synonym":
        return SynonymQuery(tuple(d["terms"]), d.get("boost", 1.0))
    if t == "prefix":
        return PrefixQuery(d["prefix"], d.get("boost", 1.0))
    if t == "wildcard":
        return WildcardQuery(d["pattern"], d.get("boost", 1.0))
    if t == "regexp":
        return RegexpQuery(d["pattern"], d.get("boost", 1.0))
    if t == "fuzzy":
        return FuzzyQuery(
            d["term"], d.get("max_edits", 2), d.get("prefix_length", 0),
            d.get("transpositions", True), d.get("boost", 1.0)
        )
    if t == "range":
        return TermRangeQuery(
            d.get("lower"), d.get("upper"),
            d.get("include_lower", True), d.get("include_upper", True), d.get("boost", 1.0),
        )
    if t == "in_set":
        return TermInSetQuery(tuple(d["terms"]), d.get("boost", 1.0))
    if t == "match_all":
        return MatchAllDocsQuery(d.get("boost", 1.0))
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
    if t == "multi_phrase":
        return MultiPhraseQuery(
            tuple(tuple(p) for p in d["positions"]), d.get("boost", 1.0)
        )
    if t == "common_terms":
        return CommonTermsQuery(
            tuple(d["terms"]), d.get("max_doc_freq", 1000), d.get("boost", 1.0)
        )
    raise ValueError(f"unknown query type {t}")


def collect_scored_terms(q: Query, out: set[str]) -> None:
    """Terms whose global (df, ttf) stats the scorers need."""
    if isinstance(q, TermQuery):
        out.add(q.term)
    elif isinstance(q, (PhraseQuery, SynonymQuery)):
        out.update(q.terms)
    elif isinstance(q, BooleanQuery):
        for sub in (*q.must, *q.should, *q.must_not, *q.filter):
            collect_scored_terms(sub, out)
    elif isinstance(q, (ConstantScoreQuery, BoostQuery)):
        collect_scored_terms(q.query, out)
    elif isinstance(q, DisjunctionMaxQuery):
        for sub in q.queries:
            collect_scored_terms(sub, out)
    elif isinstance(q, MultiPhraseQuery):
        for p in q.positions:
            out.update(p)
    elif isinstance(q, CommonTermsQuery):
        out.update(q.terms)
