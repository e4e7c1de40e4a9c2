"""Minimal-interval algebra over the persisted positions columns — the
queries/intervals module role (queries/intervals/Intervals.java:56,
IntervalQuery.java): composable sources producing per-document
(start, end) intervals, combined with ordered / unordered (+ maxgaps),
``or``, ``containing`` and ``containedBy``.

Ray-Data-first evaluation: a source evaluates per segment to three flat
numpy arrays (doc, start, end) sorted by (doc, start, end) — ONE
positions-table read for all leaf terms, then pure vectorized array
algebra (fused doc<<32|pos keys + searchsorted, the same machinery as the
phrase/span matchers). No per-doc Python loops:

* ``Ordered``  — left-fold: for every left interval, the earliest
  right interval starting after it (greedy earliest-next; exact for term
  leaves, where start==end, because later start implies later end).
* ``Unordered`` (2 sources) — for every left interval, its predecessor
  and successor right intervals both become candidates (overlaps allowed,
  the Intervals.unordered contract); exact for term leaves (both
  directions examined).  n>2 runs the EXACT smallest-window sweep
  (``_unordered_exact``: per-source segmented running-max scans + a
  minimality filter — vectorized equivalent of the reference's
  priority-queue walk; cov/gaps exact for term leaves).
* ``UnorderedNoOverlaps`` — the 2-arg no-overlap variant: nearest
  entirely-before and first-starting-after candidates (an overlapping
  same-start b cannot occlude the true successor).
* ``Containing`` — per-doc suffix-min of contained-candidate ends:
  ``big [s,e]`` contains some small iff the minimal small-end at the
  first small starting >= s is <= e (starts ascending makes this exact).
* ``ContainedBy`` — per-doc prefix-max of container ends, symmetric.

Gap accounting: every interval carries ``cov`` (tokens covered by its
leaves), so ``gaps = width - cov`` filters exactly for term leaves —
the Intervals.maxgaps contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_SHIFT = np.int64(1) << np.int64(32)
_POS_MASK = _SHIFT - np.int64(1)


# --------------------------------------------------------------------------
# sources (dataclass tree, mirrors Intervals.* factory methods)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class IntervalsSource:
    def leaf_terms(self, out: set):
        raise NotImplementedError

    def to_dict(self) -> dict:
        raise NotImplementedError


@dataclass(frozen=True)
class Term(IntervalsSource):
    term: str

    def leaf_terms(self, out: set):
        out.add(self.term)

    def to_dict(self):
        return {"type": "term", "term": self.term}


@dataclass(frozen=True)
class Ordered(IntervalsSource):
    """Intervals.ordered(...) — sub-intervals in order, non-overlapping;
    ``maxgaps`` bounds width - covered (Intervals.maxgaps wrapping)."""

    sources: tuple
    maxgaps: int = -1  # -1 = unlimited

    def leaf_terms(self, out: set):
        for s in self.sources:
            s.leaf_terms(out)

    def to_dict(self):
        return {"type": "ordered", "maxgaps": self.maxgaps,
                "sources": [s.to_dict() for s in self.sources]}


@dataclass(frozen=True)
class Unordered(IntervalsSource):
    """Intervals.unordered(...) — sub-intervals in any order; overlapping
    sub-intervals ARE allowed (Intervals.java:130; the no-overlap variant
    is the separate :class:`UnorderedNoOverlaps` factory)."""

    sources: tuple
    maxgaps: int = -1

    def leaf_terms(self, out: set):
        for s in self.sources:
            s.leaf_terms(out)

    def to_dict(self):
        return {"type": "unordered", "maxgaps": self.maxgaps,
                "sources": [s.to_dict() for s in self.sources]}


@dataclass(frozen=True)
class UnorderedNoOverlaps(IntervalsSource):
    """Intervals.unorderedNoOverlaps(a, b) — both sub-intervals in any
    order, NOT sharing any position (Intervals.java:141; two sources,
    matching the reference factory's arity)."""

    a: IntervalsSource
    b: IntervalsSource
    maxgaps: int = -1

    def leaf_terms(self, out: set):
        self.a.leaf_terms(out)
        self.b.leaf_terms(out)

    def to_dict(self):
        return {"type": "unordered_no_overlaps", "maxgaps": self.maxgaps,
                "a": self.a.to_dict(), "b": self.b.to_dict()}


@dataclass(frozen=True)
class Or(IntervalsSource):
    sources: tuple

    def leaf_terms(self, out: set):
        for s in self.sources:
            s.leaf_terms(out)

    def to_dict(self):
        return {"type": "or", "sources": [s.to_dict() for s in self.sources]}


@dataclass(frozen=True)
class Containing(IntervalsSource):
    """Intervals.containing(big, small): big's intervals that contain at
    least one small interval."""

    big: IntervalsSource
    small: IntervalsSource

    def leaf_terms(self, out: set):
        self.big.leaf_terms(out)
        self.small.leaf_terms(out)

    def to_dict(self):
        return {"type": "containing", "big": self.big.to_dict(),
                "small": self.small.to_dict()}


@dataclass(frozen=True)
class NotContaining(IntervalsSource):
    """Intervals.notContaining(minuend, subtrahend): minuend's intervals
    that contain NO subtrahend interval."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def leaf_terms(self, out: set):
        self.minuend.leaf_terms(out)
        self.subtrahend.leaf_terms(out)

    def to_dict(self):
        return {"type": "not_containing", "minuend": self.minuend.to_dict(),
                "subtrahend": self.subtrahend.to_dict()}


@dataclass(frozen=True)
class NotContainedBy(IntervalsSource):
    """Intervals.notContainedBy(small, big): small's intervals that lie
    inside NO big interval."""

    small: IntervalsSource
    big: IntervalsSource

    def leaf_terms(self, out: set):
        self.small.leaf_terms(out)
        self.big.leaf_terms(out)

    def to_dict(self):
        return {"type": "not_contained_by", "small": self.small.to_dict(),
                "big": self.big.to_dict()}


@dataclass(frozen=True)
class MaxWidth(IntervalsSource):
    """Intervals.maxwidth(width, source): only intervals spanning at most
    ``width`` positions."""

    source: IntervalsSource
    width: int

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)

    def to_dict(self):
        return {"type": "maxwidth", "width": self.width,
                "source": self.source.to_dict()}


@dataclass(frozen=True)
class ContainedBy(IntervalsSource):
    """Intervals.containedBy(small, big): small's intervals that lie
    inside at least one big interval."""

    small: IntervalsSource
    big: IntervalsSource

    def leaf_terms(self, out: set):
        self.small.leaf_terms(out)
        self.big.leaf_terms(out)

    def to_dict(self):
        return {"type": "contained_by", "small": self.small.to_dict(),
                "big": self.big.to_dict()}


@dataclass(frozen=True)
class Prefix(IntervalsSource):
    """Intervals.prefix (queries/intervals/Intervals.java:180): matches
    any dictionary term starting with ``prefix``. Expanded PER SEGMENT
    into an Or of term leaves before evaluation (the reference compiles
    an automaton and expands against each leaf's terms), capped at
    ``max_expansions`` like the reference's 128 default — expansion past
    the cap raises, matching IllegalStateException semantics."""

    prefix: str
    max_expansions: int = 128

    def leaf_terms(self, out: set):
        raise RuntimeError(
            "Prefix source must be expanded per segment before leaf "
            "collection (eval_intervals does this)")

    def to_dict(self):
        return {"type": "prefix_iv", "prefix": self.prefix,
                "max_expansions": self.max_expansions}


@dataclass(frozen=True)
class Wildcard(IntervalsSource):
    """Intervals.wildcard (queries/intervals/Intervals.java:139): the
    '*'/'?' multi-term leaf — expanded per segment against the
    dictionary into an Or of term leaves, capped at ``max_expansions``
    (same contract as Prefix)."""

    pattern: str
    max_expansions: int = 128

    def leaf_terms(self, out: set):
        raise RuntimeError(
            "Wildcard source must be expanded per segment before leaf "
            "collection (eval_intervals does this)")

    def to_dict(self):
        return {"type": "wildcard_iv", "pattern": self.pattern,
                "max_expansions": self.max_expansions}


@dataclass(frozen=True)
class FuzzyTerm(IntervalsSource):
    """Intervals.fuzzyTerm (queries/intervals/Intervals.java:155): the
    edit-distance multi-term leaf — expanded per segment against the
    dictionary via the banded Levenshtein scan (same accepted set as
    the reference's automaton), capped at ``max_expansions``."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    max_expansions: int = 128

    def leaf_terms(self, out: set):
        raise RuntimeError(
            "FuzzyTerm source must be expanded per segment before leaf "
            "collection (eval_intervals does this)")

    def to_dict(self):
        return {"type": "fuzzy_iv", "term": self.term,
                "max_edits": self.max_edits,
                "prefix_length": self.prefix_length,
                "max_expansions": self.max_expansions}


@dataclass(frozen=True)
class Regexp(IntervalsSource):
    """Intervals.regexp (queries/intervals/Intervals.java:117): the
    regular-expression multi-term leaf — expanded per segment against
    the dictionary into an Or of term leaves, capped at
    ``max_expansions`` (same contract as Prefix/Wildcard)."""

    pattern: str
    max_expansions: int = 128

    def leaf_terms(self, out: set):
        raise RuntimeError(
            "Regexp source must be expanded per segment before leaf "
            "collection (eval_intervals does this)")

    def to_dict(self):
        return {"type": "regexp_iv", "pattern": self.pattern,
                "max_expansions": self.max_expansions}


@dataclass(frozen=True)
class Range(IntervalsSource):
    """Intervals.range (queries/intervals/Intervals.java:222): the
    term-range multi-term leaf [lower, upper] — expanded per segment via
    the sorted dictionary (TermRangeQuery's scan), capped at
    ``max_expansions``."""

    lower: "str | None"
    upper: "str | None"
    include_lower: bool = True
    include_upper: bool = True
    max_expansions: int = 128

    def leaf_terms(self, out: set):
        raise RuntimeError(
            "Range source must be expanded per segment before leaf "
            "collection (eval_intervals does this)")

    def to_dict(self):
        return {"type": "range_iv", "lower": self.lower,
                "upper": self.upper, "include_lower": self.include_lower,
                "include_upper": self.include_upper,
                "max_expansions": self.max_expansions}


@dataclass(frozen=True)
class AtLeast(IntervalsSource):
    """Intervals.atLeast (queries/intervals/Intervals.java:89 ->
    MinimumShouldMatchIntervalsSource): minimal intervals containing
    intervals from at least ``min_should_match`` DISTINCT sub-sources.
    Evaluated as the union of exact-unordered windows over every
    m-subset of the sources, then reduced to minimal intervals (the
    reference's iterators only ever emit minimal intervals). The
    C(n, m) subset count is guarded — ``atLeast`` is meant for small
    source lists, like the reference's."""

    min_should_match: int
    sources: tuple

    def leaf_terms(self, out: set):
        for s in self.sources:
            s.leaf_terms(out)

    def to_dict(self):
        return {"type": "at_least",
                "min_should_match": self.min_should_match,
                "sources": [s.to_dict() for s in self.sources]}


@dataclass(frozen=True)
class Overlapping(IntervalsSource):
    """Intervals.overlapping (queries/intervals/Intervals.java:196):
    intervals of ``source`` that OVERLAP some ``reference`` interval —
    the complement filter of NonOverlapping."""

    source: IntervalsSource
    reference: IntervalsSource

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)
        self.reference.leaf_terms(out)

    def to_dict(self):
        return {"type": "overlapping", "source": self.source.to_dict(),
                "reference": self.reference.to_dict()}


@dataclass(frozen=True)
class First(IntervalsSource):
    """SpanFirstQuery semantics (queries/spans/SpanFirstQuery.java:38):
    intervals of ``source`` that END before position ``n`` (i.e. fully
    inside the first ``n`` tokens of the document)."""

    source: IntervalsSource
    n: int

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)

    def to_dict(self):
        return {"type": "first", "n": self.n,
                "source": self.source.to_dict()}


@dataclass(frozen=True)
class NonOverlapping(IntervalsSource):
    """Intervals.nonOverlapping (search/intervals/Intervals.java:189 —
    the SpanNotQuery role, queries/spans/SpanNotQuery.java:33):
    intervals of ``minuend`` that do not OVERLAP any interval of
    ``subtrahend``. Stricter than NotContaining: a subtrahend interval
    straddling the minuend's edge kills it here but survives there."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def leaf_terms(self, out: set):
        self.minuend.leaf_terms(out)
        self.subtrahend.leaf_terms(out)

    def to_dict(self):
        return {"type": "non_overlapping",
                "minuend": self.minuend.to_dict(),
                "subtrahend": self.subtrahend.to_dict()}


@dataclass(frozen=True)
class Before(IntervalsSource):
    """Intervals.before (queries/intervals/Intervals.java:579): intervals
    of ``source`` that END before the START of some ``reference``
    interval in the same document."""

    source: IntervalsSource
    reference: IntervalsSource

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)
        self.reference.leaf_terms(out)

    def to_dict(self):
        return {"type": "before", "source": self.source.to_dict(),
                "reference": self.reference.to_dict()}


@dataclass(frozen=True)
class After(IntervalsSource):
    """Intervals.after (queries/intervals/Intervals.java:585): intervals
    of ``source`` that START after the END of some ``reference``
    interval in the same document."""

    source: IntervalsSource
    reference: IntervalsSource

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)
        self.reference.leaf_terms(out)

    def to_dict(self):
        return {"type": "after", "source": self.source.to_dict(),
                "reference": self.reference.to_dict()}


@dataclass(frozen=True)
class Extend(IntervalsSource):
    """Intervals.extend / ExtendedIntervalsSource (queries/intervals/
    Intervals.java:409): widen every interval by ``before`` positions
    on the left (clamped at 0) and ``after`` on the right."""

    source: IntervalsSource
    before: int
    after: int

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)

    def to_dict(self):
        return {"type": "extend", "source": self.source.to_dict(),
                "before": self.before, "after": self.after}


@dataclass(frozen=True)
class PositionRange(IntervalsSource):
    """SpanPositionRangeQuery semantics (queries/spans/
    SpanPositionRangeQuery.java:29): intervals of ``source`` lying
    fully inside positions [lo, hi) — start >= lo and end < hi.
    First(n) is the lo=0 special case."""

    source: IntervalsSource
    lo: int
    hi: int

    def leaf_terms(self, out: set):
        self.source.leaf_terms(out)

    def to_dict(self):
        return {"type": "position_range", "lo": self.lo, "hi": self.hi,
                "source": self.source.to_dict()}


def phrase(*terms: str) -> Ordered:
    """Intervals.phrase — ordered with zero gaps."""
    return Ordered(tuple(Term(t) for t in terms), maxgaps=0)


def not_within(minuend: IntervalsSource, positions: int,
               subtrahend: IntervalsSource) -> NonOverlapping:
    """Intervals.notWithin (queries/intervals/Intervals.java:268):
    minuend intervals with NO subtrahend interval within ``positions``
    of them — exactly the reference's composition
    nonOverlapping(minuend, extend(subtrahend, positions, positions))."""
    return NonOverlapping(minuend, Extend(subtrahend, positions, positions))


def analyzed_text(text: str, analyzer=None, maxgaps: int = 0,
                  ordered: bool = True) -> IntervalsSource:
    """Intervals.analyzedText (queries/intervals/Intervals.java:99):
    analyze free text with the (default Standard) analyzer and build an
    ordered/unordered source over the resulting term leaves — the
    query-side entry point for 'match this phrase-ish text'."""
    from lucene_ray.analysis.analyzers import StandardAnalyzer

    toks = (analyzer or StandardAnalyzer).tokens(text)
    if not toks:
        return Term("\x00\x00no-match")
    if len(toks) == 1:
        return Term(toks[0])
    leaves = tuple(Term(t) for t in toks)
    return (Ordered(leaves, maxgaps=maxgaps) if ordered
            else Unordered(leaves, maxgaps=maxgaps))


def rewrite_terms(source: IntervalsSource, fn) -> IntervalsSource:
    """Structurally copy ``source`` with every leaf Term mapped through
    ``fn`` — how a field-scoped IntervalQuery resolves its leaves to
    ``\\x01field\\x1f``-prefixed dictionary keys (resolve_fields)."""
    if isinstance(source, Term):
        return Term(fn(source.term))
    if isinstance(source, Ordered):
        return Ordered(tuple(rewrite_terms(s, fn) for s in source.sources),
                       source.maxgaps)
    if isinstance(source, Unordered):
        return Unordered(tuple(rewrite_terms(s, fn) for s in source.sources),
                         source.maxgaps)
    if isinstance(source, UnorderedNoOverlaps):
        return UnorderedNoOverlaps(rewrite_terms(source.a, fn),
                                   rewrite_terms(source.b, fn),
                                   source.maxgaps)
    if isinstance(source, Or):
        return Or(tuple(rewrite_terms(s, fn) for s in source.sources))
    if isinstance(source, Containing):
        return Containing(rewrite_terms(source.big, fn),
                          rewrite_terms(source.small, fn))
    if isinstance(source, ContainedBy):
        return ContainedBy(rewrite_terms(source.small, fn),
                           rewrite_terms(source.big, fn))
    if isinstance(source, NotContaining):
        return NotContaining(rewrite_terms(source.minuend, fn),
                             rewrite_terms(source.subtrahend, fn))
    if isinstance(source, NotContainedBy):
        return NotContainedBy(rewrite_terms(source.small, fn),
                              rewrite_terms(source.big, fn))
    if isinstance(source, MaxWidth):
        return MaxWidth(rewrite_terms(source.source, fn), source.width)
    if isinstance(source, First):
        return First(rewrite_terms(source.source, fn), source.n)
    if isinstance(source, PositionRange):
        return PositionRange(rewrite_terms(source.source, fn),
                             source.lo, source.hi)
    if isinstance(source, NonOverlapping):
        return NonOverlapping(rewrite_terms(source.minuend, fn),
                              rewrite_terms(source.subtrahend, fn))
    if isinstance(source, Before):
        return Before(rewrite_terms(source.source, fn),
                      rewrite_terms(source.reference, fn))
    if isinstance(source, After):
        return After(rewrite_terms(source.source, fn),
                     rewrite_terms(source.reference, fn))
    if isinstance(source, Extend):
        return Extend(rewrite_terms(source.source, fn),
                      source.before, source.after)
    if isinstance(source, Prefix):
        return Prefix(fn(source.prefix), source.max_expansions)
    if isinstance(source, Wildcard):
        return Wildcard(fn(source.pattern), source.max_expansions)
    if isinstance(source, FuzzyTerm):
        return FuzzyTerm(fn(source.term), source.max_edits,
                         source.prefix_length, source.max_expansions)
    if isinstance(source, Overlapping):
        return Overlapping(rewrite_terms(source.source, fn),
                           rewrite_terms(source.reference, fn))
    if isinstance(source, Regexp):
        return Regexp(fn(source.pattern), source.max_expansions)
    if isinstance(source, Range):
        return Range(
            fn(source.lower) if source.lower is not None else None,
            fn(source.upper) if source.upper is not None else None,
            source.include_lower, source.include_upper,
            source.max_expansions)
    if isinstance(source, AtLeast):
        return AtLeast(source.min_should_match,
                       tuple(rewrite_terms(s, fn) for s in source.sources))
    raise TypeError(type(source))


def source_from_dict(d: dict) -> IntervalsSource:
    t = d["type"]
    if t == "term":
        return Term(d["term"])
    if t == "ordered":
        return Ordered(tuple(source_from_dict(s) for s in d["sources"]),
                       d.get("maxgaps", -1))
    if t == "unordered":
        return Unordered(tuple(source_from_dict(s) for s in d["sources"]),
                         d.get("maxgaps", -1))
    if t == "unordered_no_overlaps":
        return UnorderedNoOverlaps(source_from_dict(d["a"]),
                                   source_from_dict(d["b"]),
                                   d.get("maxgaps", -1))
    if t == "or":
        return Or(tuple(source_from_dict(s) for s in d["sources"]))
    if t == "containing":
        return Containing(source_from_dict(d["big"]), source_from_dict(d["small"]))
    if t == "contained_by":
        return ContainedBy(source_from_dict(d["small"]), source_from_dict(d["big"]))
    if t == "not_containing":
        return NotContaining(source_from_dict(d["minuend"]),
                             source_from_dict(d["subtrahend"]))
    if t == "not_contained_by":
        return NotContainedBy(source_from_dict(d["small"]),
                              source_from_dict(d["big"]))
    if t == "maxwidth":
        return MaxWidth(source_from_dict(d["source"]), d["width"])
    if t == "first":
        return First(source_from_dict(d["source"]), d["n"])
    if t == "position_range":
        return PositionRange(source_from_dict(d["source"]),
                             d["lo"], d["hi"])
    if t == "non_overlapping":
        return NonOverlapping(source_from_dict(d["minuend"]),
                              source_from_dict(d["subtrahend"]))
    if t == "before":
        return Before(source_from_dict(d["source"]),
                      source_from_dict(d["reference"]))
    if t == "after":
        return After(source_from_dict(d["source"]),
                     source_from_dict(d["reference"]))
    if t == "extend":
        return Extend(source_from_dict(d["source"]),
                      d["before"], d["after"])
    if t == "prefix_iv":
        return Prefix(d["prefix"], d.get("max_expansions", 128))
    if t == "wildcard_iv":
        return Wildcard(d["pattern"], d.get("max_expansions", 128))
    if t == "fuzzy_iv":
        return FuzzyTerm(d["term"], d.get("max_edits", 2),
                         d.get("prefix_length", 0),
                         d.get("max_expansions", 128))
    if t == "overlapping":
        return Overlapping(source_from_dict(d["source"]),
                           source_from_dict(d["reference"]))
    if t == "regexp_iv":
        return Regexp(d["pattern"], d.get("max_expansions", 128))
    if t == "range_iv":
        return Range(d.get("lower"), d.get("upper"),
                     d.get("include_lower", True),
                     d.get("include_upper", True),
                     d.get("max_expansions", 128))
    if t == "at_least":
        return AtLeast(d["min_should_match"],
                       tuple(source_from_dict(s) for s in d["sources"]))
    raise ValueError(f"unknown intervals source type {t!r}")


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

class _Iv:
    """Flat interval set: parallel arrays sorted by (doc, start, end).
    ``cov`` = tokens covered by the leaves of each interval (for gap
    accounting: gaps = (end - start + 1) - cov)."""

    __slots__ = ("doc", "start", "end", "cov")

    def __init__(self, doc, start, end, cov):
        self.doc, self.start, self.end, self.cov = doc, start, end, cov

    @classmethod
    def empty(cls):
        z = np.empty(0, np.int64)
        return cls(z, z, z, z)

    def sorted(self) -> "_Iv":
        o = np.lexsort((self.end, self.start, self.doc))
        return _Iv(self.doc[o], self.start[o], self.end[o], self.cov[o])

    @property
    def size(self):
        return self.doc.shape[0]


def _positions_per_term(reader, terms: list) -> dict:
    """ONE positions read for all leaf terms -> {term: (doc, pos)} with
    (doc, pos) lexsorted."""
    tbl = reader.positions_table(terms)
    out = {t: (np.empty(0, np.int64), np.empty(0, np.int64)) for t in terms}
    if tbl.num_rows == 0:
        return out
    t_arr = np.asarray(tbl["term"].to_pylist(), dtype=object)
    d_all = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p_all = tbl["pos"].to_numpy().astype(np.int64)
    for t in set(terms):
        sel = t_arr == t
        d, p = d_all[sel], p_all[sel]
        o = np.lexsort((p, d))
        out[t] = (d[o], p[o])
    return out


def _eval(source: IntervalsSource, per_term: dict) -> _Iv:
    if isinstance(source, Term):
        d, p = per_term[source.term]
        return _Iv(d, p, p, np.ones(d.shape[0], np.int64))
    if isinstance(source, Or):
        parts = [_eval(s, per_term) for s in source.sources]
        return _Iv(
            np.concatenate([x.doc for x in parts]),
            np.concatenate([x.start for x in parts]),
            np.concatenate([x.end for x in parts]),
            np.concatenate([x.cov for x in parts]),
        ).sorted()
    if isinstance(source, Ordered):
        return _ordered(source, per_term)
    if isinstance(source, Unordered):
        return _unordered(source, per_term)
    if isinstance(source, UnorderedNoOverlaps):
        return _unordered_no_overlaps(source, per_term)
    if isinstance(source, Containing):
        big = _eval(source.big, per_term)
        keep = _containing_mask(big, _eval(source.small, per_term))
        return _Iv(big.doc[keep], big.start[keep], big.end[keep], big.cov[keep])
    if isinstance(source, ContainedBy):
        small = _eval(source.small, per_term)
        keep = _contained_by_mask(small, _eval(source.big, per_term))
        return _Iv(small.doc[keep], small.start[keep], small.end[keep],
                   small.cov[keep])
    if isinstance(source, NotContaining):
        m = _eval(source.minuend, per_term)
        keep = ~_containing_mask(m, _eval(source.subtrahend, per_term))
        return _Iv(m.doc[keep], m.start[keep], m.end[keep], m.cov[keep])
    if isinstance(source, NotContainedBy):
        s = _eval(source.small, per_term)
        keep = ~_contained_by_mask(s, _eval(source.big, per_term))
        return _Iv(s.doc[keep], s.start[keep], s.end[keep], s.cov[keep])
    if isinstance(source, MaxWidth):
        iv = _eval(source.source, per_term)
        keep = (iv.end - iv.start + 1) <= source.width
        return _Iv(iv.doc[keep], iv.start[keep], iv.end[keep], iv.cov[keep])
    if isinstance(source, First):
        iv = _eval(source.source, per_term)
        keep = iv.end < source.n
        return _Iv(iv.doc[keep], iv.start[keep], iv.end[keep], iv.cov[keep])
    if isinstance(source, PositionRange):
        iv = _eval(source.source, per_term)
        keep = (iv.start >= source.lo) & (iv.end < source.hi)
        return _Iv(iv.doc[keep], iv.start[keep], iv.end[keep], iv.cov[keep])
    if isinstance(source, NonOverlapping):
        m = _eval(source.minuend, per_term)
        s = _eval(source.subtrahend, per_term)
        if m.size == 0 or s.size == 0:
            return m
        keep = ~_overlaps_any(m, s)
        return _Iv(m.doc[keep], m.start[keep], m.end[keep], m.cov[keep])
    if isinstance(source, Overlapping):
        m = _eval(source.source, per_term)
        s = _eval(source.reference, per_term)
        if m.size == 0 or s.size == 0:
            return _Iv.empty()
        keep = _overlaps_any(m, s)
        return _Iv(m.doc[keep], m.start[keep], m.end[keep], m.cov[keep])
    if isinstance(source, (Before, After)):
        m = _eval(source.source, per_term)
        s = _eval(source.reference, per_term)
        if m.size == 0 or s.size == 0:
            return _Iv.empty()
        base = m.doc * _SHIFT
        if isinstance(source, Before):
            # EXISTS reference starting after m.end
            skeys = np.sort(s.doc * _SHIFT + s.start)
            hi = np.searchsorted(skeys, base + _SHIFT)
            keep = (hi - np.searchsorted(
                skeys, base + m.end + np.int64(1))) > 0
        else:
            # EXISTS reference ending before m.start
            ekeys = np.sort(s.doc * _SHIFT + s.end)
            keep = (np.searchsorted(ekeys, base + m.start)
                    - np.searchsorted(ekeys, base)) > 0
        return _Iv(m.doc[keep], m.start[keep], m.end[keep], m.cov[keep])
    if isinstance(source, Extend):
        iv = _eval(source.source, per_term)
        return _Iv(iv.doc,
                   np.maximum(iv.start - np.int64(source.before),
                              np.int64(0)),
                   iv.end + np.int64(source.after), iv.cov)
    if isinstance(source, AtLeast):
        import itertools
        import math

        n = len(source.sources)
        m = int(source.min_should_match)
        if m <= 0 or m > n:
            raise ValueError(f"atLeast({m}) over {n} sources")
        if math.comb(n, m) > 64:
            raise ValueError(
                f"atLeast({m} of {n}) expands to {math.comb(n, m)} "
                "subset windows (> 64) — use fewer sources")
        subs = [_eval(s, per_term) for s in source.sources]
        parts = []
        for combo in itertools.combinations(subs, m):
            w = combo[0] if m == 1 else _unordered_exact(list(combo))
            if w.size:
                parts.append(w)
        if not parts:
            return _Iv.empty()
        u = _Iv(
            np.concatenate([x.doc for x in parts]),
            np.concatenate([x.start for x in parts]),
            np.concatenate([x.end for x in parts]),
            np.concatenate([x.cov for x in parts]),
        ).sorted()
        return _minimal_only(u)
    raise TypeError(type(source))


def _minimal_only(iv: _Iv) -> _Iv:
    """Keep only MINIMAL intervals per doc (drop any interval strictly
    containing another, and exact duplicates) — interval iterators in
    the reference only ever emit minimal intervals
    (MinimumShouldMatchIntervalsSource contract). One lexsort + one
    segmented suffix-min, no pairwise work."""
    if iv.size == 0:
        return iv
    order = np.lexsort((iv.end, iv.start, iv.doc))
    d = iv.doc[order]
    s = iv.start[order]
    e = iv.end[order]
    c = iv.cov[order]
    dup = np.concatenate((
        [False], (d[1:] == d[:-1]) & (s[1:] == s[:-1]) & (e[1:] == e[:-1])))
    d, s, e, c = d[~dup], s[~dup], e[~dup], c[~dup]
    # sorted by (doc, start asc, end asc): j > i in the same doc has
    # start_j >= start_i, so i strictly contains SOME interval iff the
    # exclusive suffix-min of end (within doc) is <= end_i
    inc = _suffix_min_within_doc(d, e)  # inclusive suffix min
    big = np.iinfo(np.int64).max
    excl = np.concatenate((inc[1:], [big]))
    excl[np.concatenate((d[1:] != d[:-1], [True]))] = big
    keep = excl > e
    return _Iv(d[keep], s[keep], e[keep], c[keep])


def _overlaps_any(m: "_Iv", s: "_Iv") -> np.ndarray:
    """Per minuend interval: does ANY s interval in the same doc overlap
    it? Overlap exists iff NOT (every sub ends before m.start or starts
    after m.end) — three searchsorted passes, no pairwise work."""
    o1 = np.argsort(s.doc * _SHIFT + s.start, kind="stable")
    skeys = s.doc[o1] * _SHIFT + s.start[o1]
    ekeys = np.sort(s.doc * _SHIFT + s.end)
    base = m.doc * _SHIFT
    doc_lo = np.searchsorted(skeys, base)
    doc_hi = np.searchsorted(skeys, base + _SHIFT)
    ends_before = (np.searchsorted(ekeys, base + m.start)
                   - np.searchsorted(ekeys, base))
    starts_after = doc_hi - np.searchsorted(
        skeys, base + m.end + np.int64(1))
    return (ends_before + starts_after) < (doc_hi - doc_lo)


def _ordered(source: Ordered, per_term: dict) -> _Iv:
    left = _eval(source.sources[0], per_term)
    for nxt in source.sources[1:]:
        right = _eval(nxt, per_term)
        if left.size == 0 or right.size == 0:
            return _Iv.empty()
        # earliest right interval starting strictly after left's end
        rkeys = right.doc * _SHIFT + right.start
        tgt = left.doc * _SHIFT + left.end + np.int64(1)
        idx = np.searchsorted(rkeys, tgt)
        valid = idx < rkeys.shape[0]
        idxc = np.minimum(idx, max(rkeys.shape[0] - 1, 0))
        same = valid & (right.doc[idxc] == left.doc)
        left = _Iv(
            left.doc[same], left.start[same], right.end[idxc][same],
            left.cov[same] + right.cov[idxc][same],
        )
    if source.maxgaps >= 0 and left.size:
        keep = (left.end - left.start + 1 - left.cov) <= source.maxgaps
        left = _Iv(left.doc[keep], left.start[keep], left.end[keep],
                   left.cov[keep])
    return left.sorted()


def _combine_candidates(a: _Iv, b: _Iv, cands: list) -> _Iv:
    """Union intervals of (a[i], b[cand[i]]) for each candidate array with
    its validity mask; cov adds (callers guarantee non-overlap where cov
    exactness matters)."""
    parts = []
    for cand, sel in cands:
        c = np.clip(cand, 0, max(b.doc.shape[0] - 1, 0))
        parts.append(_Iv(
            a.doc[sel],
            np.minimum(a.start[sel], b.start[c][sel]),
            np.maximum(a.end[sel], b.end[c][sel]),
            a.cov[sel] + b.cov[c][sel],
        ))
    return _Iv(
        np.concatenate([x.doc for x in parts]),
        np.concatenate([x.start for x in parts]),
        np.concatenate([x.end for x in parts]),
        np.concatenate([x.cov for x in parts]),
    ).sorted()


def _pair_unordered(a: _Iv, b: _Iv) -> _Iv:
    """Candidate unordered (overlap-allowed) combinations of two interval
    sets: for every a interval, its predecessor and successor b intervals
    by start — exact for term leaves (a same-start b IS a valid overlap
    combination under Intervals.unordered)."""
    if a.size == 0 or b.size == 0:
        return _Iv.empty()
    bkeys = b.doc * _SHIFT + b.start
    tgt = a.doc * _SHIFT + a.start
    idx = np.searchsorted(bkeys, tgt, side="left")
    cands = []
    for cand in (idx - 1, idx):
        valid = (cand >= 0) & (cand < bkeys.shape[0])
        c = np.clip(cand, 0, max(bkeys.shape[0] - 1, 0))
        cands.append((cand, valid & (b.doc[c] == a.doc)))
    return _combine_candidates(a, b, cands)


def _pair_unordered_no_overlaps(a: _Iv, b: _Iv) -> _Iv:
    """Non-overlapping unordered combinations: for every a interval, the
    nearest b entirely BEFORE it (start < a.start and end < a.start) and
    the nearest b entirely AFTER it (first start > a.end — ``side`` of
    the search jumps equal-start runs, so a same-position overlapping b
    can never occlude the true successor). Exact for term leaves; for
    nested sources the before-side is conservative (a nearer overlapping
    b hides a farther disjoint one)."""
    if a.size == 0 or b.size == 0:
        return _Iv.empty()
    bkeys = b.doc * _SHIFT + b.start
    pred = np.searchsorted(bkeys, a.doc * _SHIFT + a.start, side="left") - 1
    succ = np.searchsorted(bkeys, a.doc * _SHIFT + a.end + np.int64(1),
                           side="left")
    cands = []
    for cand, extra in (
        (pred, lambda c: b.end[c] < a.start),  # entirely before
        (succ, None),  # start > a.end by construction
    ):
        valid = (cand >= 0) & (cand < bkeys.shape[0])
        c = np.clip(cand, 0, max(bkeys.shape[0] - 1, 0))
        sel = valid & (b.doc[c] == a.doc)
        if extra is not None:
            sel &= extra(c)
        cands.append((cand, sel))
    return _combine_candidates(a, b, cands)


def _apply_maxgaps(iv: _Iv, maxgaps: int) -> _Iv:
    if maxgaps >= 0 and iv.size:
        keep = (iv.end - iv.start + 1 - iv.cov) <= maxgaps
        return _Iv(iv.doc[keep], iv.start[keep], iv.end[keep], iv.cov[keep])
    return iv


def _unordered(source: Unordered, per_term: dict) -> _Iv:
    if len(source.sources) > 2:
        ivs = [_eval(s, per_term) for s in source.sources]
        if any(x.size == 0 for x in ivs):
            return _Iv.empty()
        return _apply_maxgaps(_unordered_exact(ivs), source.maxgaps)
    acc = _eval(source.sources[0], per_term)
    for nxt in source.sources[1:]:
        acc = _pair_unordered(acc, _eval(nxt, per_term))
        if acc.size == 0:
            return acc
    return _apply_maxgaps(acc, source.maxgaps)


def _unordered_exact(ivs: "list[_Iv]") -> _Iv:
    """Exact n-way unordered minimal intervals — the smallest-window
    sweep (the reference's UnorderedIntervalsSource priority-queue walk,
    queries/intervals/UnorderedIntervalsSource.java, vectorized):

    Merge every source's intervals tagged by source index and sort by
    (doc, end, start). For a window ending at end_r, the widest-start
    choice per source among intervals with end <= end_r is a per-doc
    segmented running max (one Hillis-Steele scan per source); the
    window [min_s maxstart_s, end_r] is then the MINIMAL unordered
    window ending there. Candidates materialize at the last row of each
    (doc, end) run; non-minimal ones (containing an earlier candidate)
    drop via a running-max-of-starts filter. Overlapping sub-intervals
    are allowed, matching Intervals.unordered (Intervals.java:130).

    ``cov`` sums the chosen intervals' covs — exact for term leaves
    (distinct positions); composites whose chosen sub-intervals overlap
    overcount cov, i.e. undercount gaps (documented, same direction as
    the reference's approximate gap accounting for overlaps)."""
    n_src = len(ivs)
    doc = np.concatenate([x.doc for x in ivs])
    start = np.concatenate([x.start for x in ivs])
    end = np.concatenate([x.end for x in ivs])
    cov = np.concatenate([x.cov for x in ivs])
    src = np.concatenate([np.full(x.size, i, np.int64)
                          for i, x in enumerate(ivs)])
    order = np.lexsort((start, end, doc))
    doc, start, end, cov, src = (a[order] for a in (doc, start, end, cov, src))
    n = doc.shape[0]

    # per-source running best (max start; cov rides in the low bits of a
    # fused key so the chosen interval's cov is recoverable)
    _C = np.int64(1) << np.int64(20)
    fused_all = start * _C + np.minimum(cov, _C - 1)
    best_start = np.empty((n_src, n), np.int64)
    best_cov = np.empty((n_src, n), np.int64)
    for s_i in range(n_src):
        arr = np.where(src == s_i, fused_all, np.int64(-1))
        run = _segmented_prefix_scan(doc, arr, np.maximum)
        best_start[s_i] = np.where(run >= 0, run // _C, np.int64(-1))
        best_cov[s_i] = np.where(run >= 0, run % _C, np.int64(0))
    seen_all = (best_start >= 0).all(axis=0)
    w_start = best_start.min(axis=0)
    w_cov = best_cov.sum(axis=0)

    # candidate = last row of each (doc, end) run where every source seen
    last = np.concatenate(
        (doc[1:] != doc[:-1]) | (end[1:] != end[:-1]), axis=None
    ) if n > 1 else np.empty(0, bool)
    is_last = np.concatenate([last, [True]]) if n else np.empty(0, bool)
    keep = is_last & seen_all
    c_doc, c_start, c_end, c_cov = (
        doc[keep], w_start[keep], end[keep], w_cov[keep])

    # minimality: a later candidate (end >=) whose start <= an earlier
    # start CONTAINS it — keep only strictly-increasing starts per doc
    if c_doc.shape[0] > 1:
        prev_max = _segmented_prefix_scan(c_doc, c_start, np.maximum)
        strict = np.ones(c_doc.shape[0], bool)
        same_doc = c_doc[1:] == c_doc[:-1]
        strict[1:] = ~same_doc | (c_start[1:] > prev_max[:-1])
        c_doc, c_start, c_end, c_cov = (
            c_doc[strict], c_start[strict], c_end[strict], c_cov[strict])
    return _Iv(c_doc, c_start, c_end, c_cov).sorted()


def _unordered_no_overlaps(source: UnorderedNoOverlaps, per_term: dict) -> _Iv:
    acc = _pair_unordered_no_overlaps(
        _eval(source.a, per_term), _eval(source.b, per_term)
    )
    return _apply_maxgaps(acc, source.maxgaps)


def _segmented_prefix_scan(doc: np.ndarray, val: np.ndarray, op) -> np.ndarray:
    """Inclusive prefix-scan of ``op`` (np.minimum/np.maximum) restarting
    at doc boundaries — Hillis-Steele doubling: O(n log n) fully
    vectorized, no per-doc Python."""
    n = doc.shape[0]
    if n == 0:
        return val
    starts = np.concatenate(([True], doc[1:] != doc[:-1]))
    s_idx = np.nonzero(starts)[0]
    seg_start = s_idx[np.cumsum(starts) - 1]  # segment start index per row
    out = val.astype(np.int64, copy=True)
    idx = np.arange(n)
    step = 1
    while step < n:
        prev = idx - step
        can = prev >= seg_start
        nxt = out.copy()
        nxt[can] = op(out[can], out[prev[can]])
        out = nxt
        step <<= 1
    return out


def _suffix_min_within_doc(doc: np.ndarray, val: np.ndarray) -> np.ndarray:
    """m[i] = min(val[i:j]) where j is the end of i's doc run."""
    return _segmented_prefix_scan(doc[::-1], val[::-1], np.minimum)[::-1]


def _containing_mask(big: _Iv, small: _Iv) -> np.ndarray:
    """keep[i] == big interval i contains at least one small interval."""
    if big.size == 0 or small.size == 0:
        return np.zeros(big.size, dtype=bool)
    suff_min_end = _suffix_min_within_doc(small.doc, small.end)
    skeys = small.doc * _SHIFT + small.start
    tgt = big.doc * _SHIFT + big.start
    idx = np.searchsorted(skeys, tgt, side="left")
    valid = idx < skeys.shape[0]
    c = np.minimum(idx, max(skeys.shape[0] - 1, 0))
    return valid & (small.doc[c] == big.doc) & (suff_min_end[c] <= big.end)


def _prefix_max_within_doc(doc: np.ndarray, val: np.ndarray) -> np.ndarray:
    """M[i] = max(val[s:i+1]) where s is the start of i's doc run."""
    return _segmented_prefix_scan(doc, val, np.maximum)


def _contained_by_mask(small: _Iv, big: _Iv) -> np.ndarray:
    """keep[i] == small interval i lies inside at least one big interval."""
    if small.size == 0 or big.size == 0:
        return np.zeros(small.size, dtype=bool)
    pref_max_end = _prefix_max_within_doc(big.doc, big.end)
    bkeys = big.doc * _SHIFT + big.start
    tgt = small.doc * _SHIFT + small.start
    # last big with start <= small.start
    idx = np.searchsorted(bkeys, tgt, side="right") - 1
    valid = idx >= 0
    c = np.maximum(idx, 0)
    return valid & (big.doc[c] == small.doc) & (pref_max_end[c] >= small.end)


def _expand_multiterm(source: IntervalsSource, reader) -> IntervalsSource:
    """Resolve segment-dependent leaves (Prefix) into Or-of-Terms against
    this reader's dictionary — the reference's automaton expansion."""
    if isinstance(source, (Prefix, Wildcard, Regexp, Range)):
        if isinstance(source, Prefix):
            what = f"prefix {source.prefix!r}"
            idxs = reader.terms_matching_prefix(source.prefix)
        elif isinstance(source, Regexp):
            what = f"regexp {source.pattern!r}"
            idxs = reader.terms_matching_regex(
                "^(?:" + source.pattern + ")$")
        elif isinstance(source, Range):
            what = f"range [{source.lower!r}, {source.upper!r}]"
            idxs = reader.term_range(source.lower, source.upper,
                                     source.include_lower,
                                     source.include_upper)
        else:
            from lucene_ray.search.scoring import _wildcard_to_regex

            what = f"wildcard {source.pattern!r}"
            idxs = reader.terms_matching_regex(
                "^" + _wildcard_to_regex(source.pattern) + "$")
        if isinstance(source, (Regexp, Range)):
            # default-field scan must not leak into \x01 field sections
            # (an open-lower range would otherwise sweep them up)
            idxs = idxs[idxs >= reader.default_start]
        if idxs.shape[0] > source.max_expansions:
            raise ValueError(
                f"{what} expands to {idxs.shape[0]} terms "
                f"(> max_expansions={source.max_expansions})")
        if idxs.shape[0] == 0:
            return Term("\x00\x00no-match")  # absent term: empty intervals
        terms = [reader.terms[int(i)] for i in idxs]
        if len(terms) == 1:
            return Term(terms[0])
        return Or(tuple(Term(t) for t in terms))
    if isinstance(source, FuzzyTerm):
        from lucene_ray.search import query as _Q
        from lucene_ray.search.scoring import _fuzzy_expand

        idxs = _fuzzy_expand(reader, _Q.FuzzyQuery(
            source.term, max_edits=source.max_edits,
            prefix_length=source.prefix_length))
        if idxs.shape[0] > source.max_expansions:
            raise ValueError(
                f"fuzzy {source.term!r} expands to {idxs.shape[0]} terms "
                f"(> max_expansions={source.max_expansions})")
        if idxs.shape[0] == 0:
            return Term("\x00\x00no-match")  # absent term: empty intervals
        terms = [reader.terms[int(i)] for i in idxs]
        if len(terms) == 1:
            return Term(terms[0])
        return Or(tuple(Term(t) for t in terms))
    if isinstance(source, Term):
        return source
    import dataclasses

    kw = {}
    for f_ in dataclasses.fields(source):
        v = getattr(source, f_.name)
        if isinstance(v, IntervalsSource):
            kw[f_.name] = _expand_multiterm(v, reader)
        elif isinstance(v, tuple) and v and isinstance(v[0], IntervalsSource):
            kw[f_.name] = tuple(_expand_multiterm(x, reader) for x in v)
        else:
            kw[f_.name] = v
    return type(source)(**kw)


def eval_intervals(reader, source: IntervalsSource):
    """All intervals of ``source`` in this segment: (local_docs, starts,
    ends) arrays sorted by (doc, start, end)."""
    source = _expand_multiterm(source, reader)
    terms: set = set()
    source.leaf_terms(terms)
    per_term = _positions_per_term(reader, sorted(terms))
    iv = _eval(source, per_term)
    return iv.doc, iv.start, iv.end


def min_extent(source: IntervalsSource) -> int:
    """Minimal possible width of the source's intervals — the
    IntervalsSource.minExtent() role (feeds the per-interval weight
    1/max(len - minExtent + 1, 1), IntervalScorer.java:60-68)."""
    if isinstance(source, Term):
        return 1
    if isinstance(source, (Ordered, Unordered)):
        return sum(min_extent(s) for s in source.sources)
    if isinstance(source, UnorderedNoOverlaps):
        return min_extent(source.a) + min_extent(source.b)
    if isinstance(source, Or):
        return min(min_extent(s) for s in source.sources)
    if isinstance(source, Containing):
        return min_extent(source.big)
    if isinstance(source, ContainedBy):
        return min_extent(source.small)
    if isinstance(source, NotContaining):
        return min_extent(source.minuend)
    if isinstance(source, NotContainedBy):
        return min_extent(source.small)
    if isinstance(source, MaxWidth):
        return min_extent(source.source)
    if isinstance(source, First):
        return min_extent(source.source)
    if isinstance(source, PositionRange):
        return min_extent(source.source)
    if isinstance(source, NonOverlapping):
        return min_extent(source.minuend)
    if isinstance(source, (Before, After)):
        return min_extent(source.source)
    if isinstance(source, Extend):
        return min_extent(source.source) + source.before + source.after
    if isinstance(source, (Prefix, Wildcard, FuzzyTerm)):
        return 1
    if isinstance(source, Overlapping):
        return min_extent(source.source)
    raise TypeError(type(source))


def scored_docs(reader, source: IntervalsSource, boost: float = 1.0,
                pivot: float = 1.0):
    """(local docs, scores) under the reference's interval scoring
    (IntervalScorer.java:60-68 + IntervalScoreFunction saturation):
    freq(doc) = sum over the doc's intervals of
    1 / max(width - minExtent + 1, 1); score = boost * freq/(freq+pivot)."""
    doc, start, end = eval_intervals(reader, source)
    if doc.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    me = min_extent(source)
    w = 1.0 / np.maximum((end - start + 1) - me + 1, 1).astype(np.float64)
    docs, inv = np.unique(doc, return_inverse=True)
    freq = np.zeros(docs.shape[0], dtype=np.float64)
    np.add.at(freq, inv, w)
    return docs.astype(np.int64), boost * freq / (freq + pivot)


def matching_docs(reader, source: IntervalsSource):
    """(local docs, interval counts) — the doc-level view an
    IntervalQuery scores on."""
    doc, _s, _e = eval_intervals(reader, source)
    if doc.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs, counts = np.unique(doc, return_counts=True)
    return docs.astype(np.int64), counts.astype(np.int64)
