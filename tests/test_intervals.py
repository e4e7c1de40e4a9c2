"""Interval algebra (search/intervals.py) — conformance against per-doc
brute force implementing the same documented rules, plus the segmented
scans and serialization round-trip."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.search import intervals as IV
from lucene_ray.search import query as Q


@pytest.fixture(scope="module")
def corpus(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    return {
        d: x.split(" ")
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


@pytest.fixture(scope="module")
def searcher(built_index):
    from lucene_ray.search.searcher import Searcher

    return Searcher(built_index[0])


def _docs(searcher, src):
    docs, scores = searcher.search_all(Q.IntervalQuery(src))
    assert np.all(scores == 1.0)  # constant-score contract
    return set(docs.tolist())


def test_segmented_scans():
    from lucene_ray.search.intervals import (
        _prefix_max_within_doc, _suffix_min_within_doc)

    rng = np.random.default_rng(3)
    doc = np.sort(rng.integers(0, 40, size=500))
    val = rng.integers(0, 1000, size=500)
    want_max = np.array([
        max(val[j] for j in range(len(doc)) if doc[j] == doc[i] and j <= i)
        for i in range(len(doc))
    ])
    want_min = np.array([
        min(val[j] for j in range(len(doc)) if doc[j] == doc[i] and j >= i)
        for i in range(len(doc))
    ])
    assert np.array_equal(_prefix_max_within_doc(doc, val), want_max)
    assert np.array_equal(_suffix_min_within_doc(doc, val), want_min)


def test_ordered_maxgaps_conformance(searcher, corpus):
    """ordered(t1..tn) + maxgaps == exists in-order positions with total
    gap (width - n) <= maxgaps — checked by exhaustive per-doc search."""
    import itertools

    for terms, g in [(("scan", "column"), 3), (("scan", "column", "window"), 5),
                     (("order", "sort"), 0)]:
        got = _docs(searcher, IV.Ordered(tuple(IV.Term(t) for t in terms), g))
        want = set()
        for d, toks in corpus.items():
            poss = [[i for i, w in enumerate(toks) if w == t] for t in terms]
            if any(not p for p in poss):
                continue
            hit = any(
                all(c[i] < c[i + 1] for i in range(len(c) - 1))
                and c[-1] - c[0] + 1 - len(c) <= g
                for c in itertools.product(*poss)
            )
            if hit:
                want.add(d)
        assert got == want, (terms, g)


def test_unordered2_maxgaps_conformance(searcher, corpus):
    """2-source unordered is exact: any pair within the gap budget."""
    t1, t2, g = "scan", "column", 2
    got = _docs(searcher, IV.Unordered((IV.Term(t1), IV.Term(t2)), g))
    want = set()
    for d, toks in corpus.items():
        p1 = [i for i, w in enumerate(toks) if w == t1]
        p2 = [i for i, w in enumerate(toks) if w == t2]
        if any(a != b and abs(a - b) - 1 <= g for a in p1 for b in p2):
            want.add(d)
    assert got == want


def _cand_windows(toks, t1, t2, g):
    """The engine's documented candidate-window rule: each t1 anchor with
    its nearest t2 in either direction, gap-filtered."""
    p1 = [i for i, w in enumerate(toks) if w == t1]
    p2 = [i for i, w in enumerate(toks) if w == t2]
    wins = []
    for a in p1:
        below = [b for b in p2 if b < a]
        above = [b for b in p2 if b > a]
        for b in ([max(below)] if below else []) + ([min(above)] if above else []):
            lo, hi = min(a, b), max(a, b)
            if hi - lo - 1 <= g:
                wins.append((lo, hi))
    return wins


def test_unordered_allows_overlaps():
    """Intervals.unordered allows overlapping sub-intervals
    (Intervals.java:130) — a same-position pair (synonym injection)
    matches; the no-overlap variant is the separate factory."""
    from lucene_ray.search.intervals import _eval

    a = lambda *v: np.asarray(v, dtype=np.int64)  # noqa: E731
    per_term = {"scan": (a(1), a(1)), "column": (a(1, 1), a(1, 3))}
    iv = _eval(IV.Unordered((IV.Term("scan"), IV.Term("column"))), per_term)
    pairs = set(zip(iv.start.tolist(), iv.end.tolist()))
    assert (1, 1) in pairs  # the overlapping same-position combination


def test_unordered_no_overlaps_successor_not_occluded():
    """Review finding: an equal-start overlapping b at the searchsorted
    index used to occlude the true successor at idx+1 — (scan@1,
    column@3) must match although column@1 overlaps the anchor."""
    from lucene_ray.search.intervals import _eval

    a = lambda *v: np.asarray(v, dtype=np.int64)  # noqa: E731
    per_term = {"scan": (a(1), a(1)), "column": (a(1, 1), a(1, 3))}
    iv = _eval(
        IV.UnorderedNoOverlaps(IV.Term("scan"), IV.Term("column"), maxgaps=6),
        per_term,
    )
    assert list(zip(iv.start.tolist(), iv.end.tolist())) == [(1, 3)]


def test_unordered_no_overlaps_conformance(searcher, corpus):
    """On a corpus with no same-position terms, unorderedNoOverlaps ==
    the any-pair-of-distinct-positions rule."""
    t1, t2, g = "scan", "column", 2
    got = _docs(searcher,
                IV.UnorderedNoOverlaps(IV.Term(t1), IV.Term(t2), maxgaps=g))
    want = set()
    for d, toks in corpus.items():
        p1 = [i for i, w in enumerate(toks) if w == t1]
        p2 = [i for i, w in enumerate(toks) if w == t2]
        if any(a != b and abs(a - b) - 1 <= g for a in p1 for b in p2):
            want.add(d)
    assert got == want


def test_containing_and_contained_by_conformance(searcher, corpus):
    big = IV.Unordered((IV.Term("scan"), IV.Term("column")), 6)
    small = IV.Term("window")
    got_c = _docs(searcher, IV.Containing(big, small))
    got_cb = _docs(searcher, IV.ContainedBy(small, big))
    want = set()
    for d, toks in corpus.items():
        ps = [i for i, w in enumerate(toks) if w == "window"]
        if any(
            any(lo <= c <= hi for c in ps)
            for lo, hi in _cand_windows(toks, "scan", "column", 6)
        ):
            want.add(d)
    assert got_c == want
    assert got_cb == want  # doc-level identical by construction


def test_not_containing_and_maxwidth(searcher, corpus):
    big = IV.Unordered((IV.Term("scan"), IV.Term("column")), 6)
    got = _docs(searcher, IV.NotContaining(big, IV.Term("window")))
    want = set()
    for d, toks in corpus.items():
        ps = [i for i, w in enumerate(toks) if w == "window"]
        for lo, hi in _cand_windows(toks, "scan", "column", 6):
            if not any(lo <= c <= hi for c in ps):
                want.add(d)
                break
    assert got == want

    got_cb = _docs(searcher, IV.NotContainedBy(IV.Term("window"), big))
    want_cb = set()
    for d, toks in corpus.items():
        wins = _cand_windows(toks, "scan", "column", 6)
        for c in (i for i, w in enumerate(toks) if w == "window"):
            if not any(lo <= c <= hi for lo, hi in wins):
                want_cb.add(d)
                break
    assert got_cb == want_cb

    got_w = _docs(searcher, IV.MaxWidth(
        IV.Ordered((IV.Term("scan"), IV.Term("column"))), width=4))
    want_w = set()
    for d, toks in corpus.items():
        p1 = [i for i, w in enumerate(toks) if w == "scan"]
        p2 = [i for i, w in enumerate(toks) if w == "column"]
        if any(0 < b - a <= 3 for a in p1 for b in p2):
            want_w.add(d)
    assert got_w == want_w


def test_or_and_phrase(searcher, corpus):
    got = _docs(searcher, IV.Or((IV.Term("scan"), IV.Term("sort"))))
    want = {d for d, toks in corpus.items() if "scan" in toks or "sort" in toks}
    assert got == want
    got_p = _docs(searcher, IV.phrase("key", "value"))
    want_p = set()
    for d, toks in corpus.items():
        if any(toks[i] == "key" and toks[i + 1] == "value"
               for i in range(len(toks) - 1)):
            want_p.add(d)
    assert got_p == want_p


def test_interval_query_composes_in_boolean(searcher, corpus):
    """IntervalQuery as a Boolean MUST clause (realistic usage: scored
    term + positional constraint)."""
    iv = IV.Ordered((IV.Term("scan"), IV.Term("column")), maxgaps=3)
    q = Q.BooleanQuery(must=(Q.TermQuery("table"), Q.IntervalQuery(iv)))
    docs, _sc = searcher.search_all(q)
    want = set()
    for d, toks in corpus.items():
        if "table" not in toks:
            continue
        p1 = [i for i, w in enumerate(toks) if w == "scan"]
        p2 = [i for i, w in enumerate(toks) if w == "column"]
        if any(0 < b - a - 1 <= 3 or b - a == 1 for a in p1 for b in p2):
            want.add(d)
    assert set(docs.tolist()) == want


def test_interval_query_serialization_round_trip():
    src = IV.Containing(
        IV.Unordered((IV.Term("a"), IV.Ordered((IV.Term("b"), IV.Term("c")), 2)), 5),
        IV.Or((IV.Term("d"), IV.Term("e"))),
    )
    q = Q.IntervalQuery(src, boost=2.0)
    assert Q.query_from_dict(q.to_dict()) == q
    src2 = IV.MaxWidth(
        IV.NotContaining(IV.Term("a"), IV.NotContainedBy(IV.Term("b"),
                                                         IV.Term("c"))),
        width=7,
    )
    q2 = Q.IntervalQuery(src2)
    assert Q.query_from_dict(q2.to_dict()) == q2


def test_position_range_intervals(searcher, brute_force):
    """SpanPositionRangeQuery (queries/spans/SpanPositionRangeQuery
    .java:29): start >= lo and end < hi; First(n) == PositionRange(0, n)."""
    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q

    bf = brute_force
    d, _ = searcher.search_all(Q.IntervalQuery(
        IV.PositionRange(IV.Term("table"), 5, 20)))
    want = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
            if any(t == "table" for t in toks[5:20])}
    assert set(d.tolist()) == want
    # lo=0 reduces to First
    d1, _ = searcher.search_all(Q.IntervalQuery(
        IV.PositionRange(IV.Term("table"), 0, 10)))
    d2, _ = searcher.search_all(Q.IntervalQuery(
        IV.First(IV.Term("table"), 10)))
    assert d1.tolist() == d2.tolist()
    # applies to composite sources: a phrase confined to a range
    d3, _ = searcher.search_all(Q.IntervalQuery(
        IV.PositionRange(IV.phrase("key", "value"), 3, 30)))
    want3 = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
             if any(toks[j] == "key" and toks[j + 1] == "value"
                    for j in range(3, min(len(toks) - 1, 29)))}
    assert set(d3.tolist()) == want3


def test_non_overlapping_intervals(searcher, brute_force):
    """Intervals.nonOverlapping (Intervals.java:189, SpanNotQuery role):
    overlap (incl. edge straddles) kills the minuend interval; brute
    force over the token streams."""
    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q

    bf = brute_force
    src = IV.NonOverlapping(IV.phrase("key", "value"), IV.Term("table"))
    d, _ = searcher.search_all(Q.IntervalQuery(src))
    want = set()
    for i, toks in enumerate(bf["tokens"]):
        tpos = {j for j, t in enumerate(toks) if t == "table"}
        for j in range(len(toks) - 1):
            if toks[j] == "key" and toks[j + 1] == "value":
                if not (j in tpos or j + 1 in tpos):
                    want.add(int(bf["ids"][i]))
                    break
    assert set(d.tolist()) == want
    # sanity: nonOverlapping is at most notContaining's doc set
    d2, _ = searcher.search_all(Q.IntervalQuery(
        IV.NotContaining(IV.phrase("key", "value"), IV.Term("table"))))
    assert set(d.tolist()) <= set(d2.tolist())


def test_before_after_extend_intervals(searcher, brute_force):
    """Intervals.before / after / extend (Intervals.java:579,585,409):
    relative-order filters + interval widening (extend shrinks the
    scoring width denominator via min_extent)."""
    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q

    bf = brute_force
    d, _ = searcher.search_all(Q.IntervalQuery(
        IV.Before(IV.Term("scan"), IV.Term("column"))))
    want = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
            if any(t == "scan" and "column" in toks[j + 1:]
                   for j, t in enumerate(toks))}
    assert set(d.tolist()) == want
    d2, _ = searcher.search_all(Q.IntervalQuery(
        IV.After(IV.Term("scan"), IV.Term("column"))))
    want2 = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
             if any(t == "scan" and "column" in toks[:j]
                    for j, t in enumerate(toks))}
    assert set(d2.tolist()) == want2
    # extend widens: an extended term can now CONTAIN a neighbour
    d3, _ = searcher.search_all(Q.IntervalQuery(
        IV.Containing(IV.Extend(IV.Term("scan"), 1, 1),
                      IV.Term("column"))))
    want3 = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
             if any(t == "scan"
                    and ("column" in toks[max(0, j - 1):j + 2])
                    for j, t in enumerate(toks))}
    assert set(d3.tolist()) == want3


def test_wildcard_intervals_leaf(searcher, brute_force):
    """Intervals.wildcard (Intervals.java:139): per-segment expansion,
    Prefix-equivalence, and the max_expansions cap."""
    import pytest

    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q

    d1, _ = searcher.search_all(Q.IntervalQuery(IV.Wildcard("tabl?")))
    d2, _ = searcher.search_all(Q.IntervalQuery(IV.Prefix("tabl")))
    # every 'tabl?' match is a 'tabl'-prefixed term of length 5
    bf = brute_force
    want = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
            if any(len(t) == 5 and t.startswith("tabl") for t in toks)}
    assert set(d1.tolist()) == want
    assert set(d1.tolist()) <= set(d2.tolist())
    with pytest.raises(ValueError):
        searcher.search_all(Q.IntervalQuery(
            IV.Wildcard("*", max_expansions=2)))


def test_fuzzy_term_intervals_leaf(searcher, brute_force):
    """Intervals.fuzzyTerm (Intervals.java:155): per-segment expansion
    against the banded-Levenshtein accepted set (no transpositions);
    docs == brute force edit-distance-1 membership."""
    def levenshtein(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    bf = brute_force
    d, _ = searcher.search_all(Q.IntervalQuery(
        IV.FuzzyTerm("windoq", max_edits=1)))
    want = {int(bf["ids"][i]) for i, toks in enumerate(bf["tokens"])
            if any(levenshtein(t, "windoq") <= 1 for t in toks)}
    assert set(d.tolist()) == want and want
    # empty neighborhood -> empty result, not an error
    d0, _ = searcher.search_all(Q.IntervalQuery(
        IV.FuzzyTerm("zzzqqqxx", max_edits=1)))
    assert d0.size == 0
    with pytest.raises(ValueError):
        searcher.search_all(Q.IntervalQuery(
            IV.FuzzyTerm("windoq", max_edits=1, max_expansions=0)))


def test_overlapping_intervals(searcher, brute_force):
    """Intervals.overlapping (Intervals.java:196): keep source intervals
    that straddle ANY reference interval; complement of NonOverlapping
    on the same operands."""
    bf = brute_force
    src = IV.phrase("key", "value")
    ref = IV.Term("table")
    d, _ = searcher.search_all(Q.IntervalQuery(IV.Overlapping(src, ref)))
    want = set()
    for i, toks in enumerate(bf["tokens"]):
        tpos = {j for j, t in enumerate(toks) if t == "table"}
        for j in range(len(toks) - 1):
            if toks[j] == "key" and toks[j + 1] == "value":
                if j in tpos or j + 1 in tpos:
                    want.add(int(bf["ids"][i]))
                    break
    assert set(d.tolist()) == want
    # partition: overlapping ∪ nonOverlapping == all phrase docs,
    # per-interval complement so doc sets may intersect
    d2, _ = searcher.search_all(Q.IntervalQuery(
        IV.NonOverlapping(src, ref)))
    dall, _ = searcher.search_all(Q.IntervalQuery(src))
    assert set(d.tolist()) | set(d2.tolist()) == set(dall.tolist())


def test_at_least_matches_brute_force(built_index, brute_force):
    """Intervals.atLeast (MinimumShouldMatchIntervalsSource): doc set of
    MaxWidth(atLeast(2 of 3), 8) == any distinct pair within |pa-pb|<=7."""
    import numpy as np

    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    terms = ("scan", "column", "window")
    docs, _sc = s.search_all(Q.IntervalQuery(IV.MaxWidth(
        IV.AtLeast(2, tuple(IV.Term(t) for t in terms)), 8)))
    want = set()
    for d, toks in zip(brute_force["ids"], brute_force["tokens"]):
        pos = {t: [i for i, w in enumerate(toks) if w == t] for t in terms}
        for i in range(3):
            for j in range(i + 1, 3):
                if any(abs(a - b) <= 7 for a in pos[terms[i]]
                       for b in pos[terms[j]]):
                    want.add(int(d))
    assert set(docs.tolist()) == want
    # atLeast(1) == Or (reduced to minimal intervals — same doc set)
    d1, _ = s.search_all(Q.IntervalQuery(
        IV.AtLeast(1, (IV.Term("scan"), IV.Term("column")))))
    d2, _ = s.search_all(Q.IntervalQuery(
        IV.Or((IV.Term("scan"), IV.Term("column")))))
    assert set(d1.tolist()) == set(d2.tolist())
    # atLeast(n) == unordered exact
    d3, _ = s.search_all(Q.IntervalQuery(
        IV.AtLeast(2, (IV.Term("scan"), IV.Term("column")))))
    d4, _ = s.search_all(Q.IntervalQuery(
        IV.Unordered((IV.Term("scan"), IV.Term("column")))))
    assert set(d3.tolist()) == set(d4.tolist())


def test_regexp_and_range_leaves(built_index):
    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    pre, _ = s.search_all(Q.IntervalQuery(IV.Ordered(
        (IV.Term("key"), IV.Prefix("val")), maxgaps=2)))
    rex, _ = s.search_all(Q.IntervalQuery(IV.Ordered(
        (IV.Term("key"), IV.Regexp("val.*")), maxgaps=2)))
    rng, _ = s.search_all(Q.IntervalQuery(IV.Ordered(
        (IV.Term("key"), IV.Range("val", "valz")), maxgaps=2)))
    assert set(pre.tolist()) == set(rex.tolist()) == set(rng.tolist())
    assert pre.shape[0] > 0
    # dict round trip
    for src in (IV.Regexp("a.*b"), IV.Range("a", "b", False, True),
                IV.AtLeast(2, (IV.Term("x"), IV.Term("y"), IV.Term("z")))):
        assert IV.source_from_dict(src.to_dict()) == src


def test_not_within_and_analyzed_text(built_index, brute_force):
    """Intervals.notWithin == nonOverlapping(minuend, extend(sub, n, n));
    Intervals.analyzedText builds the ordered source from analysis."""
    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    nw, _ = s.search_all(Q.IntervalQuery(
        IV.not_within(IV.Term("scan"), 3, IV.Term("column"))))
    # brute: 'scan' occurrences with no 'column' within 3 positions
    want = set()
    for d, toks in zip(brute_force["ids"], brute_force["tokens"]):
        sc = [i for i, w in enumerate(toks) if w == "scan"]
        co = [i for i, w in enumerate(toks) if w == "column"]
        if any(all(abs(a - b) > 3 for b in co) for a in sc):
            want.add(int(d))
    assert set(nw.tolist()) == want
    at, _ = s.search_all(Q.IntervalQuery(IV.analyzed_text("key value")))
    ph, _ = s.search_all(Q.PhraseQuery(("key", "value")))
    assert set(at.tolist()) == set(ph.tolist())
    assert IV.analyzed_text("key") == IV.Term("key")
    none, _ = s.search_all(Q.IntervalQuery(IV.analyzed_text("")))
    assert none.shape[0] == 0
