"""Property-based suggester checks: AnalyzingSuggester / fuzzy / regex
lookups vs brute-force enumeration over random surface tables (the
FST + ranking contracts, no shared code on the brute side)."""

import re

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_ray.pipelines.suggest import (SEP, AnalyzingSuggester,
                                          FuzzySuggesterLookup,
                                          RegexSuggesterLookup)

word = st.text(alphabet="abcd", min_size=1, max_size=5)
surface = st.builds(lambda ws: " ".join(ws),
                    st.lists(word, min_size=1, max_size=3))
table = st.lists(st.tuples(surface, st.integers(1, 100)),
                 min_size=1, max_size=30)


def _build(rows):
    agg = {}
    for s, w in rows:
        agg[s] = agg.get(s, 0) + w
    t = pa.table({"surface": list(agg), "weight": list(agg.values())})
    return AnalyzingSuggester(t), agg


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(cur[-1] + 1, prev[j] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=table, q=st.text(alphabet="abcd ", min_size=1, max_size=6))
def test_prefix_lookup_matches_brute(rows, q):
    sug, agg = _build(rows)
    got = sug.lookup(q, k=100).to_pylist()
    qa = SEP.join(t for t in q.lower().split(" ") if t)
    want = sorted(
        ((SEP.join(s.lower().split(" ")) != qa, -w, s)
         for s, w in agg.items()
         if SEP.join(s.lower().split(" ")).startswith(qa)),
    )
    assert [(r["surface"], r["weight"]) for r in got] == \
           [(s, -nw) for _x, nw, s in want]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=table, q=st.text(alphabet="abcd", min_size=1, max_size=5))
def test_fuzzy_lookup_matches_brute(rows, q):
    sug, agg = _build(rows)
    got = FuzzySuggesterLookup(sug).lookup(q, k=100, max_edits=1,
                                           prefix_length=1).to_pylist()
    want = []
    for s, w in agg.items():
        a = SEP.join(s.lower().split(" "))
        if not a.startswith(q[:1]):
            continue
        ed = min((_lev(q, a[:j]) for j in range(len(a) + 1)), default=None)
        if ed is not None and ed <= 1:
            want.append((ed, -w, s))
    want.sort()
    assert [(r["surface"], r["edits"], r["weight"]) for r in got] == \
           [(s, e, -nw) for e, nw, s in want]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=table,
       pat=st.sampled_from(["a", "a[bc]+", "ab?c", "(?:a|b)d*", "c.d"]))
def test_regex_lookup_matches_brute(rows, pat):
    sug, agg = _build(rows)
    got = RegexSuggesterLookup(sug).lookup(pat, k=100).to_pylist()
    rx = re.compile(pat)
    want = sorted(
        ((-w, s) for s, w in agg.items()
         if rx.match(SEP.join(s.lower().split(" ")))))
    assert [(r["surface"], r["weight"]) for r in got] == \
           [(s, -nw) for nw, s in want]
