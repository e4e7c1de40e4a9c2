"""Property-based intervals: random flat interval sources vs a naive
positional evaluator over the token lists (doc-SET equality — the
matching contract; minimality/scoring internals are covered by the
oracle entries and unit tests)."""

import itertools

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_ray.search import intervals as IV
from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher

VOCAB = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import pyarrow as pa

    from lucene_ray.index.build import build_index

    rng = np.random.default_rng(11)
    docs = [" ".join(rng.choice(VOCAB, size=rng.integers(2, 14)))
            for _ in range(50)]
    idx = str(tmp_path_factory.mktemp("propiv") / "idx")
    build_index(
        __import__("ray").data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs)})),
        idx, num_segments=3, with_positions=True)
    return Searcher(idx, mode="f64"), [d.split(" ") for d in docs]


def _naive_ordered(toks, terms, maxgaps):
    pos = [[i for i, w in enumerate(toks) if w == t] for t in terms]
    n = len(terms)
    for combo in itertools.product(*pos):
        if all(combo[i] < combo[i + 1] for i in range(n - 1)):
            width = combo[-1] - combo[0] + 1
            if maxgaps < 0 or width - n <= maxgaps:
                return True
    return False


def _naive_unordered(toks, terms, maxgaps):
    pos = [[i for i, w in enumerate(toks) if w == t] for t in terms]
    n = len(terms)
    for combo in itertools.product(*pos):
        if len(set(combo)) != n:  # one occurrence per source
            continue
        width = max(combo) - min(combo) + 1
        if maxgaps < 0 or width - n <= maxgaps:
            return True
    return False


def _naive(src, toks) -> bool:
    if isinstance(src, IV.Term):
        return src.term in toks
    if isinstance(src, IV.Ordered):
        return _naive_ordered(toks, [s.term for s in src.sources],
                              src.maxgaps)
    if isinstance(src, IV.Unordered):
        return _naive_unordered(toks, [s.term for s in src.sources],
                                src.maxgaps)
    if isinstance(src, IV.Or):
        return any(_naive(s, toks) for s in src.sources)
    if isinstance(src, IV.MaxWidth):
        inner = src.source
        terms = [s.term for s in inner.sources]
        g = src.width - len(terms)
        if g < 0:  # a window narrower than its term count can't exist
            return False
        if inner.maxgaps >= 0:
            g = min(g, inner.maxgaps)
        if isinstance(inner, IV.Ordered):
            return _naive_ordered(toks, terms, g)
        return _naive_unordered(toks, terms, g)
    if isinstance(src, IV.AtLeast):
        terms = [s.term for s in src.sources]
        m = src.min_should_match
        return any(
            _naive_unordered(toks, list(sub), -1)
            for sub in itertools.combinations(terms, m))
    raise TypeError(type(src))


terms2 = st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3,
                  unique=True)
gaps = st.sampled_from([-1, 0, 1, 2, 5])


def source_strategy():
    flat = st.one_of(
        st.builds(lambda ts, g: IV.Ordered(
            tuple(IV.Term(t) for t in ts), maxgaps=g), terms2, gaps),
        st.builds(lambda ts, g: IV.Unordered(
            tuple(IV.Term(t) for t in ts), maxgaps=g), terms2, gaps),
    )
    return st.one_of(
        flat,
        st.builds(lambda s, w: IV.MaxWidth(s, w), flat,
                  st.integers(2, 8)),
        st.builds(lambda ts: IV.Or(tuple(IV.Term(t) for t in ts)),
                  terms2),
        st.builds(lambda ts, m: IV.AtLeast(1 + m % len(ts),
                                           tuple(IV.Term(t) for t in ts)),
                  terms2, st.integers(0, 2)),
    )


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(src=source_strategy())
def test_interval_doc_sets_match_naive(built, src):
    s, toks = built
    docs, _ = s.search_all(Q.IntervalQuery(src))
    want = {i for i, t in enumerate(toks) if _naive(src, t)}
    assert set(docs.tolist()) == want, src
