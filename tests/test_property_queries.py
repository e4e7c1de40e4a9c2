"""Property-based CheckHits: random corpora + random query trees, the
engine vs an INDEPENDENT naive evaluator (the test-framework
CheckHits.java:181-333 pattern, generalized with hypothesis).

The naive evaluator re-implements boolean/phrase/term-range semantics
directly over token lists — no shared code with the engine's scorers —
so structural bugs (leapfrog, anti-join, msm counting, multi-term
expansion, DV verification) can't hide behind a shared mistake.
Doc SETS are compared exactly; scores are compared only for pure term
disjunctions (the naive side reimplements BM25 from the formula).
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=24)


def leaf_strategy():
    return st.one_of(
        st.sampled_from(VOCAB).map(Q.TermQuery),
        st.tuples(st.sampled_from(VOCAB), st.sampled_from(VOCAB)).map(
            lambda p: Q.PhraseQuery(p)),
        st.sampled_from(["a", "b", "g", "d", "e", "z"]).map(Q.PrefixQuery),
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3,
                 unique=True).map(lambda ts: Q.TermInSetQuery(tuple(ts))),
    )


def query_strategy(depth=2):
    if depth == 0:
        return leaf_strategy()
    sub = query_strategy(depth - 1)
    return st.one_of(
        leaf_strategy(),
        st.builds(
            lambda m, s, n, f, msm: Q.BooleanQuery(
                must=tuple(m), should=tuple(s), must_not=tuple(n),
                filter=tuple(f),
                minimum_should_match=msm % (len(s) + 1) if s else 0),
            st.lists(sub, max_size=2), st.lists(sub, max_size=2),
            st.lists(sub, max_size=1), st.lists(sub, max_size=1),
            st.integers(0, 3)),
    )


def naive_match(q, toks: list) -> bool:
    """Independent re-implementation of matching semantics."""
    if isinstance(q, Q.TermQuery):
        return q.term in toks
    if isinstance(q, Q.PhraseQuery):
        n = len(q.terms)
        return any(tuple(toks[i:i + n]) == q.terms
                   for i in range(len(toks) - n + 1))
    if isinstance(q, Q.PrefixQuery):
        return any(t.startswith(q.prefix) for t in toks)
    if isinstance(q, Q.TermInSetQuery):
        return any(t in toks for t in q.terms)
    if isinstance(q, Q.BooleanQuery):
        if any(not naive_match(s, toks) for s in q.must):
            return False
        if any(not naive_match(s, toks) for s in q.filter):
            return False
        if any(naive_match(s, toks) for s in q.must_not):
            return False
        if q.should:
            hits = sum(naive_match(s, toks) for s in q.should)
            # SHOULD is optional beside MUST/FILTER (msm still applies);
            # standalone it needs at least one match (BooleanWeight)
            need = (q.minimum_should_match if (q.must or q.filter)
                    else max(1, q.minimum_should_match))
            return hits >= need
        return bool(q.must or q.filter)
    raise TypeError(type(q))


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    """One randomized-but-fixed corpus; hypothesis varies the QUERIES.
    (Building an index per corpus example would dominate the run.)"""
    import pyarrow as pa

    from lucene_ray.index.build import build_index

    rng = np.random.default_rng(7)
    docs = [" ".join(rng.choice(VOCAB, size=rng.integers(1, 13)))
            for _ in range(60)]
    idx = str(tmp_path_factory.mktemp("prop") / "idx")
    build_index(
        __import__("ray").data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs)})),
        idx, num_segments=3, with_positions=True)
    return Searcher(idx, mode="f64"), [d.split(" ") for d in docs]


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=query_strategy())
def test_random_query_trees_match_naive(built, q):
    s, toks = built
    docs, _scores = s.search_all(q)
    want = {i for i, t in enumerate(toks) if naive_match(q, t)}
    assert set(docs.tolist()) == want, q


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3,
                      unique=True))
def test_disjunction_scores_match_bm25_formula(built, terms):
    """Scores for pure term disjunctions re-derived from the BM25
    formula over the token lists (no engine code)."""
    s, toks = built
    q = Q.BooleanQuery(should=tuple(Q.TermQuery(t) for t in terms))
    docs, scores = s.search_all(q)
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

    def bm25(term, t):
        f = t.count(term)
        if f == 0:
            return 0.0
        df = sum(1 for x in toks if term in x)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        dl = byte4_to_int(int_to_byte4(len(t)))  # norm-quantized length
        return idf * f / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    got = dict(zip(docs.tolist(), scores.tolist()))
    for i, t in enumerate(toks):
        want = sum(bm25(term, t) for term in terms)
        if want:
            assert i in got
            assert abs(got[i] - want) < 1e-9
        else:
            assert i not in got
