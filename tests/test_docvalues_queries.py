"""Slow doc-values queries + IndexOrDocValuesQuery.

Roles: document/SortedNumericDocValuesField.java:108 (newSlowRangeQuery),
document/SortedDocValuesField.java:126 (newSlowSetQuery),
search/IndexOrDocValuesQuery.java:68 (two plans of one predicate).
"""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dv_index(ray_session, tmp_path_factory):
    """Index with the source predicate in BOTH plans: terms in field
    'srcf' and string DV 'src'; n_chars as numeric DV 'chars'."""
    from lucene_ray.index.build import build_index

    idx = str(tmp_path_factory.mktemp("dvq") / "index")
    build_index(
        os.path.join(SF_DIR, "documents.parquet"), idx, num_segments=3,
        extra_fields={"srcf": "source"},
        string_values={"src": "source"},
        features={"chars": "n_chars"},
    )
    yield idx
    shutil.rmtree(idx, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "source", "n_chars"])
    return (t["doc_id"].to_numpy(), t["source"].to_pylist(),
            t["n_chars"].to_numpy())


def test_dv_range_standalone_matches_numpy(dv_index, corpus):
    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    docs, scores = s.search_all(Q.DocValuesRangeQuery("chars", 200.0, 900.0))
    want = np.sort(ids[(chars >= 200) & (chars <= 900)])
    assert np.array_equal(np.sort(docs), want)
    assert np.all(scores == 1.0)  # constant score = boost


def test_dv_range_open_ends(dv_index, corpus):
    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    lo, _ = s.search_all(Q.DocValuesRangeQuery("chars", 500.0, None))
    hi, _ = s.search_all(Q.DocValuesRangeQuery("chars", None, 499.0))
    assert np.array_equal(np.sort(lo), np.sort(ids[chars >= 500]))
    assert np.array_equal(np.sort(hi), np.sort(ids[chars <= 499]))
    both, _ = s.search_all(Q.DocValuesRangeQuery("chars", None, None))
    assert both.shape[0] == ids.shape[0]


def test_dv_set_standalone_matches_python(dv_index, corpus):
    ids, src, _chars = corpus
    s = Searcher(dv_index, mode="f64")
    vals = ("src1", "src4", "src19")
    docs, _ = s.search_all(Q.DocValuesSetQuery("src", vals))
    want = np.sort(ids[np.array([x in vals for x in src])])
    assert np.array_equal(np.sort(docs), want)


def test_unknown_dv_field_matches_nothing(dv_index):
    s = Searcher(dv_index, mode="f64")
    d1, _ = s.search_all(Q.DocValuesRangeQuery("nope", 0.0, 1e18))
    d2, _ = s.search_all(Q.DocValuesSetQuery("nope", ("x",)))
    assert d1.shape[0] == 0 and d2.shape[0] == 0


def test_index_or_dv_plans_agree(dv_index):
    """The index plan (standalone) and the dv plan (as a non-leading
    filter clause) must produce the same doc set — the caller contract
    of IndexOrDocValuesQuery.java:68."""
    s = Searcher(dv_index, mode="f64")
    iodv = Q.IndexOrDocValuesQuery(
        Q.TermInSetQuery(("src2", "src7"), field="srcf"),
        Q.DocValuesSetQuery("src", ("src2", "src7")),
    )
    standalone, _ = s.search_all(iodv)  # index plan
    # conjunction: match-all term candidates -> dv verification plan
    via_filter, _ = s.search_all(
        Q.BooleanQuery(filter=(Q.MatchAllDocsQuery(), iodv)))
    assert np.array_equal(np.sort(standalone), np.sort(via_filter))
    assert standalone.shape[0] > 0


def test_dv_filter_conjunction_equals_intersection(dv_index, corpus):
    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    term_docs, _ = s.search_all(Q.TermQuery("table"))
    rng = (chars >= 100) & (chars <= 1200)
    want = np.intersect1d(term_docs, ids[rng])
    got, _ = s.search_all(Q.BooleanQuery(filter=(
        Q.TermQuery("table"),
        Q.DocValuesRangeQuery("chars", 100.0, 1200.0),
    )))
    assert np.array_equal(np.sort(got), want)


def test_dv_range_sees_updates(dv_index, corpus, tmp_path):
    """Numeric DV update generations overlay into the range query
    (IndexWriter.updateNumericDocValue, IndexWriter.java:1892)."""
    from lucene_ray.index.build import build_index
    from lucene_ray.index.docvalues import update_doc_values

    ids, _src, chars = corpus
    idx = str(tmp_path / "upd")
    build_index(os.path.join(SF_DIR, "documents.parquet"), idx,
                num_segments=2, features={"chars": "n_chars"})
    moved = ids[ids % 5 == 0]
    update_doc_values(idx, "chars", moved, np.full(moved.shape[0], 1e6))
    s = Searcher(idx, mode="f64")
    docs, _ = s.search_all(Q.DocValuesRangeQuery("chars", 1e6, None))
    assert np.array_equal(np.sort(docs), np.sort(moved))
    # and the pre-update values moved OUT of their old range
    low, _ = s.search_all(Q.DocValuesRangeQuery("chars", None, 1e6 - 1))
    assert not np.intersect1d(low, moved).size


def test_dv_multi_range_merges_and_matches(dv_index, corpus):
    """Overlapping clauses merge to disjoint intervals
    (SortedNumericDocValuesMultiRangeQuery.java:49); empty/inverted
    clauses drop; open ends work."""
    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    q = Q.DocValuesMultiRangeQuery(
        "chars", ((200.0, 500.0), (450.0, 800.0), (900.0, 850.0),  # inverted
                  (1200.0, None)))
    docs, scores = s.search_all(q)
    want = ((chars >= 200) & (chars <= 800)) | (chars >= 1200)
    assert np.array_equal(np.sort(docs), np.sort(ids[want]))
    assert np.all(scores == 1.0)
    # empty clause list matches nothing
    none, _ = s.search_all(Q.DocValuesMultiRangeQuery("chars", ()))
    assert none.shape[0] == 0


def test_dv_multi_range_as_filter(dv_index, corpus):
    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    term_docs, _ = s.search_all(Q.TermQuery("table"))
    got, _ = s.search_all(Q.BooleanQuery(filter=(
        Q.TermQuery("table"),
        Q.DocValuesMultiRangeQuery("chars", ((0.0, 300.0), (600.0, 900.0))),
    )))
    want = np.intersect1d(
        term_docs, ids[((chars >= 0) & (chars <= 300))
                       | ((chars >= 600) & (chars <= 900))])
    assert np.array_equal(np.sort(got), want)


def test_function_range_scores_are_values(dv_index, corpus):
    """ValueSourceScorer.java:39 — the score IS the function value."""
    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    docs, scores = s.search_all(
        Q.FunctionRangeQuery("sqrt(chars)", ("chars",), 15.0, 25.0))
    vals = np.sqrt(chars.astype(np.float64))
    want = (vals >= 15.0) & (vals <= 25.0)
    assert np.array_equal(np.sort(docs), np.sort(ids[want]))
    by_id = dict(zip(ids, vals))
    assert np.allclose(scores, [by_id[d] for d in docs])
    # boost scales the value; missing feature matches nothing
    _d, s2 = s.search_all(
        Q.FunctionRangeQuery("sqrt(chars)", ("chars",), 15.0, 25.0, boost=2.0))
    assert np.allclose(np.sort(s2), np.sort(scores * 2.0))
    none, _ = s.search_all(Q.FunctionRangeQuery("missing", ("missing",), 0, 1))
    assert none.shape[0] == 0


def test_dict_round_trip():
    iodv = Q.IndexOrDocValuesQuery(
        Q.TermInSetQuery(("a", "b"), field="f"),
        Q.DocValuesSetQuery("s", ("a", "b")),
    )
    for q in (Q.DocValuesRangeQuery("c", 1.0, 2.0, boost=3.0),
              Q.DocValuesSetQuery("s", ("x", "y"), boost=0.5),
              Q.DocValuesMultiRangeQuery("c", ((1.0, 2.0), (5.0, 9.0))),
              Q.FunctionRangeQuery("sqrt(a) + b", ("a", "b"), 1.0, 2.0),
              iodv):
        assert Q.query_from_dict(q.to_dict()) == q


def test_resolve_fields_recurses_into_iodv():
    iodv = Q.IndexOrDocValuesQuery(
        Q.TermInSetQuery(("a",), field="f"),
        Q.DocValuesSetQuery("s", ("a",)),
    )
    rq = Q.resolve_fields(iodv)
    assert rq.index_query.field is None  # rekeyed to storage form
    assert rq.index_query.terms[0] != "a"  # field-prefixed
    assert rq.dv_query == iodv.dv_query  # DV side has no term keys


def test_expression_sort_collector(dv_index, corpus):
    """Expression sort binding (Expression.getSortField role): top-k by
    a computed function of features, (value, doc asc) tie-break."""
    from lucene_ray.search.collectors import \
        TopFieldExpressionCollectorManager

    ids, _src, chars = corpus
    s = Searcher(dv_index, mode="f64")
    pairs = s.search_with_collector(
        Q.MatchAllDocsQuery(),
        TopFieldExpressionCollectorManager("sqrt(chars)", ("chars",), k=5))
    vals = np.sqrt(chars.astype(np.float64))
    order = np.lexsort((ids, -vals))[:5]
    want = [(float(vals[i]), int(ids[i])) for i in order]
    assert pairs == want
    asc = s.search_with_collector(
        Q.MatchAllDocsQuery(),
        TopFieldExpressionCollectorManager("sqrt(chars)", ("chars",),
                                           k=5, ascending=True))
    order2 = np.lexsort((ids, vals))[:5]
    assert asc == [(float(vals[i]), int(ids[i])) for i in order2]


def test_dv_queries_through_distributed_executor(dv_index, corpus):
    """The new DV/function queries serialize through query_from_dict and
    evaluate identically inside the actor-pool executors."""
    from lucene_ray.search.executor import DistributedSearcher

    ids, _src, chars = corpus
    ds = DistributedSearcher(dv_index, num_executors=2)
    s = Searcher(dv_index, mode="f64")
    for q in (
        Q.BooleanQuery(filter=(Q.TermQuery("table"),
                               Q.DocValuesRangeQuery("chars", 100.0, 900.0))),
        Q.DocValuesMultiRangeQuery("chars", ((0.0, 300.0), (800.0, 1000.0))),
        Q.BooleanQuery(filter=(
            Q.MatchAllDocsQuery(),
            Q.IndexOrDocValuesQuery(
                Q.TermInSetQuery(("src1", "src5"), field="srcf"),
                Q.DocValuesSetQuery("src", ("src1", "src5"))))),
        Q.FunctionRangeQuery("sqrt(chars)", ("chars",), 15.0, 25.0),
    ):
        td = ds.search(q, k=1000)
        want, _ = s.search_all(q)
        assert set(td.doc_ids.tolist()) == set(want.tolist()), type(q)
    ds.shutdown()


def test_scoring_rewrite_vs_constant(dv_index, corpus):
    """SCORING_BOOLEAN_QUERY_REWRITE: same doc set as the constant-score
    default but scores = sum of expanded TermQuery BM25; unmatched
    prefix rewrites to MatchNoDocs."""
    s = Searcher(dv_index, mode="f64")
    const_docs, const_scores = s.search_all(Q.PrefixQuery("tab"))
    sc_docs, sc_scores = s.search_all(
        Q.ScoringRewriteQuery(Q.PrefixQuery("tab")))
    assert np.array_equal(np.sort(const_docs), np.sort(sc_docs))
    assert np.all(const_scores == 1.0)
    assert not np.all(sc_scores == 1.0)  # genuinely BM25-scored
    # equals the explicit expansion
    exp_docs, exp_scores = s.search_all(Q.BooleanQuery(
        should=(Q.TermQuery("table"),)))
    o1 = np.argsort(sc_docs)
    o2 = np.argsort(exp_docs)
    if exp_docs.shape[0] == sc_docs.shape[0]:  # only 'table' starts 'tab'
        assert np.allclose(sc_scores[o1], exp_scores[o2])
    none, _ = s.search_all(Q.ScoringRewriteQuery(Q.PrefixQuery("zzzz")))
    assert none.shape[0] == 0


def test_span_payload_check(ray_session, tmp_path):
    """SpanPayloadCheckQuery.java:54: spans accepted only when every
    position's payload equals the expected sequence."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["key|1 value|2 key|2 value|3",   # span at p2 matches (2,3)
                 "key|2 value|3",                  # matches at p0
                 "key|2 value|9"],                 # payload mismatch
    })
    idx = str(tmp_path / "pay")
    build_index(ray.data.from_arrow(t), idx, num_segments=1,
                with_positions=True,
                analyzer=Analyzer(payload_delimiter="|"))
    s = Searcher(idx, mode="f64")
    d, f = s.payload_check_freqs(("key", "value"), (2.0, 3.0))
    assert dict(zip(d.tolist(), f.tolist())) == {0: 1, 1: 1}
    docs, scores = s.search_all(
        Q.SpanPayloadCheckQuery(("key", "value"), (2.0, 3.0), boost=2.0))
    assert set(docs.tolist()) == {0, 1} and np.all(scores == 2.0)
    # single-term check
    d1, f1 = s.payload_check_freqs(("key",), (2.0,))
    assert dict(zip(d1.tolist(), f1.tolist())) == {0: 1, 1: 1, 2: 1}
    # dict round trip
    q = Q.SpanPayloadCheckQuery(("a", "b"), (1.0, 2.0), field="f")
    assert Q.query_from_dict(q.to_dict()) == q


def test_jaro_winkler_matches_duckdb():
    """The engine's JW similarity is bit-identical to DuckDB's
    jaro_winkler_similarity (the oracle dependency) on randomized pairs."""
    import itertools
    import random

    import duckdb

    from lucene_ray.util.strdist import jaro_winkler

    con = duckdb.connect()
    random.seed(3)
    words = ["", "a", "ab", "table", "tbale", "customer", "costumer",
             "x" * 30] + [
        "".join(random.choice("abcdef") for _ in range(random.randint(1, 10)))
        for _ in range(60)]
    for s1, s2 in itertools.product(words[:12], words):
        ref = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                          [s1, s2]).fetchone()[0]
        assert abs(jaro_winkler(s1, s2) - ref) < 1e-12, (s1, s2)


def test_ngram_distance_properties():
    """NGramDistance (Kondrak SPIRE'05): identity, symmetry-ish ordering,
    short-string branch, and hand-checked values."""
    from lucene_ray.util.strdist import ngram_distance

    assert ngram_distance("table", "table") == 1.0
    assert ngram_distance("", "") == 1.0
    assert ngram_distance("a", "") == 0.0
    # transposition beats total mismatch
    assert ngram_distance("table", "tbale") > ngram_distance("table", "zzzzz")
    # short-string positional branch: 'ab' vs 'ac' with n=3 -> 1/2
    assert ngram_distance("ab", "ac", n=3) == 0.5
    # single shared prefix char out of 2 positions, strings len 2
    assert ngram_distance("ab", "ax") == 0.5 if len("ab") < 2 else True
    # monotone in closeness
    sims = [ngram_distance("customer", w)
            for w in ("customer", "costumer", "custard", "zebra")]
    assert sims[0] == 1.0 and sims[0] > sims[1] > sims[3]


def test_range_field_relations(dv_index, corpus, tmp_path, ray_session):
    """RangeFieldQuery relations on a hand-built fixture: disjoint /
    within / contains / crossing ranges classify exactly."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.index.build import build_index

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": ["a"] * 5,
        "rmin": pa.array([0, 45, 10, 48, 90], pa.int64()),
        "rmax": pa.array([5, 55, 80, 52, 95], pa.int64()),
    })
    idx = str(tmp_path / "rng")
    build_index(ray.data.from_arrow(t), idx, num_segments=1,
                features={"rmin": "rmin", "rmax": "rmax"})
    s = Searcher(idx, mode="f64")
    # query range [40, 60]:
    # doc0 [0,5] disjoint; doc1 [45,55] within; doc2 [10,80] contains;
    # doc3 [48,52] within; doc4 [90,95] disjoint
    def docs(rel):
        d, _ = s.search_all(Q.RangeFieldQuery("rmin", "rmax",
                                              40.0, 60.0, relation=rel))
        return set(d.tolist())

    assert docs("intersects") == {1, 2, 3}
    assert docs("within") == {1, 3}
    assert docs("contains") == {2}
    assert docs("crosses") == {2}  # intersects and not within
    q = Q.RangeFieldQuery("a", "b", 1.0, 2.0, "within", boost=2.0)
    assert Q.query_from_dict(q.to_dict()) == q


def test_expressions_haversin_builtin():
    """The expression language ships geo distance built in
    (expressions/js/ExpressionMath.java haversin binding)."""
    import numpy as np

    from lucene_ray.pipelines.geo import haversine_meters
    from lucene_ray.search.expressions import Expression

    e = Expression("haversin(40.7, -74.0, lat, lon)", ["lat", "lon"])
    lats = np.array([40.7, 41.0, 34.05])
    lons = np.array([-74.0, -73.0, -118.24])
    got = e.evaluate(lat=lats, lon=lons)
    want = haversine_meters(lats, lons, 40.7, -74.0)
    assert np.allclose(got, want)
    assert got[0] == 0.0 and got[2] > 3.9e6  # NYC -> LA ~3.94e6 m
