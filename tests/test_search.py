"""CheckHits-style search correctness: engine top-k vs brute-force scoring
of every doc with the ported BM25 formula
(test-framework/.../search/CheckHits.java:181-333 pattern), plus invariance
across pruning and partition counts, and boolean/phrase semantics."""

import numpy as np
import pytest

from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher
from lucene_ray.search.similarity import BM25Scorer


def brute_topk(bf, terms, k, mode="or", msm=0):
    """Brute-force BM25 over the whole corpus (scores f32, HitQueue order)."""
    N, sum_ttf = bf["doc_count"], bf["sum_ttf"]
    total = np.zeros(N, dtype=np.float64)
    match = np.zeros(N, dtype=np.int64)
    for t in terms:
        freqs = np.array([d.count(t) for d in bf["tokens"]])
        df = int((freqs > 0).sum())
        if df == 0:
            continue
        sc = BM25Scorer(df, N, sum_ttf)
        s = sc.score(freqs, bf["norms"]).astype(np.float64)
        s[freqs == 0] = 0.0
        total += s
        match += (freqs > 0).astype(np.int64)
    if mode == "or":
        mask = match >= max(1, msm)
    else:
        mask = match == len(terms)
    docs = bf["ids"][mask]
    scores = total[mask]
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order], int(mask.sum())


@pytest.fixture(scope="module")
def searcher(built_index):
    idx, _m = built_index
    return Searcher(idx)


TERMS = ["table", "key", "window", "spark", "customer", "slow"]


@pytest.mark.parametrize("term", TERMS)
def test_term_query_rank_identical(searcher, brute_force, term):
    td = searcher.search(Q.TermQuery(term), k=10)
    bd, bs, total = brute_topk(brute_force, [term], 10)
    assert td.doc_ids.tolist() == bd.tolist()
    assert td.scores.tolist() == bs.tolist()  # exact float32 reproduction
    if td.relation == "EQ":
        assert td.total_hits == total


def test_absent_term(searcher):
    td = searcher.search(Q.TermQuery("zzzqqqabsent"), k=10)
    assert td.total_hits == 0 and td.doc_ids.shape[0] == 0


def test_disjunction_rank_identical(searcher, brute_force):
    terms = ["table", "window", "spark"]
    q = Q.BooleanQuery(should=tuple(Q.TermQuery(t) for t in terms))
    td = searcher.search(q, k=15)
    bd, bs, _ = brute_topk(brute_force, terms, 15)
    assert td.doc_ids.tolist() == bd.tolist()
    np.testing.assert_allclose(td.scores, bs, rtol=0, atol=0)


def test_conjunction(searcher, brute_force):
    terms = ["table", "key"]
    q = Q.BooleanQuery(must=tuple(Q.TermQuery(t) for t in terms))
    td = searcher.search(q, k=10)
    bd, bs, total = brute_topk(brute_force, terms, 10, mode="and")
    assert td.doc_ids.tolist() == bd.tolist()
    np.testing.assert_allclose(td.scores, bs)
    assert td.total_hits == total


def test_min_should_match(searcher, brute_force):
    terms = ["table", "window", "spark"]
    q = Q.BooleanQuery(
        should=tuple(Q.TermQuery(t) for t in terms), minimum_should_match=2
    )
    td = searcher.search(q, k=10)
    bd, bs, total = brute_topk(brute_force, terms, 10, msm=2)
    assert td.doc_ids.tolist() == bd.tolist()
    assert td.total_hits == total


def test_must_not(searcher, brute_force):
    q = Q.BooleanQuery(must=(Q.TermQuery("table"),), must_not=(Q.TermQuery("key"),))
    td = searcher.search(q, k=10)
    has_t = np.array([("table" in d) and ("key" not in d) for d in brute_force["tokens"]])
    bd, bs, total = brute_topk(brute_force, ["table"], 10**9)
    keep = [i for i, d in enumerate(bd) if has_t[list(brute_force["ids"]).index(d)]]
    want = bd[keep][:10]
    assert td.doc_ids.tolist() == want.tolist()


def test_pruning_equals_exhaustive(searcher):
    """Block-max pruning must not change results (QueryUtils.check pattern)."""
    for qtext in ["table", "key value", "spark window customer"]:
        q = searcher.parse(qtext)
        pruned = searcher.search(q, k=5, prune=True)
        full = searcher.search(q, k=5, prune=False)
        assert pruned.doc_ids.tolist() == full.doc_ids.tolist()
        assert pruned.scores.tolist() == full.scores.tolist()


def test_partition_count_invariance(sf_dir, tmp_path, brute_force):
    """Same results at any segmentation (SURVEY §5 adaptation (d))."""
    from lucene_ray.index.build import build_index

    idx2 = str(tmp_path / "idx2")
    build_index(f"{sf_dir}/documents.parquet", idx2, num_segments=1)
    s2 = Searcher(idx2)
    idx3 = str(tmp_path / "idx3")
    build_index(f"{sf_dir}/documents.parquet", idx3, num_segments=7)
    s3 = Searcher(idx3)
    for term in ["table", "key"]:
        a = s2.search(Q.TermQuery(term), k=10)
        b = s3.search(Q.TermQuery(term), k=10)
        assert a.doc_ids.tolist() == b.doc_ids.tolist()
        assert a.scores.tolist() == b.scores.tolist()


def test_phrase_query(searcher, brute_force):
    q = Q.PhraseQuery(("key", "value"))
    td = searcher.search(q, k=10)
    # brute force: count adjacent occurrences
    want = []
    for i, toks in enumerate(brute_force["tokens"]):
        f = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == "key" and toks[j + 1] == "value"
        )
        if f:
            want.append((int(brute_force["ids"][i]), f))
    assert set(td.doc_ids.tolist()) <= {d for d, _ in want}
    assert td.total_hits == len(want)


def test_multiterm_queries(searcher, brute_force):
    vocab = sorted({t for toks in brute_force["tokens"] for t in toks})
    pref = [t for t in vocab if t.startswith("s")]
    td = searcher.search(Q.PrefixQuery("s"), k=10**9)
    want_docs = {
        int(brute_force["ids"][i])
        for i, toks in enumerate(brute_force["tokens"])
        if any(t in pref for t in toks)
    }
    assert set(td.doc_ids.tolist()) == want_docs
    # constant score
    assert (td.scores == 1.0).all()

    td2 = searcher.search(Q.TermInSetQuery(("table", "spark")), k=10**9)
    want2 = {
        int(brute_force["ids"][i])
        for i, toks in enumerate(brute_force["tokens"])
        if "table" in toks or "spark" in toks
    }
    assert set(td2.doc_ids.tolist()) == want2

    td3 = searcher.search(Q.TermRangeQuery("a", "c"), k=10**9)
    rng_terms = [t for t in vocab if "a" <= t <= "c"]
    want3 = {
        int(brute_force["ids"][i])
        for i, toks in enumerate(brute_force["tokens"])
        if any(t in rng_terms for t in toks)
    }
    assert set(td3.doc_ids.tolist()) == want3


def test_fuzzy_query(searcher, brute_force):
    td = searcher.search(Q.FuzzyQuery("tabl", max_edits=1), k=10**9)
    want = {
        int(brute_force["ids"][i])
        for i, toks in enumerate(brute_force["tokens"])
        if "table" in toks  # edit distance 1
    }
    assert want <= set(td.doc_ids.tolist())


def test_match_all_and_count(searcher, brute_force):
    td = searcher.search(Q.MatchAllDocsQuery(), k=5)
    assert td.total_hits == brute_force["doc_count"]
    assert searcher.count(Q.TermQuery("table")) == sum(
        1 for d in brute_force["tokens"] if "table" in d
    )


def test_search_after_pagination(searcher):
    q = Q.TermQuery("table")
    page1 = searcher.search(q, k=5)
    page2 = searcher.search_after(
        q, k=5, after_score=float(page1.scores[-1]), after_doc=int(page1.doc_ids[-1])
    )
    full = searcher.search(q, k=10)
    assert page1.doc_ids.tolist() + page2.doc_ids.tolist() == full.doc_ids.tolist()


def test_parser_roundtrip(searcher):
    q = searcher.parse('+table -key "key value" spark^2 tabl~1 sp*')
    assert isinstance(q, Q.BooleanQuery)
    assert len(q.must) == 1 and len(q.must_not) == 1 and len(q.should) == 4
    q2 = searcher.parse("table AND key")
    assert isinstance(q2, Q.BooleanQuery) and len(q2.must) == 2
    q3 = searcher.parse('"key value"~2')
    assert isinstance(q3, Q.PhraseQuery) and q3.slop == 2
    q4 = searcher.parse("[table TO window]")
    assert isinstance(q4, Q.TermRangeQuery)


def test_distributed_searcher_matches_local(built_index):
    from lucene_ray.search.executor import DistributedSearcher

    idx, _ = built_index
    local = Searcher(idx)
    dist = DistributedSearcher(idx, num_executors=2)
    for qtext in ["table", "key value window", '+table -key']:
        a = local.search(local.parse(qtext), k=10, prune=False)
        b = dist.search(qtext, k=10)
        assert a.doc_ids.tolist() == b.doc_ids.tolist()
        assert a.scores.tolist() == b.scores.tolist()


def test_parser_grouping_parens(searcher):
    """Classic-grammar groups: (a OR b) AND c, nested groups, group boost."""
    q = searcher.parse("+(spark window) +table")
    assert isinstance(q, Q.BooleanQuery)
    assert len(q.must) == 2
    inner = q.must[0]
    assert isinstance(inner, Q.BooleanQuery) and len(inner.should) == 2
    # semantics: docs must match table AND (spark OR window)
    import numpy as np

    docs, _ = searcher.search_all(q)
    dt, _ = searcher.search_all(Q.TermQuery("table"))
    ds_, _ = searcher.search_all(
        Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("window")))
    )
    want = np.intersect1d(dt, ds_)
    assert np.array_equal(np.sort(docs), want)
    # boosted group scales scores
    qb = searcher.parse("(spark window)^2")
    base = searcher.search(searcher.parse("(spark window)"), k=10, prune=False)
    boosted = searcher.search(qb, k=10, prune=False)
    assert base.doc_ids.tolist() == boosted.doc_ids.tolist()
    assert np.allclose(boosted.scores, np.asarray(base.scores) * 2.0)
    # nested
    qn = searcher.parse("((key value) table)")
    assert isinstance(qn, Q.BooleanQuery)


def test_explain_matches_score(searcher):
    """CheckHits invariant: explanation total == search score, and the sum
    of per-term partials == total for a sum-of-terms query."""
    import numpy as np

    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("window")))
    docs, scores = searcher.search_all(q)
    order = np.argsort(-scores)[:5]
    for i in order:
        ex = searcher.explain(q, int(docs[i]))
        assert ex["matched"]
        assert abs(ex["score"] - float(scores[i])) < 1e-9
        assert abs(sum(d["partial_score"] for d in ex["details"]) - ex["score"]) < 1e-9
    # non-matching doc
    all_docs = set(docs.tolist())
    miss = next(d for d in range(100000) if d not in all_docs)
    ex = searcher.explain(q, miss)
    assert not ex["matched"] and ex["score"] == 0.0


def test_distributed_count_and_sampled_facets(built_index, sf_dir):
    """DistributedSearcher.count == Searcher.count (no-prune totals), and
    sampled facet counts are deterministic under a fixed seed."""
    import pyarrow as pa

    from lucene_ray.search.executor import DistributedSearcher
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    local = Searcher(idx)
    dist = DistributedSearcher(idx, num_executors=2)
    for qtext in ["table", "spark window", "+table -key", '"key value"']:
        assert dist.count(qtext) == local.count(qtext)

    import os

    import ray.data

    from lucene_ray.pipelines.facets import sampled_facet_counts

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )
    a = sampled_facet_counts(ds, "lang", fraction=0.3, seed=7).to_pandas()
    b = sampled_facet_counts(ds, "lang", fraction=0.3, seed=7).to_pandas()
    assert a.equals(b)
    assert a["count()"].sum() > 0


def test_msearch_matches_individual_searches(built_index):
    """Batched msearch (one RPC round for N queries) must return exactly
    what per-query search returns."""
    from lucene_ray.search.executor import DistributedSearcher

    idx, _ = built_index
    d = DistributedSearcher(idx, num_executors=2)
    queries = ["table", "spark window", "+table -key", '"key value"', "zzz_nothing"]
    batched = d.msearch(queries, k=5)
    for q, td in zip(queries, batched):
        want = d.search(q, k=5)
        assert td.doc_ids.tolist() == want.doc_ids.tolist()
        assert td.scores.tolist() == want.scores.tolist()
        # msearch runs unthresholded per executor: a GTE result can only
        # come from MaxScore's non-essential split, never undercount below
        # a pruned per-query search's own lower bound
        assert td.total_hits >= want.total_hits


def test_fetch_docs_missing_and_empty(tmp_path):
    """fetch_docs must return an empty slice (not crash) when no requested
    id exists, and drop-missing semantics must hold for mixed requests;
    highlight_from_index aligns snippets by id (review findings r2)."""
    from lucene_ray.index.build import build_index
    from lucene_ray.search.highlight import highlight_from_index
    from lucene_ray.search.searcher import Searcher
    import pyarrow.parquet as pq2
    import pyarrow as pa
    import os

    src_pq = str(tmp_path / "docs.parquet")
    pq2.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["key value here", "nothing", "key value again"]),
    }), src_pq)
    idx = str(tmp_path / "idx")
    build_index(src_pq, idx, num_segments=1, with_positions=True)
    s = Searcher(idx)
    empty = s.fetch_docs([999, 1000])
    assert empty.num_rows == 0
    mixed = s.fetch_docs([2, 999, 0], columns=["doc_id", "text"])
    assert mixed["doc_id"].to_pylist() == [2, 0]
    t = highlight_from_index(s, [0, 999, 2], {"key", "value"}, window=2)
    assert t["doc_id"].to_pylist() == [0, 2]
    assert t["snippet"].to_pylist() == ["key value", "key value"]


def test_span_near_queries(searcher, brute_force):
    """SpanNear: ordered == sloppy phrase; unordered matches the brute
    either-direction window over tokenized docs."""
    q_u = Q.SpanNearQuery(("key", "value"), slop=2, in_order=False)
    docs_u, _ = searcher.search_all(q_u)
    w = 2 + 2 - 1  # len + slop - 1
    want = set()
    for i, toks in zip(brute_force["ids"], brute_force["tokens"]):
        pk = [p for p, t in enumerate(toks) if t == "key"]
        pv = [p for p, t in enumerate(toks) if t == "value"]
        if any(abs(a - b) <= w for a in pk for b in pv):
            want.add(int(i))
    assert set(docs_u.tolist()) == want

    q_o = Q.SpanNearQuery(("key", "value"), slop=2, in_order=True)
    docs_o, _ = searcher.search_all(q_o)
    sdocs, _ = searcher.phrase_freqs(("key", "value"), slop=2)
    assert set(docs_o.tolist()) == set(sdocs.tolist())
    # ordered matches are a subset of unordered
    assert set(docs_o.tolist()) <= set(docs_u.tolist())


def test_expression_function_score(built_index):
    """Compiled expression rescoring is vectorized and sandboxed."""
    import pytest as _pytest

    from lucene_ray.search.expressions import Expression, function_score
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx, mode="f64")
    docs, base = s.search_all(Q.TermQuery("table"))
    d2, rescored = function_score(s, Q.TermQuery("table"),
                                  "2 * score + 1", [])
    assert np.array_equal(docs, d2)
    assert np.allclose(rescored, 2 * base + 1)
    # features join by doc id
    d3, r3 = function_score(s, Q.TermQuery("table"),
                            "score * log(1 + n_chars)", ["n_chars"])
    assert np.array_equal(docs, d3)
    assert (r3 > 0).all()
    # sandbox: attribute access / unknown names / builtins rejected
    for bad in ("__import__('os')", "score.__class__", "open('x')", "foo + 1"):
        with _pytest.raises(ValueError):
            Expression(bad, ["score"])


def test_lru_query_cache(built_index):
    """LRUQueryCache (search/LRUQueryCache.java:90): repeated multi-term
    and filter-role queries are answered from the per-process cache with
    identical results; usage-tracking admission; bounded LRU eviction;
    set_query_cache(None) disables."""
    import numpy as np

    from lucene_ray.search import query as Q
    from lucene_ray.search.querycache import LRUQueryCache, set_query_cache
    from lucene_ray.search.searcher import Searcher

    idx, _m = built_index
    s = Searcher(idx)
    wq = Q.WildcardQuery("tab*")
    bq = Q.BooleanQuery(must=(Q.TermQuery("table"),),
                        filter=(Q.PhraseQuery(("key", "value")),))

    prev = set_query_cache(None)
    try:
        base_w = s.search_all(wq)
        base_b = s.search_all(bq)

        cache = LRUQueryCache(max_entries=64, min_usage=2)
        set_query_cache(cache)
        for _ in range(3):
            d, sc = s.search_all(wq)
            np.testing.assert_array_equal(d, base_w[0])
            np.testing.assert_allclose(sc, base_w[1])
            d, sc = s.search_all(bq)
            np.testing.assert_array_equal(d, base_b[0])
            np.testing.assert_allclose(sc, base_b[1])
        st = cache.stats()
        assert st["hits"] > 0 and st["inserts"] > 0
        # admission: the very first (segment, query) sighting is never
        # cached (min_usage=2), so misses exceed inserts
        assert st["misses"] > st["inserts"]

        # eviction: a 1-entry cache under two distinct queries churns
        tiny = LRUQueryCache(max_entries=1, min_usage=1)
        set_query_cache(tiny)
        s.search_all(wq)
        s.search_all(Q.PrefixQuery("val"))
        assert tiny.eviction_count > 0 and tiny.stats()["entries"] == 1
    finally:
        set_query_cache(prev)


def test_query_rescorer(built_index):
    """QueryRescorer (search/QueryRescorer.java:46): combined == first +
    weight*second on the candidate set; non-candidates never enter; a
    small k_first restricts rescoring to the first-pass winners."""
    import numpy as np

    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    idx, _m = built_index
    s = Searcher(idx)
    first, second = Q.TermQuery("table"), Q.PhraseQuery(("key", "value"))
    d1, s1 = s.search_all(first)
    d2, s2 = s.search_all(second)
    exp = dict(zip(d1.tolist(), s1.tolist()))
    for g, sc in zip(d2.tolist(), s2.tolist()):
        if g in exp:
            exp[g] += 1.5 * sc

    td = s.rescore(first, second, k_first=10**6, k=10**6, weight=1.5)
    assert set(td.doc_ids.tolist()) == set(exp)
    for g, sc in zip(td.doc_ids.tolist(), td.scores.tolist()):
        np.testing.assert_allclose(sc, exp[g], rtol=1e-12)
    # ranking: score desc, doc asc
    r = list(zip((-td.scores).tolist(), td.doc_ids.tolist()))
    assert r == sorted(r)

    # k_first=5: only the 5 first-pass winners are eligible
    td5 = s.rescore(first, second, k_first=5, k=5, weight=1.5)
    top5 = s.search(first, k=5).doc_ids
    assert set(td5.doc_ids.tolist()) <= set(top5.tolist())


def test_distance_feature_query(tmp_path, sf_dir):
    """DistanceFeatureQuery (document/LongPoint.java:187): decay scores vs
    direct numpy; geo variant's monotone rank identity with geo_nearest."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "df_idx")
    build_index(docs, idx, num_segments=3, features={"chars": "n_chars"})

    src = pq.read_table(docs, columns=["doc_id", "n_chars"])
    ids = src["doc_id"].to_numpy()
    v = src["n_chars"].to_numpy().astype(np.float64)
    order = np.argsort(ids)
    ids, v = ids[order], v[order]

    s = Searcher(idx)
    d, sc = s.search_all(
        Q.DistanceFeatureQuery("chars", origin=2000.0, pivot=500.0, boost=3.0)
    )
    o = np.argsort(d)
    np.testing.assert_array_equal(d[o], ids)
    np.testing.assert_allclose(
        sc[o], 3.0 * 500.0 / (500.0 + np.abs(v - 2000.0)), rtol=1e-12
    )

    # geo variant: ranks identical to geo_nearest, scores decay-monotone
    import pyarrow as pa

    import ray.data
    from lucene_ray.pipelines.geo import distance_feature, geo_nearest

    pts = pa.table({
        "doc_id": ids.astype(np.int64),
        "lat": (ids * 9973 % 18000) / 100.0 - 90.0,
        "lon": (ids * 7919 % 36000) / 100.0 - 180.0,
    })
    near = geo_nearest(ray.data.from_arrow(pts), 48.8566, 2.3522, k=10)
    feat = distance_feature(ray.data.from_arrow(pts), 48.8566, 2.3522,
                            pivot_m=500_000.0, k=10, boost=2.0)
    np.testing.assert_array_equal(feat["doc_id"].to_numpy(),
                                  near["doc_id"].to_numpy())
    exp = 2.0 * 500_000.0 / (500_000.0 + near["distance_m"].to_numpy())
    np.testing.assert_allclose(feat["score"].to_numpy(), exp, rtol=1e-12)
    assert (np.diff(feat["score"].to_numpy()) <= 1e-15).all()


def test_feature_query_functions(tmp_path, sf_dir):
    """FeatureQuery (document/FeatureField.java:356-438): saturation/log/
    sigmoid/linear against direct numpy over the source column; survives a
    tiered merge; composes as a SHOULD clause next to a relevance filter."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index
    from lucene_ray.index.merge import tiered_merge
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "feat_idx")
    build_index(docs, idx, num_segments=4, features={"chars": "n_chars"})

    src = pq.read_table(docs, columns=["doc_id", "n_chars"])
    ids = src["doc_id"].to_numpy()
    v = src["n_chars"].to_numpy().astype(np.float64)
    order = np.argsort(ids)
    ids, v = ids[order], v[order]

    expected = {
        "saturation": 2.0 * v / (v + 1000.0),
        "log": np.log(1.0 + v),
        "sigmoid": v**2 / (v**2 + 800.0**2),
        "linear": v.copy(),
    }
    boosts = {"saturation": 2.0, "log": 1.0, "sigmoid": 1.0, "linear": 1.0}

    for which_idx in (idx, None):  # raw segments, then post-merge
        s = Searcher(which_idx or idx)
        for fn, exp in expected.items():
            d, sc = s.search_all(
                Q.FeatureQuery("chars", fn, pivot=1000.0 if fn == "saturation"
                               else 800.0, a=2.0 if fn == "sigmoid" else 1.0,
                               boost=boosts[fn])
            )
            o = np.argsort(d)
            np.testing.assert_array_equal(d[o], ids)
            np.testing.assert_allclose(sc[o], exp, rtol=1e-12)
        if which_idx is idx:
            merged = str(tmp_path / "feat_merged")
            tiered_merge(idx, merged, group_size=2)
            idx = merged

    # SHOULD-composition: BM25(term) + feature score where both match
    s = Searcher(idx)
    base_d, base_s = s.search_all(Q.TermQuery("table"))
    comb_d, comb_s = s.search_all(
        Q.BooleanQuery(
            must=(Q.TermQuery("table"),),
            should=(Q.FeatureQuery("chars", "log", boost=0.5),),
        )
    )
    np.testing.assert_array_equal(np.sort(comb_d), np.sort(base_d))
    o_b, o_c = np.argsort(base_d), np.argsort(comb_d)
    feat = 0.5 * np.log(1.0 + v[np.searchsorted(ids, base_d[o_b])])
    np.testing.assert_allclose(comb_s[o_c], base_s[o_b] + feat, rtol=1e-9)


def test_payload_score_query(tmp_path, sf_dir):
    """PayloadScoreQuery (queries/payloads/PayloadScoreQuery.java:47):
    delimited payloads indexed into the positions table; sum/min/max/avg
    aggregation and includeSpanScore composition match direct numpy;
    survives a tiered merge."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data
    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.index.merge import tiered_merge
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    src = pq.read_table(docs, columns=["doc_id", "text"])

    def derive(b: pa.Table) -> pa.Table:
        out = []
        for t in b["text"].to_pylist():
            toks = t.split(" ")
            out.append(" ".join(f"{w}|{(i % 5) + 1}" for i, w in enumerate(toks)))
        return pa.table({"doc_id": b["doc_id"], "text": pa.array(out)})

    idx = str(tmp_path / "pay_idx")
    build_index(
        ray.data.from_arrow(src).map_batches(derive, batch_format="pyarrow"),
        idx, num_segments=3, with_positions=True,
        analyzer=Analyzer(payload_delimiter="|"),
    )

    # ground truth from the raw text
    truth: dict[int, list[int]] = {}
    for did, t in zip(src["doc_id"].to_pylist(), src["text"].to_pylist()):
        pays = [(i % 5) + 1 for i, w in enumerate(t.split(" ")) if w == "table"]
        if pays:
            truth[did] = pays

    for which in range(2):
        s = Searcher(idx, mode="f64")
        for fn, red in [("sum", sum), ("min", min), ("max", max),
                        ("avg", lambda x: sum(x) / len(x))]:
            d, sc = s.search_all(Q.PayloadScoreQuery("table", fn, boost=2.0))
            assert sorted(d.tolist()) == sorted(truth)
            got = dict(zip(d.tolist(), sc.tolist()))
            for did, pays in truth.items():
                np.testing.assert_allclose(got[did], 2.0 * red(pays), rtol=1e-6)
        # includeSpanScore: payload factor times the term's BM25 score
        d1, s1 = s.search_all(Q.TermQuery("table"))
        d2, s2 = s.search_all(
            Q.PayloadScoreQuery("table", "max", include_span_score=True))
        bm = dict(zip(d1.tolist(), s1.tolist()))
        for did, sc in zip(d2.tolist(), s2.tolist()):
            np.testing.assert_allclose(
                sc, bm[did] * max(truth[did]), rtol=1e-6)
        if which == 0:
            merged = str(tmp_path / "pay_merged")
            tiered_merge(idx, merged, group_size=2)
            idx = merged


def test_interval_prefix_and_first(built_index):
    """Intervals.prefix expands per segment (capped like the reference's
    128 default); First keeps only intervals inside the first n tokens."""
    import numpy as np
    import pytest as _pytest

    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    idx, _m = built_index
    s = Searcher(idx)

    # Prefix == Or over the matching dictionary terms
    d_pref, _ = s.search_all(Q.IntervalQuery(IV.Prefix("tab")))
    terms = set()
    for r in s.readers:
        idxs = r.terms_matching_prefix("tab")
        terms |= {r.terms[int(i)] for i in idxs}
    d_or, _ = s.search_all(
        Q.IntervalQuery(IV.Or(tuple(IV.Term(t) for t in sorted(terms)))))
    np.testing.assert_array_equal(np.sort(d_pref), np.sort(d_or))

    # expansion cap raises, IllegalStateException-style
    with _pytest.raises(ValueError):
        s.search_all(Q.IntervalQuery(IV.Prefix("", max_expansions=3)))

    # First(n): subset of the term's docs, none matching only past n
    d_all, _ = s.search_all(Q.TermQuery("table"))
    d_first, _ = s.search_all(Q.IntervalQuery(IV.First(IV.Term("table"), 5)))
    assert set(d_first.tolist()) <= set(d_all.tolist())
    for did in d_first.tolist()[:5]:
        tv = s.term_vector(did)
        pos = [p for t, p in zip(tv["term"].to_pylist(), tv["pos"].to_pylist())
               if t == "table"]
        assert min(pos) < 5


def test_per_field_analyzers(tmp_path, sf_dir):
    """PerFieldAnalyzerWrapper (analysis/miscellaneous/
    PerFieldAnalyzerWrapper.java:51): title indexes and parses with a
    stemming analyzer, body stays standard; the config survives
    add_documents via the manifest."""
    import os

    import numpy as np

    import ray.data
    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.data.webpages import with_title_column
    from lucene_ray.index.build import add_documents, build_index
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "pf_idx")
    ds = ray.data.read_parquet(docs, columns=["doc_id", "text"]).map_batches(
        with_title_column, batch_format="pyarrow")
    build_index(ds, idx, num_segments=2, extra_fields={"title": "title"},
                field_analyzers={"title": Analyzer(stem=True)})

    s = Searcher(idx)
    # parse stems the title-scoped term ('valued' -> 'valu'); body doesn't
    pq_t = s.parse("title:valued")
    assert pq_t == Q.TermQuery("valu", field="title")
    pq_b = s.parse("valued")
    assert pq_b == Q.TermQuery("valued")

    d_stem, _ = s.search_all(pq_t)
    d_raw, _ = s.search_all(Q.TermQuery("value", field="title"))
    # stemmed dictionary: raw 'value' is NOT a title term, 'valu' is
    assert d_raw.shape[0] == 0 and d_stem.shape[0] > 0

    # config survives incremental adds (manifest round-trip)
    extra = ray.data.from_items(
        [{"doc_id": 30_000, "text": "body text", "title": "valued things"}])
    add_documents(extra, idx, num_segments=1)
    s2 = Searcher(idx)
    d2, _ = s2.search_all(s2.parse("title:valuing"))  # stems to 'valu'
    assert 30_000 in d2.tolist()
    assert set(d_stem.tolist()) <= set(d2.tolist())


def test_unordered_nway_exact(tmp_path, ray_session):
    """n>2 unordered intervals == brute-force minimal-window enumeration
    (UnorderedIntervalsSource semantics, overlaps allowed), including
    maxgaps filtering, on adversarial synthetic docs."""
    import numpy as np

    import ray.data
    from lucene_ray.index.build import build_index
    from lucene_ray.search import intervals as IV
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    rng = np.random.RandomState(7)
    alpha = ["aa", "bb", "cc", "xx"]
    texts = [" ".join(rng.choice(alpha, size=rng.randint(3, 30)))
             for _ in range(120)]
    idx = str(tmp_path / "un_idx")
    build_index(
        ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]),
        idx, num_segments=3, with_positions=True)
    s = Searcher(idx)

    def brute(doc_toks, want, maxgaps):
        """All minimal windows containing one occurrence of each term."""
        L = len(doc_toks)
        wins = []
        for a in range(L):
            for b in range(a, L):
                if all(t in doc_toks[a:b + 1] for t in want):
                    wins.append((a, b))
        minimal = [
            (a, b) for (a, b) in wins
            if not any((a2 >= a and b2 <= b and (a2, b2) != (a, b))
                       for (a2, b2) in wins)
        ]
        if maxgaps >= 0:
            # cov = one chosen position per source; the sweep picks the
            # max-start occurrence per term (gaps = width - n_distinct)
            out = []
            for (a, b) in minimal:
                chosen = set()
                for t in want:
                    chosen.add(max(p for p in range(a, b + 1)
                                   if doc_toks[p] == t))
                if (b - a + 1) - len(chosen) <= maxgaps:
                    out.append((a, b))
            minimal = out
        return minimal

    want = ("aa", "bb", "cc")
    for maxgaps in (-1, 0, 1, 3):
        d, _ = s.search_all(Q.IntervalQuery(
            IV.Unordered(tuple(IV.Term(t) for t in want), maxgaps=maxgaps)))
        expect = {i for i, t in enumerate(texts)
                  if brute(t.split(" "), want, maxgaps)}
        assert set(d.tolist()) == expect, maxgaps


def test_alternative_similarities(built_index, brute_force):
    """LMDirichlet / LMJelinekMercer / Classic / Boolean scorers
    (similarities/LMDirichletSimilarity.java:76, LMJelinekMercerSimilarity
    .java:68, ClassicSimilarity.java:45-71, BooleanSimilarity.java:41-51):
    engine search_all equals brute-force formula over the whole corpus,
    including phrase scoring via the MultiSimilarity sum."""
    idx, _m = built_index
    bf = brute_force
    N, sum_ttf = bf["doc_count"], bf["sum_ttf"]
    from lucene_ray.util.smallfloat import LENGTH_TABLE_INT

    dl = LENGTH_TABLE_INT[bf["norms"]].astype(np.float64)
    freqs = np.array([d.count("table") for d in bf["tokens"]], dtype=np.float64)
    df = float((freqs > 0).sum())
    ttf = float(freqs.sum())
    p = (ttf + 1.0) / (sum_ttf + 1.0)
    mask = freqs > 0
    expect = {
        "lm_dirichlet": np.maximum(
            np.log(1 + freqs / (2000.0 * p)) + np.log(2000.0 / (dl + 2000.0)),
            0.0),
        "lm_jm": np.log(1 + (0.9 * freqs / np.where(dl > 0, dl, 1))
                        / (0.1 * p)),
        "classic": (np.log((N + 1) / (df + 1)) + 1)
        * np.sqrt(freqs) / np.sqrt(np.where(dl > 0, dl, 1)),
        "boolean": np.ones_like(freqs),
    }
    avgdl = sum_ttf / N
    tfn = freqs * np.log2(1 + avgdl / np.where(dl > 0, dl, 1))
    expect["dfr_inl2"] = tfn / (tfn + 1) * np.log2((N + 1) / (df + 0.5))
    expect["ib_ll"] = np.log(1 + tfn / ((df + 1.0) / (N + 1.0)))
    expect["ax_f2exp"] = ((N + 1.0) / df) ** 0.35 * freqs / (
        freqs + 0.5 + 0.5 * dl / avgdl)
    # SweetSpotSimilarity (misc/SweetSpotSimilarity.java:47): plateau
    # length norm; with min=max=1 steepness=0.5 it reduces to Classic
    # because 0.5*(2|dl-1|)+1 == dl for dl >= 1.
    expect["sweetspot:3:8"] = (
        (np.log((N + 1) / (df + 1)) + 1) * np.sqrt(freqs)
        / np.sqrt(0.5 * (np.abs(dl - 3) + np.abs(dl - 8) - 5) + 1))
    expect["sweetspot:1:1:0.5"] = expect["classic"]
    # DFI (DFISimilarity.java:54): expected = (ttf+1)*dl/(sumTtf+1),
    # score = log2(measure + 1) on the f > expected branch
    e_dfi = (ttf + 1.0) * dl / (sum_ttf + 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        expect["dfi_chisquared"] = np.where(
            freqs <= e_dfi, 0.0,
            np.log2((freqs - e_dfi) ** 2 / e_dfi + 1))
        expect["dfi_saturated"] = np.where(
            freqs <= e_dfi, 0.0, np.log2((freqs - e_dfi) / e_dfi + 1))
    # IndriDirichlet (IndriDirichletSimilarity.java:38): unclamped logprob
    expect["indri_dirichlet"] = np.log(
        (freqs + 2000.0 * p) / (dl + 2000.0))
    # Axiomatic F1/F2LOG/F3 (Axiomatic.java:104), s=0.25 k=0.35 qlen=1
    tf_ax = 1 + np.log(1 + np.log(freqs + 1))
    expect["ax_f1exp"] = (tf_ax * (avgdl + 0.25) / (avgdl + dl * 0.25)
                          * ((N + 1.0) / df) ** 0.35)
    expect["ax_f1log"] = (tf_ax * (avgdl + 0.25) / (avgdl + dl * 0.25)
                          * np.log((N + 1.0) / df))
    expect["ax_f2log"] = (np.log((N + 1.0) / df) * freqs
                          / (freqs + 0.25 + 0.25 * dl / avgdl))
    expect["ax_f3exp"] = np.maximum(
        0.0, tf_ax * ((N + 1.0) / df) ** 0.35 - (dl - 1) * 0.25 / avgdl)
    expect["ax_f3log"] = np.maximum(
        0.0, tf_ax * np.log((N + 1.0) / df) - (dl - 1) * 0.25 / avgdl)
    # DFR grid (BasicModelG/IF/Ine × AfterEffectL/B × NormalizationH1/H2)
    ae_b = (ttf + 2.0) / (df + 1.0)
    tfn_h1 = freqs * 1.0 * (avgdl / np.where(dl > 0, dl, 1))
    lam_g = (ttf + 1.0) / (N + (ttf + 1.0))
    A_g, B_g = np.log2(lam_g + 1), np.log2((1 + lam_g) / lam_g)
    expect["dfr_g_b_h2"] = (B_g - (B_g - A_g) / (1 + tfn)) * ae_b
    expect["dfr_g_l_h1"] = B_g - (B_g - A_g) / (1 + tfn_h1)
    expect["dfr_if_b_h2"] = (np.log2(1 + (N + 1) / (ttf + 0.5))
                             * ae_b * (1 - 1 / (1 + tfn)))
    ne = N * (1 - ((N - 1) / N) ** ttf)
    expect["dfr_ine_l_h2"] = (np.log2((N + 1) / (ne + 0.5))
                              * (1 - 1 / (1 + tfn)))
    # IB SPL + LambdaTTF (DistributionSPL.java:29, float32 lambda)
    lam_spl = float(np.float32((ttf + 1.0) / (N + 1.0)))
    q_spl = 1 - 1 / (tfn + 1)
    expect["ib_spl_ttf"] = -np.log(
        (lam_spl ** q_spl - lam_spl) / (1 - lam_spl))
    for mode, exp in expect.items():
        s = Searcher(idx, mode=mode)
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.argsort(docs)
        assert docs[order].tolist() == bf["ids"][mask].tolist(), mode
        got = dict(zip(docs.tolist(), scores.tolist()))
        want = dict(zip(bf["ids"][mask].tolist(), exp[mask].tolist()))
        for d in want:
            assert abs(got[d] - want[d]) < 1e-9, (mode, d)

    # top-k path agrees with search_all ranking (threshold pruning safe)
    for mode in expect:
        s = Searcher(idx, mode=mode)
        td = s.search(Q.TermQuery("table"), k=10)
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.lexsort((docs, -scores))[:10]
        assert td.doc_ids.tolist() == docs[order].tolist(), mode

    # SimilarityBase-family phrase scoring = sum of per-term scorers at
    # the shared phrase freq — DFR included (review fix: these used to
    # silently fall back to BM25)
    s_dfr = Searcher(idx, mode="dfr_inl2")
    d_ph, s_ph = s_dfr.search_all(Q.PhraseQuery(("key", "value")))
    pfreq = np.array([
        sum(1 for i in range(len(t) - 1)
            if t[i] == "key" and t[i + 1] == "value")
        for t in bf["tokens"]
    ], dtype=np.float64)
    exp_dfr = np.zeros_like(pfreq)
    for term in ("key", "value"):
        tdf = float(sum(1 for t in bf["tokens"] if term in t))
        tfn_t = pfreq * np.log2(1 + avgdl / np.where(dl > 0, dl, 1))
        exp_dfr += tfn_t / (tfn_t + 1) * np.log2((N + 1) / (tdf + 0.5))
    got_dfr = dict(zip(d_ph.tolist(), s_ph.tolist()))
    pm = pfreq > 0
    for did, ex in zip(bf["ids"][pm].tolist(), exp_dfr[pm].tolist()):
        assert abs(got_dfr[did] - ex) < 1e-9

    # phrase scoring: lm_dirichlet phrase = sum of per-term scorers at the
    # shared phrase freq (MultiSimilarity.MultiSimScorer)
    s = Searcher(idx, mode="lm_dirichlet")
    docs, scores = s.search_all(Q.PhraseQuery(("key", "value")))
    pf = np.array([
        sum(1 for i in range(len(t) - 1) if t[i] == "key" and t[i + 1] == "value")
        for t in bf["tokens"]
    ], dtype=np.float64)
    stats = {}
    for term in ("key", "value"):
        f = np.array([d.count(term) for d in bf["tokens"]], dtype=np.float64)
        stats[term] = (f.sum() + 1.0) / (sum_ttf + 1.0)
    exp = np.zeros_like(pf)
    for term in stats:
        exp += np.maximum(
            np.log(1 + pf / (2000.0 * stats[term]))
            + np.log(2000.0 / (dl + 2000.0)), 0.0)
    pmask = pf > 0
    got = dict(zip(docs.tolist(), scores.tolist()))
    want = dict(zip(bf["ids"][pmask].tolist(), exp[pmask].tolist()))
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9


def test_word_break_spell_checker(built_index):
    """WordBreakSpellChecker roles (suggest/spell/WordBreakSpellChecker
    .java:74,148): break a concatenation into dictionary words; combine
    adjacent fragments into a dictionary word."""
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    breaks = s.suggest_word_breaks("keyvalue")
    assert breaks and breaks[0][0] == ("key", "value")
    assert breaks[0][1] == 1  # one break
    # term present in the index -> no suggestions in not_in_index mode
    assert s.suggest_word_breaks("table") == []
    # two-change recursive split
    b2 = s.suggest_word_breaks("bigdatascan", max_changes=2)
    assert ("big", "data", "scan") in [p for p, _c, _f in b2]
    assert s.suggest_word_breaks("bigdatascan", max_changes=1) == []
    # combinations: adjacent fragments forming an indexed term
    combos = s.suggest_word_combinations(["win", "dow"], mode="always")
    assert combos and combos[0][0] == "window"
    # not_in_index mode requires an absent fragment among the originals
    assert s.suggest_word_combinations(
        ["table", "window"], mode="not_in_index") == []


def test_query_profiler_tree(built_index, brute_force):
    """profiler.profile_query (sandbox QueryProfilerIndexSearcher /
    ProfilerCollector roles): per-node docs counts are the exhaustive
    match counts, tree paths follow clause order (MUST, FILTER, SHOULD,
    MUST_NOT), wrappers recurse, and time_ns is populated."""
    from lucene_ray.search.profiler import profile_query

    idx, _m = built_index
    bf = brute_force
    s = Searcher(idx)
    has = {t: np.array([t in d for d in bf["tokens"]]) for t in
           ("table", "window", "key")}
    t = profile_query(
        s, Q.BooleanQuery(must=(Q.TermQuery("table"),),
                          should=(Q.TermQuery("window"),),
                          must_not=(Q.TermQuery("key"),)))
    rows = {r["node"]: r for r in t.to_pylist()}
    assert rows["0"]["docs"] == int((has["table"] & ~has["key"]).sum())
    assert rows["0.0"] == {**rows["0.0"], "kind": "TermQuery",
                           "clause": "MUST", "description": "table",
                           "docs": int(has["table"].sum())}
    assert rows["0.1"]["clause"] == "SHOULD"
    assert rows["0.2"]["clause"] == "MUST_NOT"
    assert rows["0.2"]["docs"] == int(has["key"].sum())
    assert all(r["time_ns"] > 0 for r in t.to_pylist())

    # wrappers recurse: boost(const(term)) yields a 3-node chain
    t2 = profile_query(
        s, Q.BoostQuery(Q.ConstantScoreQuery(Q.TermQuery("table")), 2.0))
    kinds = [r["kind"] for r in t2.sort_by("node").to_pylist()]
    assert kinds == ["BoostQuery", "ConstantScoreQuery", "TermQuery"]
    assert len({r["docs"] for r in t2.to_pylist()}) == 1
