"""Wave-3 query operators: BlendedTermQuery, PhraseWildcardQuery,
DiversifiedTopDocsCollector, CoveringQuery feature plumbing, dynamic
range facets."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher
from lucene_ray.search.similarity import BM25Scorer

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text", "source"])
    toks = [s.split() for s in t["text"].to_pylist()]
    return {"ids": t["doc_id"].to_numpy(), "tokens": toks,
            "sources": t["source"].to_pylist()}


def _brute_term(corpus, term, df_override, searcher):
    """Per-doc BM25 with an overridden df (f32 mode, engine norms)."""
    freqs = np.array([d.count(term) for d in corpus["tokens"]], np.int64)
    sc = BM25Scorer(df_override, searcher.doc_count, searcher.sum_ttf)
    norms = np.concatenate(
        [r.norms_for(None) for r in searcher.readers
         if r.meta.get("owns_docs", True)])
    # readers partition the corpus by doc ranges; rebuild global order
    gids = np.concatenate(
        [r.doc_ids for r in searcher.readers
         if r.meta.get("owns_docs", True)])
    order = np.argsort(gids)
    norms = norms[order][np.searchsorted(np.sort(gids), corpus["ids"])]
    s = sc.score(freqs, norms).astype(np.float64)
    s[freqs == 0] = 0.0
    return s


def test_blended_term_df_max_and_dismax(searcher, corpus):
    terms = ("spark", "customer")
    dfs = [int(np.sum([t in d for d in corpus["tokens"]])) for t in terms]
    df_blend = max(dfs)
    per_term = np.stack([
        _brute_term(corpus, t, df_blend, searcher) for t in terms])
    smax = per_term.max(axis=0)
    ssum = per_term.sum(axis=0)
    expect = smax + 0.01 * (ssum - smax)
    mask = (per_term > 0).any(axis=0)

    docs, scores = searcher.search_all(
        Q.BlendedTermQuery(terms, tie_breaker=0.01))
    assert docs.shape[0] == int(mask.sum())
    got = dict(zip(docs.tolist(), scores.tolist()))
    for did, ex in zip(corpus["ids"][mask].tolist(), expect[mask]):
        np.testing.assert_allclose(got[did], ex, rtol=1e-6)


def test_blended_of_identical_terms_is_dismax_of_duplicates(searcher):
    # two identical disjuncts: max + tie*(sum - max) = (1 + tie) * s,
    # exactly what Lucene's rewrite (two TermQueries in a DisMax) yields
    d1, s1 = searcher.search_all(Q.TermQuery("table"))
    d2, s2 = searcher.search_all(Q.BlendedTermQuery(("table", "table")))
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(1.01 * s1, s2, rtol=1e-7)


def test_phrase_wildcard_matches_expanded_multiphrase(searcher, corpus):
    docs, freqs = searcher.phrase_wildcard_freqs(("table", "s*"))
    # brute force: count pos where tok[i]=='table' and tok[i+1].startswith('s')
    exp = {}
    for did, toks in zip(corpus["ids"].tolist(), corpus["tokens"]):
        c = sum(1 for i in range(len(toks) - 1)
                if toks[i] == "table" and toks[i + 1].startswith("s"))
        if c:
            exp[did] = c
    assert dict(zip(docs.tolist(), freqs.tolist())) == exp


def test_phrase_wildcard_max_expansions_caps(searcher):
    """The reference CAPS expansion at maxExpansions (it does not fail):
    a capped run returns a subset of the uncapped matches."""
    d_all, f_all = searcher.phrase_wildcard_freqs(("table", "s*"))
    d_cap, f_cap = searcher.phrase_wildcard_freqs(("table", "s*"),
                                                  max_expansions=1)
    full = dict(zip(d_all.tolist(), f_all.tolist()))
    assert d_cap.shape[0] < d_all.shape[0]
    for did, f in zip(d_cap.tolist(), f_cap.tolist()):
        assert f <= full[did]


def test_diversified_topk_caps_keys(searcher, corpus):
    docs, scores, keys = searcher.diversified_topk(
        Q.TermQuery("table"), "source", k=10, max_per_key=1)
    assert docs.shape[0] == 10
    assert len(set(keys.tolist())) == 10  # all distinct sources
    # scores descend; each kept doc is its source's best (score desc, doc asc)
    assert np.all(np.diff(scores) <= 1e-12)
    all_d, all_s = searcher.search_all(Q.TermQuery("table"))
    src = dict(zip(corpus["ids"].tolist(), corpus["sources"]))
    for did, sc, key in zip(docs.tolist(), scores.tolist(), keys.tolist()):
        assert src[did] == key
        rivals = [(s, d) for d, s in zip(all_d.tolist(), all_s.tolist())
                  if src[d] == key]
        best = max(rivals, key=lambda x: (x[0], -x[1]))
        assert (sc, -did) == (best[0], -best[1])


def test_diversified_max_per_key_2_superset(searcher):
    d1, _, k1 = searcher.diversified_topk(
        Q.TermQuery("table"), "source", k=30, max_per_key=2)
    counts = {}
    for key in k1.tolist():
        counts[key] = counts.get(key, 0) + 1
    assert max(counts.values()) <= 2


@pytest.fixture(scope="module")
def feat_index(ray_session, tmp_path_factory):
    """Small multi-segment index with a per-doc feature column, built from
    a SHUFFLED corpus so segment id ranges interleave (the covering
    feature lookup must survive non-contiguous doc_ids per segment)."""
    import ray.data

    from lucene_ray.index.build import build_index

    rng = np.random.default_rng(7)
    n = 120
    words = ["red", "green", "blue", "gold"]
    texts, mm = [], []
    for i in range(n):
        toks = rng.choice(words, size=8).tolist()
        texts.append(" ".join(toks))
        mm.append(1 + i % 4)  # includes mm=4 > len(queries)=3 -> match never
    perm = rng.permutation(n)
    t = pa.table({
        "doc_id": pa.array(np.arange(n)[perm], pa.int64()),
        "text": pa.array([texts[i] for i in perm], pa.string()),
        "mm": pa.array([mm[i] for i in perm], pa.int64()),
    })
    idx = str(tmp_path_factory.mktemp("featidx") / "index")
    build_index(ray.data.from_arrow(t), idx, num_segments=3,
                features={"mm": "mm"})
    return idx, {int(d): (texts[i], mm[i])
                 for i, d in enumerate(np.arange(n))}


def test_covering_query_per_doc_min_match(feat_index):
    idx, truth = feat_index
    s = Searcher(idx)
    subs = (Q.TermQuery("red"), Q.TermQuery("green"), Q.TermQuery("blue"))
    docs, scores = s.search_all(
        Q.CoveringQuery(subs, min_match_feature="mm"))
    got = set(docs.tolist())
    per_term = {}
    for did, (text, mm) in truth.items():
        toks = text.split()
        nmatch = sum(1 for w in ("red", "green", "blue") if w in toks)
        expect = nmatch >= max(1, mm)
        assert (did in got) == expect, (did, toks, mm, nmatch)
        per_term[did] = nmatch
    assert any(v == 4 for _t, v in truth.values())  # mm>len(subs) exercised
    # score = sum of matching sub scores
    sub_scores = {}
    for subq in subs:
        d, sc = s.search_all(subq)
        for dd, ss in zip(d.tolist(), sc.tolist()):
            sub_scores[dd] = sub_scores.get(dd, 0.0) + ss
    got_scores = dict(zip(docs.tolist(), scores.tolist()))
    for did, sc in got_scores.items():
        np.testing.assert_allclose(sc, sub_scores[did], rtol=1e-9)


def test_covering_query_constant_fallback(feat_index):
    idx, truth = feat_index
    s = Searcher(idx)
    subs = (Q.TermQuery("red"), Q.TermQuery("green"), Q.TermQuery("blue"))
    docs, _ = s.search_all(Q.CoveringQuery(subs, min_match=2))
    got = set(docs.tolist())
    for did, (text, _mm) in truth.items():
        toks = text.split()
        nmatch = sum(1 for w in ("red", "green", "blue") if w in toks)
        assert (did in got) == (nmatch >= 2)


def test_doc_values_stats_multi_segment(built_index):
    idx, _ = built_index
    # rebuild WITH a feature column over the sf corpus
    import ray.data

    from lucene_ray.index.build import build_index as _bi
    import tempfile

    src = os.path.join(SF_DIR, "documents.parquet")
    t = pq.read_table(src, columns=["doc_id", "text", "n_chars"])
    with tempfile.TemporaryDirectory() as tmp:
        fidx = os.path.join(tmp, "idx")
        _bi(ray.data.from_arrow(t), fidx, num_segments=4,
            features={"chars": "n_chars"})
        s = Searcher(fidx)
        st = s.doc_values_stats(Q.TermQuery("table"), "chars")
        docs, _ = s.search_all(Q.TermQuery("table"))
        nch = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
        vals = np.array([nch[d] for d in docs.tolist()], np.float64)
        assert st["count"] == vals.shape[0]
        assert st["vmin"] == vals.min() and st["vmax"] == vals.max()
        np.testing.assert_allclose(st["vsum"], vals.sum(), rtol=1e-12)
        np.testing.assert_allclose(st["mean"], vals.mean(), rtol=1e-12)
        np.testing.assert_allclose(st["variance"], vals.var(), rtol=1e-9)
        empty = s.doc_values_stats(Q.TermQuery("zzz-absent"), "chars")
        assert empty["count"] == 0 and empty["vmin"] is None


def test_dynamic_range_facets_ntile_semantics(ray_session):
    import ray.data

    from lucene_ray.pipelines.facets import dynamic_range_facets

    vals = [5, 5, 5, 1, 2, 9, 9, 3, 7, 8, 2]  # 11 values, 4 buckets: 3,3,3,2
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    t = dynamic_range_facets(ds, "v", 4)
    assert t["bucket"].to_pylist() == [1, 2, 3, 4]
    assert t["count"].to_pylist() == [3, 3, 3, 2]
    srt = sorted(vals)
    exp = [srt[0:3], srt[3:6], srt[6:9], srt[9:11]]
    assert t["vmin"].to_pylist() == [float(min(b)) for b in exp]
    assert t["vmax"].to_pylist() == [float(max(b)) for b in exp]
    assert t["vsum"].to_pylist() == [float(sum(b)) for b in exp]


def test_dynamic_range_more_buckets_than_rows(ray_session):
    import ray.data

    from lucene_ray.pipelines.facets import dynamic_range_facets

    ds = ray.data.from_arrow(pa.table({"v": [4, 2]}))
    t = dynamic_range_facets(ds, "v", 4)
    assert t["count"].to_pylist() == [1, 1, 0, 0]
    assert t["vmin"].to_pylist()[:2] == [2.0, 4.0]
    assert t["vsum"].to_pylist() == [2.0, 4.0, 0.0, 0.0]


def test_phrase_wildcard_query_composable(searcher, corpus):
    """PhraseWildcardQuery as a first-class Query: same matches as the
    freq API, scored with the concrete slots' phrase BM25; composes in a
    boolean; the classic parser maps quoted wildcard phrases to it
    (ComplexPhraseQueryParser role)."""
    from lucene_ray.search.parser import parse_query

    q = Q.PhraseWildcardQuery(("table", "s*"))
    docs, scores = searcher.search_all(q)
    fd, ff = searcher.phrase_wildcard_freqs(("table", "s*"))
    assert sorted(docs.tolist()) == sorted(fd.tolist())
    assert (scores > 0).all()
    # parser mapping
    assert parse_query('"table s*"') == q
    # scores equal a plain phrase scorer fed the wildcard freq with the
    # concrete slot's idf: compare against PhraseQuery on an exact pair
    # where the wildcard expands to a single term per segment is corpus-
    # dependent; instead check all-wildcard degrades to constant boost
    d2, s2 = searcher.search_all(Q.PhraseWildcardQuery(("tab*", "s*"),
                                                       boost=3.0))
    assert d2.shape[0] > 0 and (s2 == 3.0).all()
    # composes inside a boolean MUST
    d3, _ = searcher.search_all(Q.BooleanQuery(
        must=(q, Q.TermQuery("key"))))
    assert set(d3.tolist()) <= set(docs.tolist())
    # dict round-trip
    assert Q.query_from_dict(q.to_dict()) == q
