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


def test_phrase_wildcard_max_expansions_raises(searcher):
    with pytest.raises(ValueError, match="max_expansions"):
        searcher.phrase_wildcard_freqs(("table", "s*"), max_expansions=1)


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
