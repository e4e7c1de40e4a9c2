"""Matches API (search/Matches.java:33, MatchesIterator.java:38,
Weight#matches) — per-doc match positions/offsets."""

import numpy as np
import pytest

from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher


@pytest.fixture(scope="module")
def searcher(built_index):
    idx, _m = built_index
    return Searcher(idx)


def _first_doc(s, q):
    docs, _ = s.search_all(q)
    assert docs.shape[0] > 0
    return int(docs.min())


def test_term_matches_positions_and_offsets(searcher, brute_force):
    d = _first_doc(searcher, Q.TermQuery("table"))
    ms = searcher.matches(Q.TermQuery("table"), d)
    toks = brute_force["tokens"][list(brute_force["ids"]).index(d)]
    want_pos = [i for i, t in enumerate(toks) if t == "table"]
    assert [m[2] for m in ms] == want_pos
    for _f, label, sp, ep, so, eo in ms:
        assert label == "table" and sp == ep
        assert eo - so == len("table")


def test_non_matching_doc_returns_none(searcher):
    docs, _ = searcher.search_all(Q.TermQuery("table"))
    missing = sorted(set(range(500)) - set(docs.tolist()))[0]
    assert searcher.matches(Q.TermQuery("table"), missing) is None


def test_exact_phrase_spans(searcher, brute_force):
    q = Q.PhraseQuery(("key", "value"))
    d = _first_doc(searcher, q)
    ms = searcher.matches(q, d)
    toks = brute_force["tokens"][list(brute_force["ids"]).index(d)]
    want = [i for i in range(len(toks) - 1)
            if toks[i] == "key" and toks[i + 1] == "value"]
    assert [(m[2], m[3]) for m in ms] == [(p, p + 1) for p in want]
    # offsets cover "key value" exactly (corpus is space-joined tokens)
    for _f, label, sp, ep, so, eo in ms:
        assert label == "key value" and eo - so == len("key value")


def test_boolean_unions_positive_clauses_only(searcher):
    d = _first_doc(searcher, Q.BooleanQuery(
        must=(Q.TermQuery("key"), Q.TermQuery("value"))))
    both = searcher.matches(Q.BooleanQuery(
        must=(Q.TermQuery("key"), Q.TermQuery("value"))), d)
    labels = {m[1] for m in both}
    assert labels == {"key", "value"}
    # sorted by start position
    starts = [m[2] for m in both]
    assert starts == sorted(starts)


def test_multiterm_expansion_matches(searcher):
    q = Q.PrefixQuery("tab")
    d = _first_doc(searcher, q)
    ms = searcher.matches(q, d)
    assert ms and all(m[1].startswith("tab") for m in ms)


def test_match_without_positional_leaves_is_empty_list(searcher):
    ms = searcher.matches(Q.MatchAllDocsQuery(), 0)
    assert ms == []  # matches, but no positional terms (MATCH_WITH_NO_TERMS)


def test_search_timeout_partial_results(searcher):
    """IndexSearcher#setTimeout / TimeLimitingCollector role: an
    already-expired deadline skips every segment -> partial (empty)
    TopDocs flagged timed_out with relation GTE; a generous deadline
    changes nothing."""
    td = searcher.search(Q.TermQuery("table"), k=5, timeout_s=0.0)
    assert td.timed_out and td.relation == "GTE"
    assert td.doc_ids.shape[0] == 0 and td.total_hits == 0
    ok = searcher.search(Q.TermQuery("table"), k=5, timeout_s=60.0)
    ref = searcher.search(Q.TermQuery("table"), k=5)
    assert not ok.timed_out
    assert np.array_equal(ok.doc_ids, ref.doc_ids)
    assert ok.total_hits == ref.total_hits


def test_top_passages_scoring(searcher, brute_force):
    """PassageScorer role: windows ranked by summed tf*idf, ties ->
    earliest window; per-doc cap; offsets cover the window's tokens."""
    import math

    from lucene_ray.search.highlight import top_passages

    terms = {"scan", "column"}
    docs, _ = searcher.search_all(Q.BooleanQuery(
        must=(Q.TermQuery("scan"), Q.TermQuery("column"))))
    sel = sorted(int(x) for x in docs)[:2]
    t = top_passages(searcher, sel, terms, max_passages=2, window=10)
    stats = searcher.term_stats(terms)
    n = searcher.doc_count
    idf = {k: math.log(1 + (n - df + 0.5) / (df + 0.5))
           for k, (df, _) in stats.items()}
    ids = list(brute_force["ids"])
    for doc in sel:
        toks = brute_force["tokens"][ids.index(doc)]
        wins = {}
        for p, w in enumerate(toks):
            if w in terms:
                wins[p // 10 * 10] = wins.get(p // 10 * 10, 0.0) + idf[w]
        want = sorted(((s, ws) for ws, s in wins.items()),
                      key=lambda x: (-x[0], x[1]))[:2]
        got = [(r["score"], r["win_start"])
               for r in t.to_pylist() if r["doc_id"] == doc]
        assert [(round(a, 9), b) for a, b in got] == \
               [(round(a, 9), b) for a, b in want]


def test_format_passage_tags_matches(searcher):
    """DefaultPassageFormatter role: tags wrap the match offsets inside
    the passage slice; overlaps merge; ellipsis marks mid-doc starts."""
    from lucene_ray.search.highlight import format_passage

    q = Q.PhraseQuery(("key", "value"))
    d = _first_doc(searcher, q)
    ms = searcher.matches(q, d)
    text = searcher.fetch_docs([d], columns=["doc_id", "text"])["text"][0].as_py()
    sp, ep = ms[0][4], ms[0][5]
    snippet = format_passage(text, [(sp, ep)], max(0, sp - 10), ep + 10)
    assert "<b>key value</b>" in snippet
    if sp > 10:
        assert snippet.startswith("... ")
    # overlap merging
    s2 = format_passage("abcdef", [(1, 4), (3, 5)], 0, 5)
    assert s2 == "a<b>bcde</b>f"


def test_distributed_search_timeout(built_index):
    """Timeout distributed per executor leaf slice: expired deadline ->
    partial TopDocs flagged; generous deadline == no-timeout result."""
    from lucene_ray.search.executor import DistributedSearcher

    idx, _m = built_index
    ds = DistributedSearcher(idx, num_executors=2)
    try:
        ref = ds.search("table", k=5)
        ok = ds.search("table", k=5, timeout_s=60.0)
        assert not ok.timed_out and ok.total_hits == ref.total_hits
        assert np.array_equal(ok.doc_ids, ref.doc_ids)
        expired = ds.search("table", k=5, timeout_s=0.0)
        assert expired.timed_out and expired.relation == "GTE"
        assert expired.total_hits == 0
    finally:
        ds.shutdown()


def test_interval_matches_are_true_spans(searcher, brute_force):
    """IntervalsSource.matches contract: interval queries report the
    minimal interval spans (not just leaf term occurrences)."""
    from lucene_ray.search import intervals as IV

    q = Q.IntervalQuery(IV.Ordered((IV.Term("scan"), IV.Term("column")),
                                   maxgaps=3))
    docs, _ = searcher.search_all(q)
    d = int(docs.min())
    ms = [m for m in searcher.matches(q, d) if m[1] == "intervals"]
    assert ms
    toks = brute_force["tokens"][list(brute_force["ids"]).index(d)]
    for _f, _label, sp, ep, so, eo in ms:
        assert toks[sp] == "scan" and toks[ep] == "column"
        assert 0 < ep - sp - 1 + 1 <= 4  # within maxgaps+1 positions
        assert eo > so >= 0
