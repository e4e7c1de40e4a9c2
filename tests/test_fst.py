"""Minimal-FST construction (util/fst.py — FSTCompiler.java:44 role) and
the AnalyzingSuggester built on it (AnalyzingSuggester.java:100)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.util.fst import build_fst


def _random_pairs(seed, n=3000, maxlen=12):
    rng = np.random.default_rng(seed)
    words = sorted({
        bytes(rng.integers(97, 123, size=rng.integers(1, maxlen))
              .astype(np.uint8)) for _ in range(n)})
    return {w: int(rng.integers(0, 10 ** 6)) for w in words}


def test_fst_get_parity_random():
    outs = _random_pairs(7)
    f = build_fst(sorted(outs.items()))
    for w, o in outs.items():
        assert f.get(w) == o
    rng = np.random.default_rng(11)
    for _ in range(1500):
        w = bytes(rng.integers(97, 123, size=rng.integers(1, 12))
                  .astype(np.uint8))
        assert f.get(w) == outs.get(w)


def test_fst_completions_sorted_parity():
    outs = _random_pairs(3, n=800, maxlen=8)
    f = build_fst(sorted(outs.items()))
    for pre in (b"", b"a", b"ab", b"zz", b"qx"):
        got = list(f.completions(pre))
        want = [(w, outs[w]) for w in sorted(outs) if w.startswith(pre)]
        assert got == want
    assert len(list(f.completions(b"", limit=5))) == 5


def test_fst_minimality_invariant():
    """No two compiled states share a right language: the hash-consing
    signature (arcs + finality) is unique per state — the property the
    Daciuk et al. construction guarantees — and suffix sharing makes
    the FST strictly smaller than the prefix trie."""
    outs = _random_pairs(5, n=1500)
    f = build_fst(sorted(outs.items()))
    sigs = set()
    for s in range(f.num_states):
        lo, hi = int(f.arc_start[s]), int(f.arc_start[s + 1])
        sig = (bool(f.final[s]), int(f.final_out[s]),
               f.labels[lo:hi].tobytes(),
               f.targets[lo:hi].tobytes(), f.outs[lo:hi].tobytes())
        assert sig not in sigs
        sigs.add(sig)
    trie_nodes = len({w[:i] for w in outs for i in range(len(w) + 1)})
    assert f.num_states < trie_nodes


def test_fst_output_pushing_prefix_keys():
    """Keys that are prefixes of each other exercise the final-output
    path of the Mihov-Maurel pushing; tiny hand-checkable case."""
    f = build_fst([(b"a", 5), (b"ab", 3), (b"abc", 9), (b"b", 0)])
    assert f.get(b"a") == 5 and f.get(b"ab") == 3 and f.get(b"abc") == 9
    assert f.get(b"b") == 0 and f.get(b"abcd") is None
    # suffix sharing across distinct stems with equal outputs
    g = build_fst([(b"talked", 2), (b"walked", 2)])
    assert g.num_states < 13  # "alked" tail shared


def test_fst_rejects_bad_input():
    with pytest.raises(ValueError):
        build_fst([(b"b", 1), (b"a", 1)])
    with pytest.raises(ValueError):
        build_fst([(b"a", 1), (b"a", 2)])
    with pytest.raises(ValueError):
        build_fst([(b"a", -1)])


def test_analyzing_suggester_semantics():
    from lucene_ray.pipelines.suggest import AnalyzingSuggester

    t = pa.table({
        "surface": ["key", "key value", "key window", "keyboard",
                    "The Fast", "sort"],
        "weight": [5, 9, 3, 2, 4, 7]})
    s = AnalyzingSuggester(t)
    # EXACT_FIRST: exact analyzed match outranks heavier prefix matches
    got = s.lookup("key", k=4).to_pylist()
    assert [r["surface"] for r in got] == [
        "key", "key value", "key window", "keyboard"]
    # PRESERVE_SEP: completion crosses the token boundary
    assert s.lookup("key v", k=3).to_pylist() == [
        {"surface": "key value", "weight": 9}]
    # analysis applies to query AND surface: mixed case unifies
    assert s.lookup("the fa", k=2).to_pylist() == [
        {"surface": "The Fast", "weight": 4}]
    # without preserve_sep, "keyv" completes into the joined form
    s2 = AnalyzingSuggester(t, preserve_sep=False)
    assert [r["surface"] for r in s2.lookup("keyv", k=2).to_pylist()] == [
        "key value"]
    # maxSurfaceFormsPerAnalyzedForm keeps only the top-weight surfaces
    dup = pa.table({"surface": ["tab", "tab", "Tab"], "weight": [1, 2, 9]})
    s3 = AnalyzingSuggester(dup, max_surface_per_analyzed=1)
    assert s3.lookup("tab", k=5).to_pylist() == [
        {"surface": "Tab", "weight": 9}]


def test_corpus_prefix_surfaces_counts(ray_session, sf_dir):
    import os

    import pyarrow.parquet as pq
    import ray.data

    from lucene_ray.pipelines.suggest import corpus_prefix_surfaces

    path = os.path.join(sf_dir, "documents.parquet")
    pages = ray.data.read_parquet(path, columns=["text"])
    got = corpus_prefix_surfaces(pages, max_tokens=2)
    texts = pq.read_table(path)["text"].to_pylist()
    want: dict[str, int] = {}
    for x in texts:
        ts = x.split(" ")
        if ts and ts[0]:
            want[ts[0]] = want.get(ts[0], 0) + 1
        if len(ts) >= 2:
            k = ts[0] + " " + ts[1]
            want[k] = want.get(k, 0) + 1
    got_d = {s: int(w) for s, w in
             zip(got["surface"].to_pylist(), got["weight"].to_pylist())
             if s}
    assert got_d == want


def test_context_suggester_filters_and_boosts(ray_session):
    """ContextQuery/ContextSuggestField roles: context filter, per-
    context boost, allContexts mode."""
    import pyarrow as pa

    from lucene_ray.pipelines.suggest import ContextSuggester

    t = pa.table({
        "context": ["us", "us", "uk", "uk", "de"],
        "surface": ["key west", "key largo", "key largo", "keyboard",
                    "key west"],
        "weight": [5, 3, 7, 9, 2],
    })
    sug = ContextSuggester(t)
    # filter: only 'us' entries, boosted x2
    r = sug.lookup("key", contexts={"us": 2.0})
    assert r.to_pylist() == [
        {"surface": "key west", "context": "us", "score": 10.0},
        {"surface": "key largo", "context": "us", "score": 6.0},
    ]
    # boost reorders across contexts
    r2 = sug.lookup("key", contexts={"us": 1.0, "uk": 10.0})
    assert r2.to_pylist()[0] == {
        "surface": "keyboard", "context": "uk", "score": 90.0}
    # allContexts mode sees every context with boost 1
    r3 = sug.lookup("key")
    assert {x["context"] for x in r3.to_pylist()} == {"us", "uk", "de"}
    # multi-token analyzed prefix completes across words (PRESERVE_SEP)
    r4 = sug.lookup("key w", contexts={"us": 1.0})
    assert [x["surface"] for x in r4.to_pylist()] == ["key west"]


def test_fuzzy_completion_lookup(ray_session):
    """FuzzyCompletionQuery role: typo'd prefixes complete; exact
    prefix wins at 0 edits; nonFuzzyPrefix gates the first byte."""
    import pyarrow as pa

    from lucene_ray.pipelines.suggest import (AnalyzingSuggester,
                                              FuzzySuggesterLookup)

    sug = AnalyzingSuggester(pa.table({
        "surface": ["key west", "key largo", "kelp", "label"],
        "weight": [5, 9, 3, 7],
    }))
    fz = FuzzySuggesterLookup(sug)
    r = fz.lookup("kye", max_edits=1)
    # all three 'k' entries match within 1 edit of some prefix
    # ('kye'~'key', 'kye'~'ke'); rank = (edits, weight desc, surface)
    assert [x["surface"] for x in r.to_pylist()] == [
        "key largo", "key west", "kelp"]
    assert all(x["edits"] == 1 for x in r.to_pylist())
    # exact prefix at 0 edits sorts before fuzzier candidates
    r2 = fz.lookup("ke", max_edits=1)
    assert [x["edits"] for x in r2.to_pylist()][:3] == [0, 0, 0]
    # nonFuzzyPrefix: 'label' never matches a 'k'-prefixed query
    assert all(not x["surface"].startswith("label")
               for x in r2.to_pylist())
    # max_edits=0 == plain prefix completion
    r3 = fz.lookup("key", max_edits=0)
    assert {x["surface"] for x in r3.to_pylist()} == {"key west",
                                                      "key largo"}


def test_regex_completion_lookup(ray_session):
    import pyarrow as pa

    from lucene_ray.pipelines.suggest import (AnalyzingSuggester,
                                              RegexSuggesterLookup)

    sug = AnalyzingSuggester(pa.table({
        "surface": ["key west", "key largo", "kelp", "label"],
        "weight": [5, 9, 3, 7]}))
    r = RegexSuggesterLookup(sug).lookup("k[ey]+")
    assert [x["surface"] for x in r.to_pylist()] == [
        "key largo", "key west", "kelp"]
    assert RegexSuggesterLookup(sug).lookup("zz+").num_rows == 0
    # anchored at start (regex matches a PREFIX, not anywhere)
    assert RegexSuggesterLookup(sug).lookup("abel").num_rows == 0
