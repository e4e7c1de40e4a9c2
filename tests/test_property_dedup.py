"""Property-based dedup checks: exact shingle-Jaccard pairs and exact
content dedup vs brute-force set math over random corpora (no shared
code on the brute side)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = ["aa", "bb", "cc", "dd"]

doc = st.lists(st.sampled_from(VOCAB), min_size=2, max_size=8).map(" ".join)
corpus = st.lists(doc, min_size=2, max_size=12)


def _shingles(text, n=2):
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpus, thr=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
def test_jaccard_pairs_match_brute(ray_session, docs, thr):
    import ray.data

    from lucene_ray.pipelines.dedup import jaccard_pairs

    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = jaccard_pairs(ray.data.from_arrow(t), threshold=thr,
                        strategy="broadcast")
    got_pairs = {(r["a"], r["b"]): r["jaccard"]
                 for r in got.take_all()}
    want = {}
    for i, j in itertools.combinations(range(len(docs)), 2):
        si, sj = _shingles(docs[i]), _shingles(docs[j])
        if not si or not sj:
            continue
        jac = len(si & sj) / len(si | sj)
        if jac >= thr:
            want[(i, j)] = jac
    assert set(got_pairs) == set(want)
    for k, v in want.items():
        assert abs(got_pairs[k] - v) < 1e-9


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpus)
def test_exact_content_dedup_matches_brute(ray_session, docs):
    import ray.data

    from lucene_ray.pipelines.dedup import dedup_exact_content

    n = len(docs)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)]),
        "warc_ts": pa.array([1_700_000_000_000 + i * 1000
                             for i in range(n)],
                            pa.timestamp("ms")),
        "text": pa.array(docs)})
    out = dedup_exact_content(ray.data.from_arrow(t))
    kept = sorted(r["doc_id"] for r in out.take_all())
    # latest capture wins per content (max (warc_ts, doc_id))
    best = {}
    for i, d in enumerate(docs):
        best[d] = i
    assert kept == sorted(best.values())
