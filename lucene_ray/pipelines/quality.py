"""Relevance-quality evaluation — the reference benchmark's `quality`
package (benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityBenchmark.java:37-120, trec/TrecTopicsReader.java:48, judge
Judge.java / QualityStats.java:28-160).

The reference runs TREC topics through the engine and scores each ranked
list against judgments (qrels): precision@k, average precision (MAP when
averaged), recall — QualityStats keeps per-rank precision points. This
module reproduces that harness over the repo's Searcher: each topic is a
disjunctive BM25 query (SHOULD over its terms, the shape QualityQueryParser
builds), the ranked list is the engine's top-k (score desc, doc asc
tie-break), and metrics use binary qrels:

  P@k     = |relevant in top k| / k
  AP@k    = sum_{r<=k, doc_r relevant} P@r / |relevant total|
  nDCG@k  = DCG@k / IDCG@k,  DCG = sum 1/log2(rank+1) over relevant hits

All metrics are plain float64 ratios so a SQL oracle reproduces them
bit-for-bit (modulo 4-decimal rounding).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.search import query as Q


def _round4(x: np.ndarray) -> np.ndarray:
    return np.round(np.asarray(x, dtype=np.float64), 4)


def rank_topic(searcher, terms, k: int = 10, field=None) -> np.ndarray:
    """Ranked doc ids for one topic: SHOULD-disjunction over its terms
    (QualityBenchmark -> simple parser shape), top-k by (rounded score
    desc, doc asc) — the same tie-break as the engine's TopDocs merge.

    Scale note: this uses ``search_all`` (every match driver-side) so the
    4-decimal rounding tie-break matches the SQL oracle bit-for-bit; a
    production evaluation over a web-scale corpus should use
    ``searcher.search(query, k)`` — the block-max top-k path — since
    metric@k only needs the head of the ranking."""
    query = (
        Q.TermQuery(terms[0], field=field)
        if len(terms) == 1
        else Q.BooleanQuery(should=tuple(Q.TermQuery(t, field=field)
                                         for t in terms))
    )
    docs, scores = searcher.search_all(query)
    order = np.lexsort((docs, -_round4(scores)))[:k]
    return docs[order]


def topic_metrics(ranked: np.ndarray, relevant: set, k: int = 10) -> dict:
    """QualityStats for one topic (QualityStats.java:28-160, binary rel)."""
    ranked = np.asarray(ranked[:k])
    rel_mask = np.fromiter((int(d) in relevant for d in ranked), dtype=bool,
                           count=ranked.shape[0])
    n_rel = len(relevant)
    ranks = np.arange(1, ranked.shape[0] + 1, dtype=np.float64)
    cum_hits = np.cumsum(rel_mask).astype(np.float64)
    p_at_k = float(cum_hits[-1] / k) if ranked.shape[0] else 0.0
    if n_rel:
        ap = float((cum_hits[rel_mask] / ranks[rel_mask]).sum() / n_rel)
        dcg = float((1.0 / np.log2(ranks[rel_mask] + 1.0)).sum())
        ideal = np.arange(1, min(n_rel, k) + 1, dtype=np.float64)
        idcg = float((1.0 / np.log2(ideal + 1.0)).sum())
        ndcg = dcg / idcg if idcg > 0 else 0.0
        recall = float(cum_hits[-1] / n_rel) if ranked.shape[0] else 0.0
    else:
        ap = ndcg = recall = 0.0
    return {"num_rel": n_rel, "p_at_k": p_at_k, "ap": ap,
            "ndcg": ndcg, "recall": recall}


def evaluate_topics(searcher, topics, qrels: dict, k: int = 10) -> pa.Table:
    """Run every (qid, terms) topic and score it against ``qrels[qid]``
    (set of relevant doc ids). Returns one row per topic plus metric
    columns — the per-topic table QualityBenchmark.execute returns (its
    averaged MAP is just mean(ap) over this table)."""
    rows = {"qid": [], "num_rel": [], "p_at_k": [], "ap": [], "ndcg": [],
            "recall": []}
    for qid, terms in topics:
        ranked = rank_topic(searcher, tuple(terms), k=k)
        m = topic_metrics(ranked, qrels.get(qid, set()), k=k)
        rows["qid"].append(qid)
        for key in ("num_rel", "p_at_k", "ap", "ndcg", "recall"):
            rows[key].append(m[key])
    return pa.table({
        "qid": pa.array(rows["qid"], type=pa.string()),
        "num_rel": pa.array(rows["num_rel"], type=pa.int64()),
        "p_at_k": pa.array(np.round(rows["p_at_k"], 4), type=pa.float64()),
        "ap": pa.array(np.round(rows["ap"], 4), type=pa.float64()),
        "ndcg": pa.array(np.round(rows["ndcg"], 4), type=pa.float64()),
        "recall": pa.array(np.round(rows["recall"], 4), type=pa.float64()),
    })
