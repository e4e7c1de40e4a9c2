"""TREC-style search-quality evaluation — the benchmark quality package
(benchmark/src/java/org/apache/lucene/benchmark/quality/QualityBenchmark.java:44,
QualityStats.java:27, Judge.java:26): run a query set against the index,
compare the ranked results to per-query relevance judgments, and report
QualityStats' metrics per query: precision@n, recall@n, average
precision and reciprocal rank.

Conventions (documented where they pin down the reference's free
choices):
* ranking ties break by (round4(score) desc, doc_id asc) — the house
  deterministic order shared with every top-k oracle;
* average precision truncates the ranking at ``k`` but divides by the
  TOTAL number of relevant docs (standard truncated AP; QualityStats
  divides by its maxGoodPoints the same way when judgments fit in the
  window);
* reciprocal rank is 0 when no relevant doc appears in the top ``k``.
"""

from __future__ import annotations

import numpy as np

from lucene_ray.search import query as Q


def term_frequency_judgments(searcher, term: str, min_tf: int = 2) -> np.ndarray:
    """A deterministic Judge (quality/Judge.java:26 role): the relevant
    set for query ``term`` is every live doc whose term frequency is
    >= ``min_tf`` — derived from the postings themselves, so the
    judgment file is reproducible from the corpus alone."""
    from lucene_ray.index.deletes import mask_live

    parts = []
    for reader in searcher.readers:
        pr = reader.postings_for(term)
        if pr is None:
            continue
        docs, freqs, _norms = pr.decode_all()
        g = docs.astype(np.int64) + reader.doc_base
        parts.append(g[freqs >= min_tf])
    if not parts:
        return np.empty(0, np.int64)
    rel = np.unique(np.concatenate(parts))
    return rel[mask_live(rel, searcher.tombstones)]


def _ranked_topk(searcher, term: str, k: int) -> np.ndarray:
    docs, scores = searcher.search_all(Q.TermQuery(term))
    r4 = np.round(scores, 4)
    order = np.lexsort((docs, -r4))[:k]
    return docs[order]


def quality_benchmark(searcher, terms: list, k: int = 10,
                      min_tf: int = 2) -> list:
    """QualityBenchmark.execute role: one row per query term —
    (query, p_at_k, recall_at_k, avg_precision, reciprocal_rank)."""
    out = []
    for t in terms:
        rel = term_frequency_judgments(searcher, t, min_tf=min_tf)
        ranked = _ranked_topk(searcher, t, k)
        is_rel = np.isin(ranked, rel, assume_unique=True)
        n_rel = int(rel.shape[0])
        hits = int(is_rel.sum())
        p_at_k = hits / k
        recall = hits / n_rel if n_rel else 0.0
        # truncated AP: mean of precision@r at each relevant rank r
        ranks = np.flatnonzero(is_rel) + 1
        ap = (float(np.sum(np.arange(1, ranks.shape[0] + 1) / ranks))
              / n_rel) if n_rel else 0.0
        rr = 1.0 / float(ranks[0]) if ranks.shape[0] else 0.0
        out.append({"query": t, "p_at_k": p_at_k, "recall_at_k": recall,
                    "avg_precision": ap, "reciprocal_rank": rr})
    return out
