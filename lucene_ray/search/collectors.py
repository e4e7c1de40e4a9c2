"""Public Collector / CollectorManager hook — the
IndexSearcher.search(Query, CollectorManager) extension surface
(lucene/core/src/java/org/apache/lucene/search/CollectorManager.java:42,
Collector.java:31): a user-defined per-segment collector consumes each
leaf's (local docs, scores, reader), and the manager reduces the
per-segment partials into the final result.

The engine's internal collectors (top-k, counts, facets) already run as
per-partition collect + driver reduce; this module makes the same
protocol a USER hook — the round-3 survey gap (§2.12 "no public
custom-collector hook"). The per-segment shape is exactly what
distributes: ``collect`` runs where the segment lives (one call per
reader, vectorized over that segment's hits — NOT per document, the
idiomatic batch version of LeafCollector.collect), ``reduce`` folds the
small partials on the driver.

Built-in managers mirror the reference's stock collectors
(TotalHitCountCollectorManager, TopScoreDocCollector's manager) and are
implemented THROUGH the public hook, so the extension point stays
honest."""

from __future__ import annotations

import numpy as np


class CollectorManager:
    """Subclass and implement both methods (CollectorManager.java:42).

    ``collect_leaf(reader, global_docs, scores) -> partial`` runs once
    per segment with that segment's matching docs (tombstones already
    masked, scores per the query); ``reduce(partials) -> result`` folds
    the per-segment partials. Partials must be small — they travel to
    the driver."""

    def collect_leaf(self, reader, docs: np.ndarray,
                     scores: np.ndarray):
        raise NotImplementedError

    def reduce(self, partials: list):
        raise NotImplementedError


class TotalHitCountCollectorManager(CollectorManager):
    """search/TotalHitCountCollectorManager.java role: just the count."""

    def collect_leaf(self, _reader, docs, _scores):
        return int(docs.shape[0])

    def reduce(self, partials):
        return int(sum(partials))


class TopScoreDocCollectorManager(CollectorManager):
    """TopScoreDocCollector's manager role: per-segment partial top-k,
    merged with the (score desc, doc asc) tie-break."""

    def __init__(self, k: int = 10):
        self.k = k

    def collect_leaf(self, _reader, docs, scores):
        if docs.shape[0] <= self.k:
            return docs, scores
        part = np.argpartition(-scores, self.k - 1)[: self.k]
        return docs[part], scores[part]

    def reduce(self, partials):
        if not partials:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs = np.concatenate([p[0] for p in partials])
        scores = np.concatenate([p[1] for p in partials])
        order = np.lexsort((docs, -scores))[: self.k]
        return docs[order], scores[order]


class HistogramCollectorManager(CollectorManager):
    """A doc-values histogram over the matching docs — the
    DocValuesStats-flavored example the reference docs use for custom
    collectors: counts of ``feature`` values bucketed by ``width``."""

    def __init__(self, feature: str, width: float):
        self.feature = feature
        self.width = float(width)

    def collect_leaf(self, reader, docs, _scores):
        rows = np.searchsorted(reader.doc_ids, docs)
        rows = np.clip(rows, 0, max(reader.doc_ids.shape[0] - 1, 0))
        sel = reader.doc_ids[rows] == docs if reader.doc_ids.shape[0] \
            else np.zeros(docs.shape[0], dtype=bool)
        v = reader.feature(self.feature)[rows[sel]]
        buckets = np.floor(v / self.width).astype(np.int64)
        ub, cnt = np.unique(buckets, return_counts=True)
        return ub, cnt

    def reduce(self, partials):
        out: dict = {}
        for ub, cnt in partials:
            for b, c in zip(ub.tolist(), cnt.tolist()):
                out[b] = out.get(b, 0) + c
        return dict(sorted(out.items()))


class TopFieldStringDVCollectorManager(CollectorManager):
    """Top-k by a STRING doc-values field (the SortedDocValues sort,
    TopFieldCollector role) with committed string-DV update overlays
    applied — per-segment partial top-k, merged with (value, doc)
    tie-break. Ascending by default, like Sort.STRING."""

    def __init__(self, name: str, k: int = 10, ascending: bool = True):
        self.name = name
        self.k = k
        self.ascending = ascending

    def _key(self, p):
        # tie-break doc ASC in both directions (TopFieldCollector's
        # stable secondary order)
        return (p[0], p[1]) if self.ascending else (p[0], -p[1])

    def collect_leaf(self, reader, docs, _scores):
        import pyarrow as pa

        rows = np.searchsorted(reader.doc_ids, docs)
        rows = np.clip(rows, 0, max(reader.doc_ids.shape[0] - 1, 0))
        sel = reader.doc_ids[rows] == docs if reader.doc_ids.shape[0] \
            else np.zeros(docs.shape[0], dtype=bool)
        vals = reader.string_values(self.name).take(
            pa.array(rows[sel])).to_pylist()
        pairs = sorted(zip(vals, (int(x) for x in docs[sel])),
                       key=self._key, reverse=not self.ascending)
        return pairs[: self.k]

    def reduce(self, partials):
        pairs = [p for part in partials for p in part]
        pairs.sort(key=self._key, reverse=not self.ascending)
        return pairs[: self.k]


class TopFieldExpressionCollectorManager(CollectorManager):
    """Top-k by a computed expression of numeric doc-values features —
    the expressions sort binding (expressions/Expression.getSortField,
    lucene/expressions/src/java/org/apache/lucene/expressions/
    Expression.java:118 + ExpressionValueSource): per-segment partial
    top-k of the compiled expression's value at the matching docs,
    merged with (value, doc asc) tie-break. ``ascending=False`` is the
    reference's reverse sort (largest value first)."""

    def __init__(self, expression: str, features: tuple, k: int = 10,
                 ascending: bool = False):
        self.expression = expression
        self.features = tuple(features)
        self.k = k
        self.ascending = ascending

    def _sortkey(self, p):
        return (p[0] if self.ascending else -p[0], p[1])

    def collect_leaf(self, reader, docs, _scores):
        from lucene_ray.search.scoring import _compiled_expr

        rows = np.searchsorted(reader.doc_ids, docs)
        rows = np.clip(rows, 0, max(reader.doc_ids.shape[0] - 1, 0))
        sel = reader.doc_ids[rows] == docs if reader.doc_ids.shape[0] \
            else np.zeros(docs.shape[0], dtype=bool)
        arrays = {f: reader.feature(f)[rows[sel]] for f in self.features}
        vals = _compiled_expr(self.expression, self.features).evaluate(
            **arrays)
        pairs = sorted(zip((float(v) for v in vals),
                           (int(x) for x in docs[sel])), key=self._sortkey)
        return pairs[: self.k]

    def reduce(self, partials):
        pairs = [p for part in partials for p in part]
        pairs.sort(key=self._sortkey)
        return pairs[: self.k]
