"""Query profiler — the sandbox QueryProfilerIndexSearcher /
ProfilerCollector roles (sandbox/src/java/org/apache/lucene/sandbox/
search/QueryProfilerIndexSearcher.java:36, ProfilerCollector.java:31):
walk the query tree, execute every node, and report a per-node
breakdown of matched-document counts and wall time, children indented
under parents exactly like the reference's profile tree.

Determinism contract: profiling evaluates each node EXHAUSTIVELY
(``Searcher.search_all`` — the Weight.bulkScorer-over-everything path),
so ``docs`` is the node's true match count, independent of top-k
pruning state; ``time_ns`` is wall time and is intentionally kept out
of oracle comparisons (the entry projects the deterministic columns).
"""
from __future__ import annotations

import time

import pyarrow as pa

from lucene_ray.search import query as Q


def _label(q) -> tuple[str, str]:
    """(kind, description) for a node, mirroring Query.toString roles."""
    kind = type(q).__name__
    if isinstance(q, Q.TermQuery):
        return kind, getattr(q, "term", "")
    if isinstance(q, Q.PhraseQuery):
        return kind, " ".join(q.terms)
    if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery)):
        return kind, getattr(q, "prefix", None) or getattr(
            q, "pattern", "") or ""
    if isinstance(q, Q.FuzzyQuery):
        return kind, q.term
    if isinstance(q, Q.BooleanQuery):
        return kind, (f"must={len(q.must)} should={len(q.should)} "
                      f"filter={len(q.filter)} must_not={len(q.must_not)}")
    return kind, ""


def _children(q) -> list[tuple[str, "Q.Query"]]:
    """(clause-role, child) pairs in a stable order."""
    if isinstance(q, Q.BooleanQuery):
        out = []
        out += [("MUST", c) for c in q.must]
        out += [("FILTER", c) for c in q.filter]
        out += [("SHOULD", c) for c in q.should]
        out += [("MUST_NOT", c) for c in q.must_not]
        return out
    if isinstance(q, Q.DisjunctionMaxQuery):
        return [("DISJUNCT", c) for c in q.queries]
    if isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
        return [("WRAPPED", q.query)]
    if isinstance(q, Q.CoveringQuery):
        return [("CLAUSE", c) for c in q.queries]
    return []


def profile_query(searcher, query) -> pa.Table:
    """Execute ``query`` and every sub-node exhaustively; return the
    profile tree as rows (node, kind, clause, description, docs,
    time_ns), ``node`` being the dotted path ('0', '0.1', ...) in
    clause order — the flattened form of the reference's
    QueryProfilerTree (QueryProfilerTree.java:30)."""
    if isinstance(query, str):
        query = searcher._prep(query)
    rows = []

    def walk(q, path: str, clause: str) -> None:
        kind, desc = _label(q)
        t0 = time.perf_counter_ns()
        docs, _scores = searcher.search_all(q)
        dt = time.perf_counter_ns() - t0
        rows.append({
            "node": path, "kind": kind, "clause": clause,
            "description": desc, "docs": int(docs.shape[0]),
            "time_ns": int(dt),
        })
        for i, (role, child) in enumerate(_children(q)):
            walk(child, f"{path}.{i}", role)

    walk(query, "0", "ROOT")
    return pa.table({
        "node": pa.array([r["node"] for r in rows]),
        "kind": pa.array([r["kind"] for r in rows]),
        "clause": pa.array([r["clause"] for r in rows]),
        "description": pa.array([r["description"] for r in rows]),
        "docs": pa.array([r["docs"] for r in rows], type=pa.int64()),
        "time_ns": pa.array([r["time_ns"] for r in rows], type=pa.int64()),
    })
