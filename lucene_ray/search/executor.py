"""Distributed query serving: an actor pool over mmap'd segments.

The IndexSearcher + LeafSlice executor model (search/IndexSearcher.java:106-108,
323-437) as long-lived Ray actors: each actor owns a disjoint set of
segments, memory-maps their posting blobs once in ``__init__`` (the
stateful-stage rule — setup once per actor, not per query), and serves
``search(query, k)`` requests. The driver broadcasts the query + global
term stats, each actor returns its local top-k, and the driver reduces with
TopDocs.merge ordering (search/TopDocs.java:203-228).

This is one of the few places the Dataset API genuinely can't express the
semantics (a latency-bound request/response service over shared mutable-free
state), so plain ``@ray.remote`` actors are used, per SURVEY.md §7.2.
"""

from __future__ import annotations

import numpy as np
import ray

from lucene_ray.analysis.analyzers import Analyzer
from lucene_ray.index.build import load_manifest
from lucene_ray.search import query as Q
from lucene_ray.search.query import collect_scored_terms, query_from_dict
from lucene_ray.search.scoring import EvalContext, eval_query
from lucene_ray.search.searcher import TopDocs, merge_topk
from lucene_ray.search.segreader import SegmentReader


@ray.remote
class QueryExecutor:
    """Owns N segments; state (mmap handles, term dicts) built once."""

    def __init__(self, segment_paths: list, doc_count: int, sum_ttf: int,
                 mode: str, tombstones=None, field_ttf: dict | None = None):
        # each entry is one LOGICAL segment: a path (doc-range segment) or
        # a path group (term-range shards served by one ShardGroupReader)
        from lucene_ray.search.segreader import open_reader

        self.readers = [
            SegmentReader(p) if isinstance(p, str) else open_reader(list(p))
            for p in segment_paths
        ]
        self.doc_count = doc_count
        self.sum_ttf = sum_ttf
        self.field_ttf = field_ttf or {}
        self.mode = mode
        self.tombstones = (
            np.asarray(tombstones, dtype=np.int64)
            if tombstones is not None
            else np.empty(0, np.int64)
        )

    def search(
        self, query_dict: dict, k: int, term_stats: dict, threshold: float,
        prune: bool = True, timeout_s: "float | None" = None,
    ) -> tuple[np.ndarray, np.ndarray, int, bool]:
        """``timeout_s``: each executor checks the deadline between ITS
        segments (IndexSearcher#setTimeout role distributed per leaf
        slice); on expiry the remaining segments skip and exact=False
        marks the TopDocs partial (relation GTE at the frontend)."""
        import time

        deadline = None if timeout_s is None else             time.monotonic() + timeout_s
        query = query_from_dict(query_dict)
        ctx = EvalContext(term_stats, self.doc_count, self.sum_ttf, mode=self.mode,
                          field_ttf=self.field_ttf)
        ctx.threshold = threshold
        docs = np.empty(0, dtype=np.int64)
        scores = np.empty(0, dtype=np.float64)
        total = 0
        exact = True
        from lucene_ray.index.deletes import mask_live

        for reader in self.readers:
            if deadline is not None and time.monotonic() > deadline:
                exact = False
                break
            d, s, e = eval_query(reader, query, ctx)
            exact &= e
            if d.shape[0]:
                gdocs = d + reader.doc_base
                live = mask_live(gdocs, self.tombstones)
                gdocs, s = gdocs[live], s[live]
                total += int(gdocs.shape[0])
                docs = np.concatenate([docs, gdocs])
                scores = np.concatenate([scores, s])
                docs, scores = merge_topk(docs, scores, k)
            else:
                total += 0
            if prune and docs.shape[0] >= k:
                ctx.threshold = max(threshold, float(scores[-1]))
        return docs, scores, total, exact

    def msearch(self, query_dicts: list, k: int, stats_list: list):
        """Batched search: N queries in ONE actor round-trip (the
        throughput path for batch-oriented callers — MLT sweeps, query
        replay, offline evaluation)."""
        return [
            self.search(qd, k, st, -np.inf)
            for qd, st in zip(query_dicts, stats_list)
        ]

    def ping(self) -> bool:
        return True


@ray.remote(num_cpus=0)
class SearchFrontend:
    """Per-replica fan-out/merge aggregator (async actor).

    Moves the per-query scatter/gather + TopDocs.merge off the driver: the
    driver issues ONE remote call per query, the frontend awaits its pool's
    executors concurrently and reduces (the distributed CollectorManager
    .reduce / TopDocs.merge step, search/TopDocs.java:203-228). num_cpus=0:
    the actor is IO-bound glue and must not steal an executor's CPU slot."""

    def __init__(self, executors: list):
        self.executors = executors

    async def search(self, query_dict: dict, k: int, term_stats: dict,
                     threshold: float, prune: bool = True,
                     timeout_s: "float | None" = None):
        import asyncio

        futs = [
            e.search.remote(query_dict, k, term_stats, threshold, prune,
                            timeout_s)
            for e in self.executors
        ]
        results = await asyncio.gather(*futs)
        docs = np.concatenate([r[0] for r in results])
        scores = np.concatenate([r[1] for r in results])
        docs, scores = merge_topk(docs, scores, k)
        total = sum(r[2] for r in results)
        exact = all(r[3] for r in results)
        return docs, scores, total, exact

    async def msearch(self, query_dicts: list, k: int, stats_list: list):
        import asyncio

        futs = [
            e.msearch.remote(query_dicts, k, stats_list) for e in self.executors
        ]
        per_exec = await asyncio.gather(*futs)
        out = []
        for qi in range(len(query_dicts)):
            docs = np.concatenate([r[qi][0] for r in per_exec])
            scores = np.concatenate([r[qi][1] for r in per_exec])
            docs, scores = merge_topk(docs, scores, k)
            total = sum(r[qi][2] for r in per_exec)
            exact = all(r[qi][3] for r in per_exec)
            out.append((docs, scores, total, exact))
        return out


class DistributedSearcher:
    """Fan-out/merge front-end over QueryExecutor pools.

    ``num_replicas`` > 1 creates independent full copies of the executor
    pool and round-robins queries between them — the scale-out axis for
    query *throughput* (the replica-serving model of
    replicator/nrt/PrimaryNode.java/ReplicaNode.java: same immutable
    segments, many serving copies), while ``num_executors`` is the
    scale-out axis for per-query *latency* (segment fan-out)."""

    def __init__(
        self,
        index_dir: str,
        num_executors: int = 4,
        mode: str = "f32",
        num_replicas: int = 1,
    ):
        m = load_manifest(index_dir)
        self.index_dir = index_dir
        self.manifest = m  # pinned: stats reads must match the served segment set
        self.doc_count = m["doc_count"]
        self.sum_ttf = m["sum_total_term_freq"]
        self.mode = mode
        from lucene_ray.index.build import analyzer_from_manifest

        self.analyzer = analyzer_from_manifest(m)
        from lucene_ray.index.deletes import load_tombstones

        tombstones = load_tombstones(index_dir)
        self.field_ttf = {f: i["sum_ttf"] for f, i in m.get("fields", {}).items()}
        from lucene_ray.search.segreader import group_segment_paths

        # fan out LOGICAL segments (a term-shard group must stay together —
        # compound queries need the whole dictionary in one reader)
        paths = group_segment_paths(m["segments"])
        n = min(num_executors, max(1, len(paths)))
        shards = [paths[i::n] for i in range(n)]
        self.pools = [
            [
                QueryExecutor.remote(shard, self.doc_count, self.sum_ttf, mode,
                                     tombstones, self.field_ttf)
                for shard in shards
                if shard
            ]
            for _ in range(max(1, num_replicas))
        ]
        self.executors = self.pools[0]  # back-compat: first replica
        ray.get([e.ping.remote() for pool in self.pools for e in pool])
        # merge frontends are stateless num_cpus=0 glue — ONE per pool
        # serializes the per-query scatter/gather at higher executor
        # counts (round-4 scaling finding: the single frontend capped
        # query throughput exactly where executor parallelism grew), so
        # their count scales with the pool
        n_fe = max(1, min(4, len(self.pools[0]) // 2))
        self.frontends = [SearchFrontend.remote(pool)
                          for pool in self.pools for _ in range(n_fe)]
        self._rr = 0
        self._stats_cache: dict[str, tuple[int, int]] = {}

    def shutdown(self) -> None:
        """Kill the executor/frontend actors and release their CPUs —
        on a small cluster a retired serving pool that lingers can
        starve later actor-pool stages into deadlock (the IndexSearcher
        close() analog; bench.py calls this between the serving window
        and the pipeline stages)."""
        import ray as _ray

        for f in getattr(self, "frontends", []):
            _ray.kill(f, no_restart=True)
        for pool in getattr(self, "pools", []):
            for e in pool:
                _ray.kill(e, no_restart=True)
        self.pools, self.executors, self.frontends = [], [], []

    def term_stats(self, terms: set[str]) -> dict[str, tuple[int, int]]:
        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            from lucene_ray.index.build import read_global_term_stats

            tbl = read_global_term_stats(self.index_dir, missing,
                                         self.manifest)
            got = dict(
                zip(
                    tbl["term"].to_pylist(),
                    zip(tbl["df"].to_pylist(), tbl["ttf"].to_pylist()),
                )
            )
            for t in missing:
                self._stats_cache[t] = got.get(t, (0, 0))
        return {t: self._stats_cache[t] for t in terms}

    def parse(self, text: str) -> Q.Query:
        from lucene_ray.search.parser import parse_query

        from lucene_ray.index.build import field_analyzers_from_manifest

        return parse_query(text, self.analyzer, set(self.field_ttf),
                           field_analyzers_from_manifest(self.manifest))

    def search(self, query: "Q.Query | str", k: int = 10,
               timeout_s: "float | None" = None) -> TopDocs:
        if isinstance(query, str):
            query = self.parse(query)
        query = Q.resolve_fields(query)
        terms: set[str] = set()
        collect_scored_terms(query, terms)
        stats = self.term_stats(terms)
        qd = query.to_dict()
        fe = self.frontends[self._rr % len(self.frontends)]
        self._rr += 1
        docs, scores, total, exact = ray.get(
            fe.search.remote(qd, k, stats, -np.inf, True, timeout_s))
        return TopDocs(total, "EQ" if exact else "GTE", docs, scores,
                       timed_out=timeout_s is not None and not exact)

    def msearch(self, queries: list, k: int = 10) -> "list[TopDocs]":
        """Batched top-k for many queries with ONE frontend round-trip
        (and one RPC per executor): per-query term stats ship together."""
        qs = []
        for q in queries:
            if isinstance(q, str):
                q = self.parse(q)
            qs.append(Q.resolve_fields(q))
        all_terms: set[str] = set()
        per_q_terms = []
        for q in qs:
            t: set[str] = set()
            collect_scored_terms(q, t)
            per_q_terms.append(t)
            all_terms |= t
        stats = self.term_stats(all_terms)
        stats_list = [{t: stats[t] for t in ts} for ts in per_q_terms]
        qds = [q.to_dict() for q in qs]
        fe = self.frontends[self._rr % len(self.frontends)]
        self._rr += 1
        results = ray.get(fe.msearch.remote(qds, k, stats_list))
        return [
            TopDocs(total, "EQ" if exact else "GTE", docs, scores)
            for docs, scores, total, exact in results
        ]

    def count(self, query: "Q.Query | str") -> int:
        """Exact distributed hit count (TotalHitCountCollector): k large
        enough is unnecessary — the unpruned per-executor totals sum."""
        if isinstance(query, str):
            query = self.parse(query)
        query = Q.resolve_fields(query)
        terms: set[str] = set()
        collect_scored_terms(query, terms)
        stats = self.term_stats(terms)
        qd = query.to_dict()
        fe = self.frontends[self._rr % len(self.frontends)]
        self._rr += 1
        _d, _s, total, exact = ray.get(
            fe.search.remote(qd, 1, stats, -np.inf, False)
        )
        return int(total)
