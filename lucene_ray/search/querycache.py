"""Per-process query cache — the LRUQueryCache role
(search/LRUQueryCache.java:90 + UsageTrackingQueryCachingPolicy.java:38).

The reference caches per-segment DocIdSets for queries that keep
reappearing in non-scoring (filter) roles, behind a usage-tracking
policy so one-off queries never pollute the cache. The analog here:
``docs()`` memoizes the *local doc-id array* a (segment, query) pair
produces, keyed by the segment directory + content fingerprint and the
query's canonical dict minus boost (constant-score doc sets are
boost-independent; the caller reapplies its own boost). Entries are
only admitted once a query key has been seen ``min_usage`` times
(UsageTrackingQueryCachingPolicy counts occurrences in a 256-slot
history ring), and the cache itself is a bounded LRU.

Scoped per process: every query-serving actor (search/executor.py)
holds its own instance, exactly like each IndexSearcher's cache in the
reference — nothing is shipped between workers. Doc sets are cached
pre-tombstone (live-doc masking happens above the scorer, so deletes
never invalidate entries); a rebuilt segment changes its fingerprint
and therefore its keys.

Hooked into scoring.py at the two spots the reference's policy targets:
multi-term constant-score rewrites (prefix/wildcard/regexp/fuzzy/range/
in-set — the dictionary-scan queries worth caching anywhere) and
general FILTER clauses of BooleanQuery (hit-complete, score-free).
"""

from __future__ import annotations

import json
from collections import OrderedDict

import numpy as np


class LRUQueryCache:
    """Bounded LRU of (segment, query) -> local doc ids, with a
    usage-tracking admission policy."""

    def __init__(self, max_entries: int = 1024, min_usage: int = 2,
                 history_size: int = 256) -> None:
        self.max_entries = max_entries
        self.min_usage = min_usage
        self.history_size = history_size
        self._cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._usage: "OrderedDict[str, int]" = OrderedDict()  # bounded ring
        self.hit_count = 0
        self.miss_count = 0
        self.insert_count = 0
        self.eviction_count = 0

    # -- keys ------------------------------------------------------------
    @staticmethod
    def query_key(q) -> str:
        d = dict(q.to_dict())
        d.pop("boost", None)
        return json.dumps(d, sort_keys=True, default=str)

    @staticmethod
    def segment_key(reader) -> tuple:
        return (reader.path, reader.meta.get("fingerprint", ""))

    # -- policy ----------------------------------------------------------
    def _seen_often_enough(self, qk: str) -> bool:
        n = self._usage.pop(qk, 0) + 1
        self._usage[qk] = n  # re-insert == most recent
        while len(self._usage) > self.history_size:
            self._usage.popitem(last=False)
        return n >= self.min_usage

    @staticmethod
    def cacheable_reader(reader) -> bool:
        """Only persisted, fingerprinted, plain segments cache safely:
        in-memory readers (the percolator's BatchMemoryReader reuses one
        '<memory>' identity across stream batches) and composite
        ShardGroupReaders (whose identity would alias their first shard)
        must bypass — a colliding key would serve one batch's doc ids to
        another."""
        return (type(reader).__name__ == "SegmentReader"
                and bool(reader.meta.get("fingerprint")))

    # -- the one entry point --------------------------------------------
    def docs(self, reader, q, compute) -> np.ndarray:
        """Cached local doc ids for ``q`` on ``reader``; ``compute()``
        produces them on miss. Admission requires the query key to have
        been seen ``min_usage`` times across any segment."""
        if not self.cacheable_reader(reader):
            return compute()
        qk = self.query_key(q)
        key = (self.segment_key(reader), qk)
        d = self._cache.get(key)
        if d is not None:
            self._cache.move_to_end(key)
            self.hit_count += 1
            return d
        self.miss_count += 1
        admit = self._seen_often_enough(qk)
        d = compute()
        if admit:
            self._cache[key] = d
            self.insert_count += 1
            while len(self._cache) > self.max_entries:
                self._cache.popitem(last=False)
                self.eviction_count += 1
        return d

    def clear(self) -> None:
        self._cache.clear()
        self._usage.clear()

    def stats(self) -> dict:
        return {
            "hits": self.hit_count,
            "misses": self.miss_count,
            "inserts": self.insert_count,
            "evictions": self.eviction_count,
            "entries": len(self._cache),
        }


# Per-process default, like IndexSearcher.getDefaultQueryCache(). None
# disables caching entirely.
_DEFAULT: "LRUQueryCache | None" = LRUQueryCache()


def get_query_cache() -> "LRUQueryCache | None":
    return _DEFAULT


def set_query_cache(cache: "LRUQueryCache | None") -> "LRUQueryCache | None":
    """Install (or, with None, disable) the process-wide cache; returns
    the previous one — IndexSearcher.setQueryCache."""
    global _DEFAULT
    prev = _DEFAULT
    _DEFAULT = cache
    return prev
