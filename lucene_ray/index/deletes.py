"""Deletes as a tombstone table — the live-docs model applied index-wide.

Reference semantics: IndexWriter.deleteDocuments/updateDocument buffer
deletes that become a per-segment live-docs bitset applied by every scorer
(codecs/lucene90/Lucene90LiveDocsFormat.java, index/PendingDeletes.java);
stats (docCount, df) stay stale until a merge reclaims the docs
(index/BufferedUpdatesStream.java). Here: one ``tombstones.parquet`` of
global doc ids under the index dir, written atomically (tmp + rename — the
same commit-point discipline as the manifest); searchers load it once and
mask hits. ``update_documents`` = delete-by-key + add-as-new-segments, the
updateDocument(Term, doc) contract (index/IndexWriter.java:1553-1617).

At 10^12-doc scale the tombstone table is hash-bucketed by doc range so
each query actor loads only its segments' buckets. Both ``force_merge``
and ``tiered_merge`` COMPACT tombstoned docs: merged segments physically
drop deleted docs and the merged index's tombstone set is empty for the
merged ranges (index/merge.py).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONES = "tombstones.parquet"


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted global doc ids deleted from this index ([] if none)."""
    p = os.path.join(index_dir, TOMBSTONES)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(p)["doc_id"].to_numpy().astype(np.int64)


def delete_docs(index_dir: str, doc_ids, commit: bool = True) -> int:
    """Add global doc ids to the tombstone set; returns its new size.
    By default commits a new generation so the delete is a rewindable
    commit point (the reference's commits carry liveDocs —
    index/commits.py); ``commit=False`` defers when the caller will
    commit a manifest of its own in the same operation (add_indexes)."""
    ids = np.asarray(list(doc_ids), dtype=np.int64)
    merged = np.union1d(load_tombstones(index_dir), ids)
    tmp = os.path.join(index_dir, f".tmp-{TOMBSTONES}-{uuid.uuid4().hex[:8]}")
    pq.write_table(pa.table({"doc_id": merged}), tmp)
    os.replace(tmp, os.path.join(index_dir, TOMBSTONES))
    if commit and os.path.exists(os.path.join(index_dir, "manifest.json")):
        import json

        from lucene_ray.index.commits import commit_manifest

        with open(os.path.join(index_dir, "manifest.json")) as f:
            commit_manifest(index_dir, json.load(f))
    return int(merged.shape[0])


def delete_by_term(index_dir: str, term: str) -> int:
    """Delete every doc matching ``term`` (deleteDocuments(Term))."""
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    s = Searcher(index_dir)
    docs, _scores = s.search_all(TermQuery(term))
    return delete_docs(index_dir, docs)


def mask_live(doc_ids_global: np.ndarray, tombstones: np.ndarray) -> np.ndarray:
    """Boolean mask of non-deleted docs (sorted-set membership test)."""
    if tombstones.shape[0] == 0:
        return np.ones(doc_ids_global.shape[0], dtype=bool)
    pos = np.clip(np.searchsorted(tombstones, doc_ids_global), 0, tombstones.shape[0] - 1)
    return tombstones[pos] != doc_ids_global
