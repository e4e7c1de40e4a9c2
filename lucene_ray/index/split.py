"""Index splitting — the PKIndexSplitter role
(misc/src/java/org/apache/lucene/misc/index/PKIndexSplitter.java:42,
createIndex at :105): split one index into TWO new physical indexes —
docs matching a query in the first, everything else in the second.

The reference builds each side by addIndexes over a reader whose
liveDocs mask out the other side's docs; this port does the same thing
with the house primitives: a STAGING overlay (a manifest pointing at
the SOURCE segments plus a tombstone set covering the complement) is
materialized by ``tiered_merge`` — the compaction that physically
squeezes out tombstoned docs (DocIDMerger role), recomputes term stats
and pipes positions through the same filter. Existing tombstones of the
source index are excluded from BOTH sides, like the reference's
wrapped-liveDocs AND.

Scale note: the split is two merge jobs; each is the shuffle-free
doc-range compaction (one Ray task per segment group), so a 10^4-segment
index splits without any all-to-all exchange. The one driver-side
object is the matching-doc id set (and its complement as a tombstone
list) — fine to ~10^8 matches; the 10^12-doc path evaluates the split
query INSIDE each merge task against its own segment (per-segment
local masks, no global id list) — the same per-leaf shape the
reference's filtered addIndexes readers use; this module keeps the
simple global form because the staging overlay reuses delete_docs
unchanged.
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from lucene_ray.index.build import load_manifest


def split_index(index_dir: str, out_first: str, out_second: str,
                query, group_size: int = 8) -> tuple[dict, dict]:
    """Split ``index_dir`` by ``query`` (docs matching -> ``out_first``,
    rest -> ``out_second``); returns the two output manifests."""
    import json

    from lucene_ray.index.deletes import load_tombstones
    from lucene_ray.index.merge import tiered_merge
    from lucene_ray.search.searcher import Searcher

    s = Searcher(index_dir, mode="f64")
    in_first, _ = s.search_all(query)  # live docs only (tombstones masked)
    in_first = np.unique(in_first)
    all_ids = np.unique(np.concatenate(
        [r.doc_ids for r in s.readers] or [np.empty(0, np.int64)]))
    dead = load_tombstones(index_dir)
    complement = np.setdiff1d(all_ids, in_first, assume_unique=True)

    m = load_manifest(index_dir)
    outs = []
    for out_dir, drop in ((out_first, complement), (out_second, in_first)):
        stage = out_dir.rstrip("/") + ".split-stage"
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        # overlay manifest: same (absolute-path) source segments; the
        # tombstones carry this side's complement + the source's own dead
        # docs, so the merge materializes exactly this side's live set
        with open(os.path.join(stage, "manifest.json"), "w") as f:
            json.dump(m, f)
        from lucene_ray.index.deletes import delete_docs

        delete_docs(stage, np.union1d(drop, dead), commit=False)
        try:
            outs.append(tiered_merge(stage, out_dir,
                                     group_size=group_size))
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    return outs[0], outs[1]
