"""Numeric doc-values updates — the IndexWriter.updateNumericDocValue
role (lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1892,
DocValuesUpdate.java:38): re-point a per-doc numeric value WITHOUT
re-indexing the document. The reference stacks per-segment "DV update
generation" files that readers overlay at open; this port writes
generation-numbered parquet overlays at the INDEX level
(``<index>/dv_updates/feat_<name>_gen<NNN>.parquet``) that every
``SegmentReader.feature`` applies on read — later generations win.

Commit protocol matches everything else: tmp + rename, one file per
update batch, readers discover the directory from their segment path
(so executor-built readers see updates with zero extra plumbing).

Deviations from the reference, documented:

* DV updates are index-global (by global doc id), not per-segment files;
  behavior is identical because doc ids are globally unique here.
* Point-in-time readers (``Searcher(commit=gen)``) see the LATEST DV
  updates, not the generation set at commit time — the reference pins DV
  generations inside ``segments_N``. Acceptable for the
  recency/feature-signal use case these updates serve; pin by copying
  ``dv_updates/`` alongside a snapshot if point-in-time values matter.
* Serving actors cache readers, so updates committed after an actor
  started appear on the next reader open — the same NRT visibility
  contract as new segments.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DV_DIR = "dv_updates"


def update_doc_values(index_dir: str, name: str, doc_ids, values) -> str:
    """Append one update generation for feature ``name``: rows
    (doc_id, value). Returns the committed file path."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    if ids.shape[0] != vals.shape[0]:
        raise ValueError("doc_ids and values must align")
    d = os.path.join(index_dir, DV_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "value": pa.array(vals)}), tmp)
    # Allocate the generation with O_EXCL so two concurrent updaters can
    # never claim the same number (count-of-files numbering raced, and
    # %03d names sorted wrong past gen 999 — ordering is now by parsed
    # integer, see _gen_of).
    gen = max((_gen_of(f) for f in
               glob.glob(os.path.join(d, f"feat_{name}_gen*.parquet"))),
              default=-1) + 1
    while True:
        final = os.path.join(d, f"feat_{name}_gen{gen:03d}.parquet")
        try:
            os.close(os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            break
        except FileExistsError:
            gen += 1
    os.replace(tmp, final)
    return final


def _gen_of(path: str) -> int:
    """Parse the integer generation out of feat_<name>_gen<NNN>.parquet —
    lexicographic filename order inverts at gen >= 1000."""
    base = os.path.basename(path)
    return int(base[base.rindex("_gen") + 4:-len(".parquet")])


def load_dv_updates(dv_dir: str) -> dict:
    """Merge every generation (later wins per doc): returns
    ``{name: (sorted_doc_ids, values)}``; empty dict when no updates."""
    out: dict = {}
    if not os.path.isdir(dv_dir):
        return out
    by_name: dict = {}
    for f in glob.glob(os.path.join(dv_dir, "feat_*_gen*.parquet")):
        base = os.path.basename(f)
        name = base[len("feat_"):base.rindex("_gen")]
        by_name.setdefault(name, []).append(f)
    for name, files in by_name.items():
        files.sort(key=_gen_of)  # integer order, not lexicographic
        ids_parts, val_parts, gen_parts = [], [], []
        for g, f in enumerate(files):  # files sorted by parsed gen above
            t = pq.read_table(f)
            ids_parts.append(t["doc_id"].to_numpy())
            val_parts.append(t["value"].to_numpy())
            gen_parts.append(np.full(t.num_rows, g, dtype=np.int64))
        ids = np.concatenate(ids_parts)
        vals = np.concatenate(val_parts)
        gens = np.concatenate(gen_parts)
        order = np.lexsort((gens, ids))  # per id, last = newest gen
        ids, vals = ids[order], vals[order]
        last = np.concatenate((ids[1:] != ids[:-1], [True]))
        out[name] = (ids[last], vals[last])
    return out


def update_string_doc_values(index_dir: str, name: str, doc_ids,
                             values) -> str:
    """Append one update generation for STRING/BINARY doc values ``name``
    — the IndexWriter.updateBinaryDocValue role (IndexWriter.java:1940):
    re-point a per-doc string value without re-indexing. Same commit
    protocol and generation allocation as the numeric overlays; files are
    ``bin_<name>_gen<NNN>.parquet`` with (doc_id, value:string)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    vals = pa.array([v.decode("utf-8") if isinstance(v, bytes) else v
                     for v in values], type=pa.string())
    if ids.shape[0] != len(vals):
        raise ValueError("doc_ids and values must align")
    d = os.path.join(index_dir, DV_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids), "value": vals}), tmp)
    gen = max((_gen_of(f) for f in
               glob.glob(os.path.join(d, f"bin_{name}_gen*.parquet"))),
              default=-1) + 1
    while True:
        final = os.path.join(d, f"bin_{name}_gen{gen:03d}.parquet")
        try:
            os.close(os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            break
        except FileExistsError:
            gen += 1
    os.replace(tmp, final)
    return final


def load_string_dv_updates(dv_dir: str) -> dict:
    """Merge every string-DV generation (later wins per doc): returns
    ``{name: (sorted_doc_ids, pa.StringArray values)}``."""
    out: dict = {}
    if not os.path.isdir(dv_dir):
        return out
    by_name: dict = {}
    for f in glob.glob(os.path.join(dv_dir, "bin_*_gen*.parquet")):
        base = os.path.basename(f)
        name = base[len("bin_"):base.rindex("_gen")]
        by_name.setdefault(name, []).append(f)
    for name, files in by_name.items():
        files.sort(key=_gen_of)
        ids_parts, val_parts, gen_parts = [], [], []
        for g, f in enumerate(files):
            t = pq.read_table(f)
            ids_parts.append(t["doc_id"].to_numpy())
            val_parts.append(t["value"].combine_chunks()
                             if isinstance(t["value"], pa.ChunkedArray)
                             else t["value"])
            gen_parts.append(np.full(t.num_rows, g, dtype=np.int64))
        ids = np.concatenate(ids_parts)
        vals = pa.concat_arrays(
            [v if isinstance(v, pa.Array) else v.combine_chunks()
             for v in val_parts])
        gens = np.concatenate(gen_parts)
        order = np.lexsort((gens, ids))  # per id, last = newest gen
        ids = ids[order]
        vals = vals.take(pa.array(order))
        last = np.concatenate((ids[1:] != ids[:-1], [True]))
        out[name] = (ids[last], vals.filter(pa.array(last)))
    return out


def apply_string_updates(name: str, base: pa.Array, doc_ids: np.ndarray,
                         updates: dict) -> pa.Array:
    """Overlay string updates onto a row-aligned base column — one
    searchsorted + one vectorized if_else, no per-row Python."""
    import pyarrow.compute as pc

    upd = updates.get(name)
    if upd is None:
        return base
    ids, vals = upd
    if ids.shape[0] == 0 or len(base) == 0:
        return base
    pos = np.clip(np.searchsorted(ids, doc_ids), 0, ids.shape[0] - 1)
    hit = ids[pos] == doc_ids
    if not hit.any():
        return base
    overlay = vals.take(pa.array(np.where(hit, pos, 0)))
    out = pc.if_else(pa.array(hit), overlay, base)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def find_dv_dir(segment_path: str, max_up: int = 4) -> "str | None":
    """Walk up from a segment directory to its index root's dv_updates
    dir (segments live at <index>/<seg> or <index>/segments/<seg> or
    deeper for shard groups)."""
    p = os.path.abspath(segment_path)
    for _ in range(max_up):
        p = os.path.dirname(p)
        cand = os.path.join(p, DV_DIR)
        if os.path.isdir(cand):
            return cand
    return None


def apply_updates(name: str, base: np.ndarray, doc_ids: np.ndarray,
                  updates: dict) -> np.ndarray:
    """Overlay ``updates[name]`` onto a row-aligned base column."""
    upd = updates.get(name)
    if upd is None:
        return base
    ids, vals = upd
    if ids.shape[0] == 0:
        return base
    pos = np.clip(np.searchsorted(ids, doc_ids), 0, ids.shape[0] - 1)
    hit = ids[pos] == doc_ids
    if not hit.any():
        return base
    out = base.copy()
    out[hit] = vals[pos[hit]]
    return out
