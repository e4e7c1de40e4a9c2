"""Index sorting — the IndexWriterConfig.setIndexSort role
(index/IndexWriterConfig.java:475, index/Sorter.java:34): documents laid
out in sort-key order so sort queries early-exit after k docs.

Lucene sorts within each segment and remaps docids at flush/merge. The
Ray-Data translation resequences the WHOLE corpus once as a distributed
pre-pass (docids here are global, so the remap is a corpus transform, not
a per-segment one):

1. ``ds.sort(by)`` range-partitions the corpus in key order.
2. The sorted stream writes to Parquet; Ray names output files by task
   index, so lexicographic file order == global sort order.
3. A second distributed pass reads the parquet FOOTERS (row counts only)
   on the driver, prefix-sums them into per-file id offsets, and rewrites
   each file with ``doc_id = offset + arange`` (original ids preserved in
   ``orig_<id>``).

``build_sorted_index`` then builds a normal index over the resequenced
corpus and records ``index_sort`` in the manifest; because doc order IS
key order, the sorted top-k is the first k live docs of the first
segments — ``sorted_topk`` reads exactly those rows and never scores
(the TopFieldCollector early-exit,
search/TopFieldCollector.java:37 + Sorter-aware leaf early termination).
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def sort_corpus(
    source: "ray.data.Dataset | str",
    out_dir: str,
    by: str,
    descending: bool = False,
    id_col: str = "doc_id",
) -> str:
    """Resequence a corpus in (by, id_col) order with new dense doc ids.

    Output parquet columns: ``doc_id`` (the new global rank),
    ``orig_<id_col>`` plus every other source column. Deterministic:
    ties break by the original id ascending."""
    ds = ray.data.read_parquet(source) if isinstance(source, str) else source
    tmp = out_dir + f".sorting-{uuid.uuid4().hex[:8]}"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        ds.sort([by, id_col], descending=[descending, False])
        .write_parquet(tmp)
    )
    # global rank assignment: footer row counts -> per-file offsets (driver
    # touches metadata only; the rewrite itself is distributed)
    files = sorted(
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    counts, mins, maxs = [], [], []
    for f in files:
        md = pq.ParquetFile(os.path.join(tmp, f)).metadata
        counts.append(md.num_rows)
        # per-file min/max of the sort key from row-group statistics —
        # verifies (rather than assumes) that lexicographic Ray output
        # file order == global sort order; if Ray's naming scheme ever
        # changes, this catches the scramble instead of silently
        # mis-ranking (round-2 advice)
        ci = next(
            (i for i in range(md.num_columns)
             if md.row_group(0).column(i).path_in_schema == by),
            None,
        )
        fmin = fmax = None
        if ci is not None and md.num_rows:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    fmin = fmax = None
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        mins.append(fmin)
        maxs.append(fmax)
    nonempty = [i for i, c in enumerate(counts) if c]
    for a, b in zip(nonempty, nonempty[1:]):
        if maxs[a] is None or mins[b] is None:
            continue  # stats unavailable for this type: skip the check
        bad = (maxs[a] > mins[b]) if not descending else (mins[a] < maxs[b])
        if bad:
            raise RuntimeError(
                f"sorted output file order is not key order "
                f"({files[a]} max={maxs[a]!r} vs {files[b]} min={mins[b]!r}); "
                "Ray's write_parquet naming no longer encodes task order"
            )
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]

    items = [
        {"file": os.path.join(tmp, f), "offset": int(o)}
        for f, o in zip(files, offsets)
    ]

    out_tmp = out_dir + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(out_tmp, exist_ok=True)

    def reseq(batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            t = pq.read_table(row["file"])
            new_ids = np.arange(row["offset"], row["offset"] + t.num_rows, dtype=np.int64)
            cols = {"doc_id": pa.array(new_ids), f"orig_{id_col}": t[id_col]}
            for name in t.column_names:
                if name != id_col:
                    cols[name] = t[name]
            out = pa.table(cols)
            base = os.path.basename(row["file"])
            pq.write_table(out, os.path.join(out_tmp, base))
            out_rows.append(base)
        return pa.table({"file": out_rows})

    n = (
        ray.data.from_items(items)
        .map_batches(reseq, batch_size=1, batch_format="pyarrow")
        .count()
    )
    assert n == len(files)
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.replace(out_tmp, out_dir)
    return out_dir


def build_sorted_index(
    source: "ray.data.Dataset | str",
    index_dir: str,
    by: str,
    descending: bool = False,
    id_col: str = "doc_id",
    **build_kwargs,
) -> dict:
    """setIndexSort: resequence by ``by`` then build; the manifest records
    the sort so searchers know doc order == key order."""
    import json

    from lucene_ray.index.build import build_index

    sorted_dir = os.path.join(index_dir, "sorted_corpus")
    os.makedirs(index_dir, exist_ok=True)
    sort_corpus(source, sorted_dir, by, descending, id_col)
    m = build_index(
        sorted_dir, index_dir, id_col="doc_id",
        stored_source=sorted_dir, **build_kwargs,
    )
    m["index_sort"] = {"by": by, "descending": descending,
                       "orig_id_col": f"orig_{id_col}"}
    from lucene_ray.index.commits import commit_manifest

    return commit_manifest(index_dir, m)


def sorted_range(searcher, lower=None, upper=None,
                 include_lower: bool = True,
                 include_upper: bool = True) -> tuple[int, int]:
    """Contiguous global doc-id interval ``[lo, hi)`` of docs whose sort
    key falls in the range — the IndexSortSortedNumericDocValuesRangeQuery
    idea (sandbox/.../IndexSortSortedNumericDocValuesRangeQuery.java:64):
    on a sort-keyed index a numeric range on the sort field is TWO binary
    searches, not a scan. Parquet footer row-group statistics of the
    resequenced corpus pick the (at most two) boundary files; only their
    key columns are read — everything between the endpoints matches by
    construction. Logs the fraction of corpus bytes touched."""
    sort = searcher.manifest.get("index_sort")
    if not sort:
        raise ValueError("index was not built with build_sorted_index")
    by, desc = sort["by"], bool(sort["descending"])
    src = searcher.manifest["stored_source"]
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    stats = []  # (rows, min, max, bytes) per file, doc order
    for f in files:
        md = pq.ParquetFile(os.path.join(src, f)).metadata
        fmin = fmax = None
        if md.num_row_groups and md.num_rows:
            ci = next(i for i in range(md.num_columns)
                      if md.row_group(0).column(i).path_in_schema == by)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    # stats disabled for this file: unknown range — the
                    # search below treats it as a mandatory boundary read
                    fmin = fmax = None
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        stats.append((md.num_rows, fmin, fmax,
                      os.path.getsize(os.path.join(src, f))))
    offsets = np.concatenate(([0], np.cumsum([s[0] for s in stats])))
    total = int(offsets[-1])

    read_bytes = [0]

    def first_doc(v, side: str) -> int:
        """First doc index i with key[i] >= v ('left') / > v ('right'),
        over the doc-ordered (ascending after sign-flip) key sequence."""
        for fi, (rows, fmin, fmax, nbytes) in enumerate(stats):
            if rows == 0:
                continue
            if fmin is None:
                past = True  # stats unavailable: must read to know
            else:
                lo_k, hi_k = (-fmax, -fmin) if desc else (fmin, fmax)
                past = (hi_k >= v) if side == "left" else (hi_k > v)
            if past:
                keys = pq.read_table(
                    os.path.join(src, files[fi]), columns=[by]
                )[by].to_numpy(zero_copy_only=False)
                read_bytes[0] += nbytes
                if desc:
                    keys = -keys
                return int(offsets[fi]) + int(np.searchsorted(keys, v, side))
        return total

    if desc:
        # sign-flip makes doc order ascending in -key; a [lower, upper]
        # range on key becomes [-upper, -lower] on -key
        lo_b = (-upper, "left" if include_upper else "right") \
            if upper is not None else None
        hi_b = (-lower, "right" if include_lower else "left") \
            if lower is not None else None
    else:
        lo_b = (lower, "left" if include_lower else "right") \
            if lower is not None else None
        hi_b = (upper, "right" if include_upper else "left") \
            if upper is not None else None
    lo = first_doc(*lo_b) if lo_b is not None else 0
    hi = first_doc(*hi_b) if hi_b is not None else total
    hi = max(hi, lo)
    tot_bytes = sum(s[3] for s in stats) or 1
    print(f"[sorted_range] read {read_bytes[0]}/{tot_bytes} bytes "
          f"({100.0 * read_bytes[0] / tot_bytes:.1f}%) of the sorted corpus")
    return lo, hi


def sorted_range_count(searcher, lower=None, upper=None,
                       include_lower: bool = True,
                       include_upper: bool = True) -> int:
    """Live-doc count of :func:`sorted_range` (tombstones subtracted by
    two searchsorteds on the sorted tombstone table)."""
    lo, hi = sorted_range(searcher, lower, upper, include_lower,
                          include_upper)
    t = searcher.tombstones
    dead = int(np.searchsorted(t, hi) - np.searchsorted(t, lo))
    return (hi - lo) - dead


def sorted_topk(searcher, k: int, columns: "list[str] | None" = None) -> pa.Table:
    """Early-exit top-k on a sort-keyed index: doc order == key order, so
    the answer is the first k LIVE docs — only the leading segments' doc
    ids are read, nothing is scored or globally sorted."""
    sort = searcher.manifest.get("index_sort")
    if not sort:
        raise ValueError("index was not built with build_sorted_index")
    from lucene_ray.index.deletes import mask_live

    taken: list[int] = []
    for reader in searcher.readers:  # manifest order == doc_base order
        ids = reader.doc_ids
        live = mask_live(ids, searcher.tombstones)
        for d in ids[live]:
            taken.append(int(d))
            if len(taken) >= k:
                break
        if len(taken) >= k:
            break
    return searcher.fetch_docs(taken, columns=columns)
