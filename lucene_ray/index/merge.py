"""Segment merging — the distributed SegmentMerger / forceMerge.

Reference semantics: TieredMergePolicy picks groups of similar-sized,
doc-adjacent segments (index/TieredMergePolicy.java:76-83,314);
SegmentMerger k-way-merges their postings with docID remapping
(index/SegmentMerger.java:44,122-174, index/DocIDMerger.java:32);
IndexMergeTool/addIndexes compacts N indexes to one
(misc/IndexMergeTool.java, index/IndexWriter.java:3051).

Ray-Data translation (SURVEY.md §7.3): posting rows are exploded to
``(term, doc_base, blob)`` source runs and range-partitioned with ONE
``sort("term")`` exchange; each output batch bulk-decodes its whole term
range with ``decode_many``, k-way-merges by (term, doc) in one lexsort,
squeezes out tombstones, and re-encodes with ``encode_postings_many`` —
zero per-term Python (SegmentMerger's bulk path). **Skew**: a hot term is
at most one row per source segment, so task size is bounded by segment
size; if a hot term's rows straddle a shard boundary the two shards hold
doc-disjoint sub-runs, which ``ShardGroupReader`` re-fuses lazily at read
time. Docs keep their global IDs (no remap needed — our IDs are
(doc_base + local), already global and disjoint; Lucene must remap
because its IDs are leaf-local).

Serving: the term-range shards of one merged doc space are ONE logical
segment — ``search/segreader.py ShardGroupReader`` concatenates their
dictionaries so compound queries see every term (per-shard evaluation
would split a doc's score across shards). ``tiered_merge`` output uses
the standard doc-range layout and needs no grouping.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from lucene_ray.index.build import load_manifest, logical_doc_stats


def _segment_postings_table(seg_path: str) -> pa.Table:
    """(term, blob) for every term of a segment, zero-copy: blobs are
    stored contiguously in term order, so the whole postings.bin becomes
    one LargeBinary array built straight from the (offset, length) table —
    no per-term Python slicing."""
    terms = pq.read_table(os.path.join(seg_path, "terms.parquet"))
    with open(os.path.join(seg_path, "postings.bin"), "rb") as f:
        buf = f.read()
    offs = terms["offset"].to_numpy()
    lens = terms["length"].to_numpy()
    n = terms.num_rows
    bounds = np.empty(n + 1, dtype=np.int64)
    bounds[:-1] = offs
    bounds[-1] = offs[-1] + lens[-1] if n else 0
    if not (np.diff(bounds) == lens).all():
        # non-contiguous layout (shouldn't happen): slice per term
        blobs = pa.array(
            [buf[o : o + l] for o, l in zip(offs, lens)], type=pa.large_binary()
        )
    else:
        blobs = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(bounds.tobytes()), pa.py_buffer(buf)]
        )
    return pa.table({"term": terms["term"], "blob": blobs})


def _blob_column_view(blobs: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(buffer, offsets, lengths) view of a binary column — zero-copy: the
    Arrow values buffer IS the concatenation of every blob."""
    if isinstance(blobs, pa.ChunkedArray):
        blobs = blobs.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(blobs.type) else np.int32
    offs = np.frombuffer(blobs.buffers()[1], dtype=odt)
    offs = offs[blobs.offset : blobs.offset + len(blobs) + 1].astype(np.int64)
    buf = np.frombuffer(blobs.buffers()[2], dtype=np.uint8)
    return buf, offs[:-1], np.diff(offs)


class _ShardWriter:
    """map_batches callable: one term-range shard segment per input batch.

    Rows arrive term-sorted as (term, doc_base, blob) source runs — several
    rows per term (one per source segment). The whole batch is decoded with
    ONE vectorized ``decode_many`` call, k-way-merged by (term, doc) with a
    single lexsort, tombstone-squeezed (DocIDMerger — the merge is the
    compaction that drops deletes), and re-encoded with
    ``encode_postings_many`` — no per-term Python anywhere (the bulk-merge
    path of SegmentMerger.java:122-174). A hot term's rows may straddle a
    batch boundary; the resulting shards hold doc-disjoint sub-runs of that
    term, which the searcher handles like any other pair of segments.
    Segment layout matches build segments except meta.docs_path points at
    the shared merged docs table and owns_docs marks exactly one shard as
    the doc-space owner (MatchAllDocsQuery)."""

    def __init__(
        self,
        out_dir: str,
        global_base: int,
        max_doc: int,
        doc_count: int,
        sum_ttf: int,
        docs_path: str,
        fingerprint: str,
        merge_fan_in: int,
        positions_path: str | None = None,
        tombs_ref=None,
        field_ttf: dict | None = None,
    ) -> None:
        self.out_dir = out_dir
        self.global_base = global_base
        self.max_doc = max_doc
        self.doc_count = doc_count
        self.sum_ttf = sum_ttf
        self.docs_path = docs_path
        self.fingerprint = fingerprint
        self.merge_fan_in = merge_fan_in
        self.positions_path = positions_path
        self.tombs_ref = tombs_ref
        self.field_ttf = field_ttf or {}

    def __call__(self, b: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.compute as pc

        from lucene_ray.codec.postings import decode_many, encode_postings_many

        empty = pa.table({"segment_id": pa.array([], pa.string()),
                          "path": pa.array([], pa.string()),
                          "min_term": pa.array([], pa.string()),
                          "n_terms": pa.array([], pa.int64()),
                          "postings_bytes": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        idx = pc.sort_indices(b["term"])
        b = b.take(idx)

        # ---- bulk decode + k-way merge (all vectorized) ----
        buf, offs, lens = _blob_column_view(b["blob"])
        docs, freqs, norms, row_starts = decode_many(buf, offs, lens)
        df_row = np.diff(row_starts)
        docs = docs + np.repeat(
            b["doc_base"].to_numpy().astype(np.int64), df_row
        )
        t_np = np.asarray(b["term"].to_pylist(), dtype=object)
        vocab, codes_row = np.unique(t_np, return_inverse=True)
        codes = np.repeat(codes_row, df_row)
        order = np.lexsort((docs, codes))
        codes, docs, freqs, norms = (
            codes[order], docs[order], freqs[order], norms[order],
        )
        same = np.diff(docs) == 0
        if same.any() and (same & (np.diff(codes) == 0)).any():
            raise ValueError("duplicate doc ids across merged segments")
        if self.tombs_ref is not None:
            import ray as _ray

            from lucene_ray.index.deletes import mask_live

            live = mask_live(docs, _ray.get(self.tombs_ref))
            codes, docs, freqs, norms = (
                codes[live], docs[live], freqs[live], norms[live],
            )
            if docs.shape[0] == 0:
                return empty
            # terms that lost every posting drop from the dictionary
            keep_codes, codes = np.unique(codes, return_inverse=True)
            vocab = vocab[keep_codes]
        term_starts = np.searchsorted(codes, np.arange(len(vocab) + 1))
        out_buf, offsets, lengths = encode_postings_many(
            (docs - self.global_base).astype(np.int64),
            freqs.astype(np.uint32), norms.astype(np.uint8), term_starts,
        )
        df = np.diff(term_starts)
        ttf = np.add.reduceat(freqs.astype(np.int64), term_starts[:-1])

        first, last = str(vocab[0]), str(vocab[-1])
        # id must distinguish two shards of the SAME term range (a hot
        # term's doc-disjoint sub-runs): fold the doc span + volume in
        seg_id = "mseg-" + hashlib.sha1(
            f"{first}:{last}:{len(vocab)}:{int(docs[0])}:{int(docs[-1])}"
            f":{docs.shape[0]}".encode()
        ).hexdigest()[:12]
        parent = os.path.join(self.out_dir, "segments")
        os.makedirs(parent, exist_ok=True)
        tmp = os.path.join(parent, f".tmp-{seg_id}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)

        with open(os.path.join(tmp, "postings.bin"), "wb") as f:
            out_buf.tofile(f)
        pq.write_table(
            pa.table(
                {
                    "term": pa.array(vocab, type=pa.string()),
                    "df": df,
                    "ttf": ttf,
                    "offset": offsets,
                    "length": lengths,
                }
            ),
            os.path.join(tmp, "terms.parquet"),
        )
        meta = {
            "segment_id": seg_id,
            "path": os.path.join(parent, seg_id),
            "doc_base": self.global_base,
            "max_doc_id": self.max_doc,
            "doc_count": self.doc_count,
            "sum_total_term_freq": self.sum_ttf,
            "n_terms": int(len(vocab)),
            "postings_bytes": int(lengths.sum()),
            "fingerprint": self.fingerprint,
            "build_secs": 0.0,
            "terms_per_sec": 0.0,
            "skipped": False,
            "merge_fan_in": self.merge_fan_in,
            "docs_path": self.docs_path,
            "positions_path": self.positions_path,
            "owns_docs": False,
            # FULL per-field sums of the shared doc space (like doc_count):
            # consumers count one shard per docs_path group
            "field_ttf_json": json.dumps(self.field_ttf),
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        final = os.path.join(parent, seg_id)
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        return pa.table(
            {
                "segment_id": [seg_id],
                "path": [final],
                "min_term": [first],
                "n_terms": [int(len(vocab))],
                "postings_bytes": [int(lengths.sum())],
            }
        )


def force_merge(
    index_dir: str,
    out_dir: str,
    hot_term_df: int = 100_000,
    salt_buckets: int = 8,
    terms_per_shard: int = 1 << 20,
) -> dict:
    """Merge ALL segments of ``index_dir`` into term-range-sharded merged
    segments under ``out_dir`` with ONE all-to-all exchange: source posting
    runs explode to (term, doc_base, blob) rows, a single ``sort("term")``
    range-partitions the vocabulary, and each output batch bulk-decodes,
    k-way-merges and re-encodes its whole term range vectorized
    (``decode_many`` + ``encode_postings_many`` — the SegmentMerger bulk
    path, SegmentMerger.java:122-174). No per-term Python, no mid-pipeline
    materialization (both round-1 findings).

    Skew: a hot term contributes at most one row per source segment, so row
    granularity bounds task size by segment size; a term whose rows
    straddle a shard boundary yields doc-disjoint sub-runs in two shards,
    which the searcher treats like any pair of segments.
    ``hot_term_df``/``salt_buckets`` are kept for API compatibility
    (unused — the old (term, salt) groupby is gone). ``terms_per_shard``
    bounds the rows per output shard.

    Scale note: all shards share one merged docs table (norms); bucketing
    the docs table by doc range is the follow-up for 10^12-doc indexes.
    """
    del hot_term_df, salt_buckets  # no shuffle keys anymore
    m = load_manifest(index_dir)
    segs = sorted(m["segments"], key=lambda s: s["doc_base"])
    global_base = int(min(s["doc_base"] for s in segs))
    max_doc = int(max(s["max_doc_id"] for s in segs))
    # term-range shards of a previous force_merge each carry the FULL doc
    # stats of their shared doc space: count each logical group once
    doc_count, sum_ttf = logical_doc_stats(segs)
    fingerprint = "merged:" + ",".join(s["fingerprint"] for s in segs)

    from lucene_ray.index.deletes import load_tombstones

    tombs = load_tombstones(index_dir)
    tombs_ref = ray.put(tombs) if tombs.shape[0] else None

    rows = ray.data.from_items(
        [{k: s[k] for k in ("segment_id", "path", "doc_base")} for s in segs]
    )

    def explode(batch: pa.Table) -> pa.Table:
        parts = []
        for row in batch.to_pylist():
            t = _segment_postings_table(row["path"])
            parts.append(
                pa.table(
                    {
                        "term": t["term"],
                        "doc_base": pa.array(
                            np.full(t.num_rows, row["doc_base"], dtype=np.int64)
                        ),
                        "blob": t["blob"],
                    }
                )
            )
        return pa.concat_tables(parts)

    final_rows = rows.map_batches(explode, batch_size=1, batch_format="pyarrow")

    # shared merged docs table (doc_id-sorted for binary search), minus
    # tombstoned docs — the merge is the compaction that drops deletes
    docs_dir = os.path.join(out_dir, "docs")
    if not os.path.isdir(docs_dir):
        tmp_docs = os.path.join(out_dir, f".tmp-docs-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_docs, exist_ok=True)
        doc_srcs, _seen = [], set()
        for s in segs:
            local = os.path.join(s["path"], "docs.parquet")
            p = local if os.path.exists(local) else s.get("docs_path")
            if p is None:
                raise FileNotFoundError(
                    f"segment {s['segment_id']} has neither a local "
                    f"docs.parquet nor a docs_path — corrupt index?"
                )
            if p not in _seen:
                _seen.add(p)
                doc_srcs.append(p)
        dds = ray.data.read_parquet(doc_srcs)
        if tombs_ref is not None:
            from lucene_ray.index.deletes import mask_live

            def drop_deleted(b: pa.Table) -> pa.Table:
                ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                return b.filter(pa.array(mask_live(ids, ray.get(tombs_ref))))

            dds = dds.map_batches(drop_deleted, batch_format="pyarrow")
        dds.sort("doc_id").write_parquet(tmp_docs)
        os.replace(tmp_docs, docs_dir)
    if tombs.shape[0]:
        # live doc stats from the compacted docs table
        live_ds = ray.data.read_parquet(docs_dir)
        doc_count = live_ds.count()
        sum_ttf = int(live_ds.sum("doc_len"))
        # refresh per-extra-field sums from the compacted docs too
        field_sums = {
            f_: int(live_ds.sum(f"len_{f_}"))
            for f_ in m.get("fields", {})
        }

    # shared merged positions (phrase queries on merged shards): stream the
    # sources' positions through tombstone filtering into one positions dir
    # referenced by every shard's meta.positions_path. Doc ids are global,
    # so no remap; per-source (term,doc,pos) sort survives per-file for
    # row-group pruning.
    pos_dir = None
    src_pos, seen_pos = [], set()
    for s in segs:
        local = os.path.join(s["path"], "positions.parquet")
        if os.path.exists(local):
            p = local
        else:
            with open(os.path.join(s["path"], "meta.json")) as f:
                p = json.load(f).get("positions_path")
        if p and p not in seen_pos:
            seen_pos.add(p)
            src_pos.append(p)
    if src_pos:
        pos_dir = os.path.join(out_dir, "positions")
        if not os.path.isdir(pos_dir):
            from lucene_ray.index.deletes import mask_live

            tmp_pos = os.path.join(out_dir, f".tmp-positions-{uuid.uuid4().hex[:8]}")
            os.makedirs(tmp_pos, exist_ok=True)
            pds = ray.data.read_parquet(src_pos)
            if tombs_ref is not None:
                def drop_deleted_pos(b: pa.Table) -> pa.Table:
                    ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                    return b.filter(pa.array(mask_live(ids, ray.get(tombs_ref))))

                pds = pds.map_batches(drop_deleted_pos, batch_format="pyarrow")
            pds.write_parquet(tmp_pos)
            os.replace(tmp_pos, pos_dir)

    if not tombs.shape[0]:
        field_sums = {f_: i["sum_ttf"] for f_, i in m.get("fields", {}).items()}
    writer = _ShardWriter(
        out_dir, global_base, max_doc, doc_count, sum_ttf,
        docs_dir, fingerprint, len(segs), positions_path=pos_dir,
        tombs_ref=tombs_ref, field_ttf=field_sums,
    )
    shard_rows = (
        final_rows.sort("term")
        .map_batches(writer, batch_size=terms_per_shard, batch_format="pyarrow")
        .take_all()  # tiny: one row per shard
    )
    shard_rows.sort(key=lambda r: r["min_term"])

    if not shard_rows:
        # degenerate merge (every doc tombstoned / empty source): commit a
        # valid empty index rather than crash on shard_rows[0]
        manifest = dict(m)
        manifest["doc_count"] = 0
        manifest["sum_total_term_freq"] = 0
        for f_ in manifest.get("fields", {}):
            manifest["fields"][f_]["sum_ttf"] = 0
        manifest["segments"] = []
        from lucene_ray.index.build import _write_global_stats
        from lucene_ray.index.commits import commit_manifest

        manifest["stats_dir"] = _write_global_stats(out_dir, [])
        return commit_manifest(out_dir, manifest)

    # exactly one shard owns the doc space (MatchAllDocsQuery source)
    first_meta_path = os.path.join(shard_rows[0]["path"], "meta.json")
    with open(first_meta_path) as f:
        meta0 = json.load(f)
    meta0["owns_docs"] = True
    tmpm = first_meta_path + ".tmp"
    with open(tmpm, "w") as f:
        json.dump(meta0, f)
    os.replace(tmpm, first_meta_path)

    segments = []
    for i, r in enumerate(shard_rows):
        with open(os.path.join(r["path"], "meta.json")) as f:
            segments.append(json.load(f))

    manifest = dict(m)
    manifest["doc_count"] = doc_count
    if m.get("fields"):
        for f_ in manifest["fields"]:
            manifest["fields"][f_]["sum_ttf"] = field_sums[f_]
    manifest["sum_total_term_freq"] = sum_ttf
    manifest["segments"] = segments
    if tombs.shape[0]:
        # deletes are now physical: recompute term stats from the shards
        from lucene_ray.index.build import _write_global_stats

        manifest["stats_dir"] = _write_global_stats(out_dir, segments)
    else:
        import shutil as _sh

        from lucene_ray.index.build import stats_path

        sname = m.get("stats_dir", "global_terms")
        gsrc = stats_path(index_dir, m)
        gdst = os.path.join(out_dir, sname)
        if not os.path.isdir(gdst):
            _sh.copytree(os.path.abspath(gsrc), gdst)
        manifest["stats_dir"] = sname
    from lucene_ray.index.commits import commit_manifest

    return commit_manifest(out_dir, manifest)


def tiered_merge(
    index_dir: str,
    out_dir: str,
    group_size: int = 4,
    hot_term_df: int = 100_000,  # kept for API compat; unused (no shuffle)
    salt_buckets: int = 4,  # kept for API compat; unused (no shuffle)
) -> dict:
    """Doc-range compaction — the TieredMergePolicy role
    (index/TieredMergePolicy.java:76-83,314): adjacent (doc-base-ordered)
    groups of ``group_size`` segments merge into ONE segment each.

    SHUFFLE-FREE: because the group's sources are doc-range partitions of
    the same term space, one task per group reads its sources wholesale,
    decodes every posting, re-sorts by (term, doc), squeezes out
    tombstoned docs (DocIDMerger), and re-encodes with the segment-wide
    vectorized encoder — no (term, salt) exchange is needed (only the
    GLOBAL term merge in force_merge needs one). Output segments use the
    standard build layout, so serving fan-out is unchanged; this is the
    merge that keeps per-actor segment counts bounded as incremental
    add_documents accumulates segments."""
    from lucene_ray.codec.postings import decode_many, encode_postings_many
    from lucene_ray.index.deletes import load_tombstones, mask_live

    m = load_manifest(index_dir)
    segs = sorted(m["segments"], key=lambda s: s["doc_base"])
    if any(s.get("docs_path") for s in segs):
        raise ValueError(
            "tiered_merge compacts doc-range segments; this index holds "
            "term-range shards sharing one doc space (force_merge output) — "
            "re-shard with force_merge instead"
        )
    groups = [segs[i : i + group_size] for i in range(0, len(segs), group_size)]

    tombs = load_tombstones(index_dir)
    tombs_ref = ray.put(tombs) if tombs.shape[0] else None

    items = [
        {
            "paths": [s["path"] for s in grp],
            "base": int(min(s["doc_base"] for s in grp)),
            "maxd": int(max(s["max_doc_id"] for s in grp)),
            "fp": "tiered:" + ",".join(s["fingerprint"] for s in grp),
        }
        for grp in groups
    ]

    def merge_group_task(batch: pa.Table) -> pa.Table:
        out_rows = []
        for item in batch.to_pylist():
            paths, base, maxd, fp = (
                item["paths"], item["base"], item["maxd"], item["fp"],
            )
            # bulk decode: the whole source segment in ONE decode_many call
            # (the round-1 per-term decode loop was the dominant merge cost)
            term_parts, doc_parts, freq_parts, norm_parts = [], [], [], []
            for p in paths:
                tt = pq.read_table(os.path.join(p, "terms.parquet"))
                with open(os.path.join(p, "meta.json")) as f:
                    seg_base = int(json.load(f)["doc_base"])
                seg_buf = np.fromfile(
                    os.path.join(p, "postings.bin"), dtype=np.uint8
                )
                d, fq, nm, st = decode_many(
                    seg_buf,
                    tt["offset"].to_numpy().astype(np.int64),
                    tt["length"].to_numpy().astype(np.int64),
                )
                doc_parts.append(d + seg_base)
                freq_parts.append(fq)
                norm_parts.append(nm)
                term_parts.append(
                    np.repeat(
                        np.asarray(tt["term"].to_pylist(), dtype=object),
                        np.diff(st),
                    )
                )
            term_of = np.concatenate(term_parts)
            docs = np.concatenate(doc_parts)
            freqs = np.concatenate(freq_parts).astype(np.uint32)
            norms = np.concatenate(norm_parts).astype(np.uint8)

            vocab, codes = np.unique(term_of, return_inverse=True)
            order = np.lexsort((docs, codes))
            codes, docs, freqs, norms = (
                codes[order], docs[order], freqs[order], norms[order],
            )
            if tombs_ref is not None:
                live = mask_live(docs, ray.get(tombs_ref))
                codes, docs, freqs, norms = (
                    codes[live], docs[live], freqs[live], norms[live],
                )
            # terms that lost every posting drop from the dictionary
            keep_codes, codes = np.unique(codes, return_inverse=True)
            vocab = vocab[keep_codes]
            term_starts = np.searchsorted(codes, np.arange(len(vocab) + 1))

            buf, offsets, lengths = encode_postings_many(
                (docs - base).astype(np.int64), freqs, norms, term_starts
            )
            df = np.diff(term_starts)
            ttf = np.add.reduceat(freqs.astype(np.int64), term_starts[:-1]) if len(
                vocab
            ) else np.empty(0, np.int64)

            seg_id = f"tseg-{base:012d}-{maxd:012d}"
            parent = os.path.join(out_dir, "segments")
            os.makedirs(parent, exist_ok=True)
            tmp = os.path.join(parent, f".tmp-{seg_id}-{uuid.uuid4().hex[:8]}")
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "postings.bin"), "wb") as f:
                buf.tofile(f)
            pq.write_table(
                pa.table(
                    {
                        "term": pa.array(vocab, type=pa.string()),
                        "df": df,
                        "ttf": ttf,
                        "offset": offsets,
                        "length": lengths,
                    }
                ),
                os.path.join(tmp, "terms.parquet"),
            )
            import pyarrow.compute as pc

            doc_tbl = pa.concat_tables(
                pq.read_table(os.path.join(p, "docs.parquet")) for p in paths
            )
            ids = doc_tbl["doc_id"].to_numpy().astype(np.int64)
            if tombs_ref is not None:
                doc_tbl = doc_tbl.filter(pa.array(mask_live(ids, ray.get(tombs_ref))))
            doc_tbl = doc_tbl.take(pc.sort_indices(doc_tbl["doc_id"]))
            pq.write_table(doc_tbl, os.path.join(tmp, "docs.parquet"))

            # positional index: concatenate the sources' positions (doc ids
            # are global so no remap), drop tombstoned docs, keep the
            # (term, doc, pos) sort for row-group pruning
            pos_files = [
                pf for pf in (os.path.join(p, "positions.parquet") for p in paths)
                if os.path.exists(pf)
            ]
            if pos_files:
                pos_tbl = pa.concat_tables(pq.read_table(pf) for pf in pos_files)
                if tombs_ref is not None:
                    pids = pos_tbl["doc_id"].to_numpy().astype(np.int64)
                    pos_tbl = pos_tbl.filter(
                        pa.array(mask_live(pids, ray.get(tombs_ref)))
                    )
                pos_tbl = pos_tbl.sort_by(
                    [("term", "ascending"), ("doc_id", "ascending"), ("pos", "ascending")]
                )
                pq.write_table(
                    pos_tbl, os.path.join(tmp, "positions.parquet"),
                    row_group_size=1 << 17,
                )

            meta = {
                "segment_id": seg_id,
                "path": os.path.join(parent, seg_id),
                "doc_base": base,
                "max_doc_id": maxd,
                "doc_count": int(doc_tbl.num_rows),
                "sum_total_term_freq": int(doc_tbl["doc_len"].to_numpy().sum()),
                "n_terms": int(len(vocab)),
                "postings_bytes": int(buf.shape[0]),
                "fingerprint": fp,
                "build_secs": 0.0,
                "terms_per_sec": 0.0,
                "skipped": False,
                "merge_fan_in": len(paths),
                # per-extra-field sums from the COMPACTED docs table, so
                # multi-field avgdl stays fresh after deletes are dropped
                "field_ttf_json": json.dumps({
                    c[4:]: int(doc_tbl[c].to_numpy().sum())
                    for c in doc_tbl.column_names if c.startswith("len_")
                }),
            }
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump(meta, f)
            final = os.path.join(parent, seg_id)
            if os.path.isdir(final):
                import shutil

                shutil.rmtree(final)
            os.replace(tmp, final)
            out_rows.append({"segment_id": seg_id, "path": final})
        return pa.table(
            {
                "segment_id": [r["segment_id"] for r in out_rows],
                "path": [r["path"] for r in out_rows],
            }
        )

    shard_rows = (
        ray.data.from_items(items)
        .map_batches(merge_group_task, batch_size=1, batch_format="pyarrow")
        .take_all()
    )

    segments = []
    for r in shard_rows:
        with open(os.path.join(r["path"], "meta.json")) as f:
            segments.append(json.load(f))
    segments.sort(key=lambda s: s["doc_base"])

    manifest = dict(m)
    manifest["doc_count"] = sum(s["doc_count"] for s in segments)
    manifest["sum_total_term_freq"] = sum(s["sum_total_term_freq"] for s in segments)
    manifest["segments"] = segments
    from lucene_ray.index.build import logical_field_ttf as _lft

    _fttf = _lft(segments)
    for f_ in manifest.get("fields", {}):
        manifest["fields"][f_]["sum_ttf"] = _fttf.get(f_, 0)
    if tombs.shape[0]:
        from lucene_ray.index.build import _write_global_stats

        manifest["stats_dir"] = _write_global_stats(out_dir, segments)
    else:
        import shutil as _sh

        from lucene_ray.index.build import stats_path

        sname = m.get("stats_dir", "global_terms")
        gsrc = stats_path(index_dir, m)
        gdst = os.path.join(out_dir, sname)
        if not os.path.isdir(gdst):
            _sh.copytree(os.path.abspath(gsrc), gdst)
        manifest["stats_dir"] = sname
    from lucene_ray.index.commits import commit_manifest

    return commit_manifest(out_dir, manifest)
