"""Segment merging — the distributed SegmentMerger / forceMerge.

Reference semantics: TieredMergePolicy picks groups of similar-sized,
doc-adjacent segments (index/TieredMergePolicy.java:76-83,314);
SegmentMerger k-way-merges their postings with docID remapping
(index/SegmentMerger.java:44,122-174, index/DocIDMerger.java:32);
IndexMergeTool/addIndexes compacts N indexes to one
(misc/IndexMergeTool.java, index/IndexWriter.java:3051).

Ray-Data translation (SURVEY.md §7.3): posting rows are exploded to
``(term, salt, doc_base, blob)`` and shuffled with ``groupby(term, salt)``;
each group re-encodes its term's posting runs into one blob. **Salt-based
skew splitting**: a hot term (stopword-grade df) would form one giant group,
so its rows are salted by source-segment range — each salt bucket merges a
doc-contiguous sub-run independently, and because doc IDs are globally
ordered by (doc_base, local id), the per-salt blobs concatenate back in plain
salt order without another re-encode. Docs within a merged segment keep
their global IDs (no remap needed — our IDs are (doc_base + local), already
global and disjoint; Lucene must remap because its IDs are leaf-local).

Output: one merged segment directory per doc-range group, same layout as
build segments, so SegmentReader/Searcher work unchanged on merged indexes.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from lucene_ray.codec.postings import PostingsReader, encode_postings
from lucene_ray.index.build import load_manifest


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


def _explode_segment(row: dict, salt_of: dict, n_salts: int) -> list[dict]:
    """One input row per source segment -> posting rows (term, salt, ...)."""
    seg_path = row["path"]
    terms = pq.read_table(os.path.join(seg_path, "terms.parquet"))
    with open(os.path.join(seg_path, "postings.bin"), "rb") as f:
        bin_data = f.read()
    out = []
    salt = salt_of[row["segment_id"]]
    offs = terms["offset"].to_numpy()
    lens = terms["length"].to_numpy()
    for i, term in enumerate(terms["term"].to_pylist()):
        out.append(
            {
                "term": term,
                "salt": salt,
                "doc_base": row["doc_base"],
                "blob": bin_data[offs[i] : offs[i] + lens[i]],
            }
        )
    return out


_EMPTY_MERGED = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("blob", pa.large_binary()),
    ]
)


def _make_merge_group(global_base: int, tombs_ref=None):
    """Group fn: re-encode one (term, salt) group's runs into a single blob
    with doc ids relative to the GLOBAL base — every merged blob then shares
    one doc_base, so shard segments never re-encode cold terms. Tombstoned
    docs are squeezed out here (DocIDMerger semantics: merge is the
    compaction that physically drops deletes)."""

    def merge_group(group: pa.Table) -> pa.Table:
        order = np.argsort(group["doc_base"].to_numpy())
        blobs = group["blob"].to_pylist()
        docs_parts, freq_parts, norm_parts = [], [], []
        for i in order:
            r = PostingsReader(blobs[i])
            d, f, nm = r.decode_all()
            docs_parts.append(d + int(group["doc_base"][int(i)].as_py()))
            freq_parts.append(f)
            norm_parts.append(nm)
        docs = np.concatenate(docs_parts)
        freqs = np.concatenate(freq_parts)
        norms = np.concatenate(norm_parts)
        if not (np.diff(docs) > 0).all():
            # segments may interleave in doc space (arbitrary input
            # partitioning) -> k-way merge by actual doc id
            perm = np.argsort(docs, kind="stable")
            docs, freqs, norms = docs[perm], freqs[perm], norms[perm]
            if (np.diff(docs) == 0).any():
                raise ValueError("duplicate doc ids across merged segments")
        if tombs_ref is not None:
            import ray as _ray

            from lucene_ray.index.deletes import mask_live

            live = mask_live(docs, _ray.get(tombs_ref))
            docs, freqs, norms = docs[live], freqs[live], norms[live]
            if docs.shape[0] == 0:
                return _EMPTY_MERGED.empty_table()
        blob = encode_postings(docs - global_base, freqs, norms)
        return pa.table(
            {
                "term": [group["term"][0].as_py()],
                "salt": [int(group["salt"][0].as_py())],
                "df": [int(docs.shape[0])],
                "ttf": [int(freqs.astype(np.int64).sum())],
                "blob": pa.array([blob], type=pa.large_binary()),
            }
        )

    return merge_group


def _make_fuse_term(global_base: int):
    """Group fn: concatenate one hot term's salt-bucket blobs (all already
    at the global base) into one doc-ordered blob."""

    def fuse(group: pa.Table) -> pa.Table:
        docs_parts, freq_parts, norm_parts = [], [], []
        for blob in group["blob"].to_pylist():
            d, f, nm = PostingsReader(blob).decode_all()
            docs_parts.append(d)
            freq_parts.append(f)
            norm_parts.append(nm)
        docs = np.concatenate(docs_parts)
        freqs = np.concatenate(freq_parts)
        norms = np.concatenate(norm_parts)
        perm = np.argsort(docs, kind="stable")
        docs, freqs, norms = docs[perm], freqs[perm], norms[perm]
        blob = encode_postings(docs, freqs, norms)
        return pa.table(
            {
                "term": [group["term"][0].as_py()],
                "salt": [0],
                "df": [int(docs.shape[0])],
                "ttf": [int(freqs.astype(np.int64).sum())],
                "blob": pa.array([blob], type=pa.large_binary()),
            }
        )

    return fuse


class _ShardWriter:
    """map_batches callable: one term-range shard segment per input batch.

    Rows arrive term-sorted with one row per term, so a batch is a clean
    term range; the segment layout is identical to build segments except
    meta.docs_path points at the shared merged docs table and owns_docs
    marks exactly one shard as the doc-space owner (MatchAllDocsQuery)."""

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

    def __call__(self, b: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.compute as pc

        if b.num_rows == 0:
            return pa.table({"segment_id": pa.array([], pa.string()),
                             "path": pa.array([], pa.string()),
                             "min_term": pa.array([], pa.string()),
                             "n_terms": pa.array([], pa.int64()),
                             "postings_bytes": pa.array([], pa.int64())})
        idx = pc.sort_indices(b["term"])
        b = b.take(idx)
        terms = b["term"]
        first = terms[0].as_py()
        last = terms[-1].as_py()
        seg_id = "mseg-" + hashlib.sha1(
            f"{first}:{last}:{b.num_rows}".encode()
        ).hexdigest()[:12]
        parent = os.path.join(self.out_dir, "segments")
        os.makedirs(parent, exist_ok=True)
        tmp = os.path.join(parent, f".tmp-{seg_id}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)

        blobs = b["blob"]
        lengths = pc.binary_length(blobs).to_numpy().astype(np.int64)
        offsets = np.cumsum(lengths) - lengths
        with open(os.path.join(tmp, "postings.bin"), "wb") as f:
            for blob in blobs.to_pylist():
                f.write(blob)
        pq.write_table(
            pa.table(
                {
                    "term": terms,
                    "df": b["df"].to_numpy().astype(np.int64),
                    "ttf": b["ttf"].to_numpy().astype(np.int64),
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
            "n_terms": int(b.num_rows),
            "postings_bytes": int(lengths.sum()),
            "fingerprint": self.fingerprint,
            "build_secs": 0.0,
            "terms_per_sec": 0.0,
            "skipped": False,
            "merge_fan_in": self.merge_fan_in,
            "docs_path": self.docs_path,
            "positions_path": self.positions_path,
            "owns_docs": False,
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
                "n_terms": [int(b.num_rows)],
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
    segments under ``out_dir`` via a (term, salt) shuffle; every stage is
    distributed — the driver only assembles the (tiny) manifest.

    ``hot_term_df``: terms whose global df exceeds this split into
    ``salt_buckets`` doc-range buckets before the shuffle (skew handling),
    then fuse in a second (small) per-term group stage; cold terms merge in
    one group and are final immediately. ``terms_per_shard`` bounds the
    vocab slice each output shard holds.

    Scale note: all shards share one merged docs table (norms); bucketing
    the docs table by doc range is the follow-up for 10^12-doc indexes.
    """
    m = load_manifest(index_dir)
    segs = sorted(m["segments"], key=lambda s: s["doc_base"])
    global_base = int(min(s["doc_base"] for s in segs))
    max_doc = int(max(s["max_doc_id"] for s in segs))
    doc_count = sum(s["doc_count"] for s in segs)
    sum_ttf = sum(s["sum_total_term_freq"] for s in segs)
    fingerprint = "merged:" + ",".join(s["fingerprint"] for s in segs)

    # global df (already aggregated at build) -> hot set
    gt = pq.read_table(os.path.join(index_dir, "global_terms"))
    hot = set(
        t for t, df in zip(gt["term"].to_pylist(), gt["df"].to_numpy())
        if df > hot_term_df
    )

    from lucene_ray.index.deletes import load_tombstones

    tombs = load_tombstones(index_dir)
    tombs_ref = ray.put(tombs) if tombs.shape[0] else None

    n_salts = max(1, min(salt_buckets, len(segs)))
    # salt = source segment's rank bucket: doc-contiguous by construction
    salt_of_hot = {
        s["segment_id"]: (i * n_salts) // len(segs) for i, s in enumerate(segs)
    }

    rows = ray.data.from_items(
        [{k: s[k] for k in ("segment_id", "path", "doc_base")} for s in segs]
    )

    hot_arr = pa.array(sorted(hot), type=pa.string())

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for row in batch.to_pylist():
            t = _segment_postings_table(row["path"])
            salt = np.where(
                pc.is_in(t["term"], value_set=hot_arr).to_numpy(zero_copy_only=False),
                salt_of_hot[row["segment_id"]],
                0,
            ).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "term": t["term"],
                        "salt": pa.array(salt),
                        "doc_base": pa.array(
                            np.full(t.num_rows, row["doc_base"], dtype=np.int64)
                        ),
                        "blob": t["blob"],
                    }
                )
            )
        return pa.concat_tables(parts)

    merged = (
        rows.map_batches(explode, batch_size=1, batch_format="pyarrow")
        .groupby(["term", "salt"])
        .map_groups(_make_merge_group(global_base, tombs_ref), batch_format="pyarrow")
        .materialize()  # vocab-sized rows, read by both branches below
    )

    import pyarrow.compute as pc

    hot_list = sorted(hot)

    def cold_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(b["term"], value_set=pa.array(hot_list))))

    def hot_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["term"], value_set=pa.array(hot_list)))

    cold = merged.map_batches(cold_rows, batch_format="pyarrow")
    final_rows = cold
    if hot_list:
        fused_hot = (
            merged.map_batches(hot_rows, batch_format="pyarrow")
            .groupby("term")
            .map_groups(_make_fuse_term(global_base), batch_format="pyarrow")
        )
        final_rows = cold.union(fused_hot)

    # shared merged docs table (doc_id-sorted for binary search), minus
    # tombstoned docs — the merge is the compaction that drops deletes
    docs_dir = os.path.join(out_dir, "docs")
    if not os.path.isdir(docs_dir):
        tmp_docs = os.path.join(out_dir, f".tmp-docs-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_docs, exist_ok=True)
        dds = ray.data.read_parquet(
            [os.path.join(s["path"], "docs.parquet") for s in segs]
        )
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

    writer = _ShardWriter(
        out_dir, global_base, max_doc, doc_count, sum_ttf,
        docs_dir, fingerprint, len(segs), positions_path=pos_dir,
    )
    shard_rows = (
        final_rows.sort("term")
        .map_batches(writer, batch_size=terms_per_shard, batch_format="pyarrow")
        .take_all()  # tiny: one row per shard
    )
    shard_rows.sort(key=lambda r: r["min_term"])

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
    manifest["sum_total_term_freq"] = sum_ttf
    manifest["segments"] = segments
    if tombs.shape[0]:
        # deletes are now physical: recompute term stats from the shards
        from lucene_ray.index.build import _write_global_stats

        _write_global_stats(out_dir, segments)
    else:
        import shutil as _sh

        gsrc = os.path.join(index_dir, "global_terms")
        gdst = os.path.join(out_dir, "global_terms")
        if not os.path.isdir(gdst):
            _sh.copytree(os.path.abspath(gsrc), gdst)
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, "manifest.json"))
    return manifest


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
    from lucene_ray.codec.postings import encode_postings_many
    from lucene_ray.index.deletes import load_tombstones, mask_live
    from lucene_ray.search.segreader import SegmentReader

    m = load_manifest(index_dir)
    segs = sorted(m["segments"], key=lambda s: s["doc_base"])
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
            term_parts, doc_parts, freq_parts, norm_parts = [], [], [], []
            for p in paths:
                r = SegmentReader(p)
                dfs = r.df.astype(np.int64)
                for ti in range(len(r.terms)):
                    d, f, nm = r.postings_reader(ti).decode_all()
                    doc_parts.append(d + r.doc_base)
                    freq_parts.append(f)
                    norm_parts.append(nm)
                term_parts.append(np.repeat(r.terms, dfs))
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
    if tombs.shape[0]:
        from lucene_ray.index.build import _write_global_stats

        _write_global_stats(out_dir, segments)
    else:
        import shutil as _sh

        gsrc = os.path.join(index_dir, "global_terms")
        gdst = os.path.join(out_dir, "global_terms")
        if not os.path.isdir(gdst):
            _sh.copytree(os.path.abspath(gsrc), gdst)
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, "manifest.json"))
    return manifest
