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


def _merge_group(group: pa.Table) -> pa.Table:
    """Re-encode one (term, salt) group's runs into a single blob."""
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
        # segments may interleave in doc space (arbitrary input partitioning)
        # -> k-way merge by actual doc id instead of run concatenation
        perm = np.argsort(docs, kind="stable")
        docs, freqs, norms = docs[perm], freqs[perm], norms[perm]
        if (np.diff(docs) == 0).any():
            raise ValueError("duplicate doc ids across merged segments")
    base = int(docs[0])
    blob = encode_postings(docs - base, freqs, norms)
    return pa.table(
        {
            "term": [group["term"][0].as_py()],
            "salt": [int(group["salt"][0].as_py())],
            "doc_base": [base],
            "df": [int(docs.shape[0])],
            "ttf": [int(sum(int(f.sum()) for f in freq_parts))],
            "blob": pa.array([blob], type=pa.large_binary()),
        }
    )


def force_merge(
    index_dir: str,
    out_dir: str,
    hot_term_df: int = 100_000,
    salt_buckets: int = 8,
) -> dict:
    """Merge ALL segments of ``index_dir`` into one doc-ordered segment set
    under ``out_dir`` via a (term, salt) shuffle. Returns the new manifest.

    ``hot_term_df``: terms whose global df exceeds this split into
    ``salt_buckets`` doc-range buckets before the shuffle (skew handling);
    others use a single salt so they re-encode in one group.
    """
    m = load_manifest(index_dir)
    segs = sorted(m["segments"], key=lambda s: s["doc_base"])

    # global df (already aggregated at build) -> hot set
    hot: set[str] = set()
    gt = pq.read_table(os.path.join(index_dir, "global_terms"))
    dfs = gt["df"].to_numpy()
    terms_all = gt["term"].to_pylist()
    for t, df in zip(terms_all, dfs):
        if df > hot_term_df:
            hot.add(t)

    n_salts = max(1, min(salt_buckets, len(segs)))
    # salt = source segment's rank bucket: doc-contiguous by construction
    salt_of_hot = {
        s["segment_id"]: (i * n_salts) // len(segs) for i, s in enumerate(segs)
    }
    salt_of_cold = {s["segment_id"]: 0 for s in segs}

    rows = ray.data.from_items(
        [{k: s[k] for k in ("segment_id", "path", "doc_base")} for s in segs]
    )

    def explode(batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            for r in _explode_segment(row, salt_of_hot, n_salts):
                if r["term"] not in hot:
                    r["salt"] = 0
                out_rows.append(r)
        return pa.table(
            {
                "term": [r["term"] for r in out_rows],
                "salt": [r["salt"] for r in out_rows],
                "doc_base": [r["doc_base"] for r in out_rows],
                "blob": pa.array([r["blob"] for r in out_rows], type=pa.large_binary()),
            }
        )

    merged = (
        rows.map_batches(explode, batch_size=1, batch_format="pyarrow")
        .groupby(["term", "salt"])
        .map_groups(_merge_group, batch_format="pyarrow")
    )

    # collect merged posting rows and write one segment (single doc range).
    # At web scale this final write would itself be sharded by term range;
    # locally the merged vocab fits one task.
    tbl = pa.concat_tables(
        merged.iter_batches(batch_format="pyarrow", batch_size=8192)
    )
    return _write_merged_segment(tbl, out_dir, m)


def _write_merged_segment(tbl: pa.Table, out_dir: str, src_manifest: dict) -> dict:
    # order rows by (term, salt): salt buckets are doc-contiguous ascending,
    # so per-term chunks concatenate to one globally doc-ordered list
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        tbl, sort_keys=[("term", "ascending"), ("doc_base", "ascending")]
    )
    tbl = tbl.take(idx)
    terms = tbl["term"].to_pylist()
    blobs = tbl["blob"].to_pylist()
    doc_bases = tbl["doc_base"].to_numpy()
    dfs = tbl["df"].to_numpy()
    ttfs = tbl["ttf"].to_numpy()

    segs = sorted(src_manifest["segments"], key=lambda s: s["doc_base"])
    global_base = int(segs[0]["doc_base"])
    max_doc = int(segs[-1]["max_doc_id"])
    seg_id = f"seg-{global_base:012d}-{max_doc:012d}"
    seg_dir_parent = os.path.join(out_dir, "segments")
    os.makedirs(seg_dir_parent, exist_ok=True)
    tmp = os.path.join(seg_dir_parent, f".tmp-{seg_id}-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)

    # fuse each term's salt-chunks into one blob by re-basing doc ids once
    out_terms, out_df, out_ttf, out_off, out_len = [], [], [], [], []
    chunks: list[bytes] = []
    off = 0
    i = 0
    n = len(terms)
    while i < n:
        j = i
        while j < n and terms[j] == terms[i]:
            j += 1
        if j - i == 1 and int(doc_bases[i]) == global_base:
            blob = blobs[i]
            df = int(dfs[i])
            ttf = int(ttfs[i])
        else:
            docs_parts, freq_parts, norm_parts = [], [], []
            for k in range(i, j):
                r = PostingsReader(blobs[k])
                d, f, nm = r.decode_all()
                docs_parts.append(d + int(doc_bases[k]))
                freq_parts.append(f)
                norm_parts.append(nm)
            docs = np.concatenate(docs_parts)
            fr = np.concatenate(freq_parts)
            nm_ = np.concatenate(norm_parts)
            if not (np.diff(docs) > 0).all():
                perm = np.argsort(docs, kind="stable")
                docs, fr, nm_ = docs[perm], fr[perm], nm_[perm]
            blob = encode_postings(docs - global_base, fr, nm_)
            df = int(docs.shape[0])
            ttf = int(fr.sum())
        out_terms.append(terms[i])
        out_df.append(df)
        out_ttf.append(ttf)
        out_off.append(off)
        out_len.append(len(blob))
        chunks.append(blob)
        off += len(blob)
        i = j

    with open(os.path.join(tmp, "postings.bin"), "wb") as f:
        for c in chunks:
            f.write(c)
    pq.write_table(
        pa.table(
            {
                "term": out_terms,
                "df": np.asarray(out_df, dtype=np.int64),
                "ttf": np.asarray(out_ttf, dtype=np.int64),
                "offset": np.asarray(out_off, dtype=np.int64),
                "length": np.asarray(out_len, dtype=np.int64),
            }
        ),
        os.path.join(tmp, "terms.parquet"),
    )
    # docs table: concat of source segments' docs tables, sorted by doc_id
    # (segreader binary-searches this column; sources may interleave)
    doc_tbl = pa.concat_tables(
        pq.read_table(os.path.join(s["path"], "docs.parquet")) for s in segs
    )
    doc_tbl = doc_tbl.take(pc.sort_indices(doc_tbl["doc_id"]))
    pq.write_table(doc_tbl, os.path.join(tmp, "docs.parquet"))

    doc_count = sum(s["doc_count"] for s in segs)
    sum_ttf = sum(s["sum_total_term_freq"] for s in segs)
    meta = {
        "segment_id": seg_id,
        "path": os.path.join(seg_dir_parent, seg_id),
        "doc_base": global_base,
        "max_doc_id": max_doc,
        "doc_count": doc_count,
        "sum_total_term_freq": sum_ttf,
        "n_terms": len(out_terms),
        "postings_bytes": off,
        "fingerprint": "merged:" + ",".join(s["fingerprint"] for s in segs),
        "build_secs": 0.0,
        "terms_per_sec": 0.0,
        "skipped": False,
        "merge_fan_in": len(segs),
    }
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    final = os.path.join(seg_dir_parent, seg_id)
    if os.path.isdir(final):
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)

    manifest = dict(src_manifest)
    manifest["segments"] = [meta]
    # merged index reuses the build's global term stats
    import shutil as _sh

    gsrc = os.path.join(os.path.dirname(segs[0]["path"]), "..", "global_terms")
    gdst = os.path.join(out_dir, "global_terms")
    if not os.path.isdir(gdst):
        _sh.copytree(os.path.abspath(gsrc), gdst)
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, "manifest.json"))
    return manifest
