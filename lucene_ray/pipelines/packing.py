"""Sequence packing for LLM pretraining: concatenate documents in
doc_id order and cut the token stream every ``budget`` tokens, emitting
one (pack_id, doc_id, begin_tok, end_tok) segment per document x pack
overlap — the standard concat-and-chunk shaping step between curation
and tokenization (the role of the reference's benchmark doc-maker
window, lucene/benchmark/.../DocMaker.java:61, generalized to a fixed
token budget).

Scale story (100 TB): the only global state is the exclusive prefix sum
of per-document token counts in doc_id order. That is computed in two
levels — per-bucket sums (bucket = doc_id // bucket_docs) shuffle as a
TINY aggregate (num_docs / bucket_docs rows), the driver cumsums that
small table once, and the per-bucket offsets broadcast back into a
per-bucket vectorized expansion. No stage ever materializes the corpus;
the wide ops are one small groupby-sum and one groupby-map_groups keyed
on the same bucket. Buckets hold ``bucket_docs`` docs, so per-group
Python dispatch amortizes over tens of thousands of rows (the
events_sessionization contract, not the per-key anti-pattern).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_counts(pages, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, ntok) via ONE split kernel per batch; ntok counts
    whitespace-split fields exactly like SQL string_split (empty text
    counts 1 — the '' field), so the oracle twin matches by
    construction."""

    def count(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
        n = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: b[id_col], "ntok": n})

    return pages.map_batches(count, batch_format="pyarrow")


def pack_sequences(pages, budget: int = 2048, text_col: str = "text",
                   id_col: str = "doc_id", bucket_docs: int = 65536):
    """Pack the corpus token stream into fixed-``budget`` sequences.

    Returns a Dataset of (pack_id, doc_id, begin_tok, end_tok): document
    ``doc_id`` contributes its tokens [begin_tok, end_tok) to pack
    ``pack_id``. A document longer than the budget (or one straddling a
    boundary) appears in several packs; every pack except the last is
    exactly ``budget`` tokens when its segments concatenate in
    (pack_id, doc_id) order.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    counts = token_counts(pages, text_col=text_col, id_col=id_col)
    counts = counts.map_batches(
        lambda b: b.append_column(
            "bucket", pc.divide(b[id_col], bucket_docs)),
        batch_format="pyarrow")
    # (doc_id, ntok, bucket) is ~24 bytes/row — materialize once so the
    # level-1 aggregate and the expansion don't each re-run the
    # tokenize lineage (the one safe mid-pipeline materialization:
    # output size is corpus-row-count, not corpus-byte-count)
    counts = counts.materialize()
    # level-1 prefix: per-BATCH bucket partials -> driver combine + cumsum.
    # No shuffle: each partial is at most (buckets touched by the batch)
    # rows, and the combined table is num_docs / bucket_docs rows.
    def bucket_partials(b: pa.Table) -> pa.Table:
        bk = b["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = b["ntok"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(bk, return_inverse=True)
        return pa.table({"bucket": u,
                         "s": np.bincount(inv, weights=nt).astype(np.int64)})

    parts = counts.map_batches(
        bucket_partials, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in parts:
        acc[r["bucket"]] = acc.get(r["bucket"], 0) + r["s"]
    bucket_ids = np.array(sorted(acc), dtype=np.int64)
    bucket_tot = np.array([acc[int(i)] for i in bucket_ids], dtype=np.int64)
    bucket_off = np.concatenate(([0], np.cumsum(bucket_tot[:-1])))
    offsets = dict(zip(bucket_ids.tolist(), bucket_off.tolist()))
    B = int(budget)

    def expand(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["ntok"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        base = offsets[int(ids[0]) // bucket_docs]
        off = base + np.concatenate(([0], np.cumsum(n[:-1])))
        lo = off // B
        hi = (off + n - 1) // B          # n >= 1 always (split counts '' )
        k = hi - lo + 1
        rep = np.repeat(np.arange(ids.shape[0], dtype=np.int64), k)
        intra = (np.arange(rep.shape[0], dtype=np.int64)
                 - np.concatenate(([0], np.cumsum(k)))[rep])
        pack = lo[rep] + intra
        d_off, d_n = off[rep], n[rep]
        begin = np.maximum(d_off, pack * B) - d_off
        end = np.minimum(d_off + d_n, (pack + 1) * B) - d_off
        return pa.table({
            "pack_id": pack,
            "doc_id": ids[rep],
            "begin_tok": begin,
            "end_tok": end,
        })

    return counts.groupby("bucket").map_groups(
        expand, batch_format="pyarrow")
