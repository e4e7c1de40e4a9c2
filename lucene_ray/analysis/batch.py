"""Batch-vectorized analysis for ``map_batches`` hot paths.

Turns an Arrow string column into flat (term, doc_index, position) arrays
without per-row Python work where possible:

* **fast path** — rows whose text consists only of lowercase ASCII
  word-characters and spaces tokenize identically under whitespace split
  and the UAX#29 analyzer chain, so they go through
  ``pyarrow.compute.split_pattern`` + ``list_flatten`` (zero Python loops);
* **slow path** — remaining rows run the full Python analyzer
  (lucene_ray.analysis.analyzers), preserving exact semantics.

The split keeps the engine exact on arbitrary unicode while the common
web-text case stays Arrow-vectorized — the ColumnBatch-style ingest the
reference is itself moving toward (document/column/ColumnBatch.java:26-43).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer

# Rows matching this are tokenization-trivial: whitespace split == UAX#29,
# and lowercasing is a no-op. (Underscore joins chains in both paths.)
_SIMPLE_RE = r"^[a-z0-9_ ]*$"


def tokenize_column(
    texts: pa.ChunkedArray | pa.Array, analyzer: Analyzer = StandardAnalyzer
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Tokenize a string column.

    Returns ``(flat_terms, doc_idx, positions)`` where ``flat_terms`` is a
    pyarrow string array of every token occurrence in document order,
    ``doc_idx`` the row index of each occurrence, and ``positions`` the
    0-based token position within its document (stop-filtered tokens leave
    gaps, matching StopFilter position increments).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int32)

    simple_mask = pc.match_substring_regex(texts, _SIMPLE_RE)
    simple_mask = pc.fill_null(simple_mask, False)
    all_simple = bool(pc.all(simple_mask).as_py()) and not analyzer.stop_words

    if all_simple:
        return _tokenize_simple(texts)

    # Mixed batch: vectorize the simple rows, Python the rest, then stitch
    # back together in row order.
    mask_np = simple_mask.to_numpy(zero_copy_only=False)
    if analyzer.stop_words:
        mask_np = np.zeros(n, dtype=bool)  # stop filtering always slow path

    terms_per_row: list[list[str]] = [None] * n  # type: ignore[list-item]
    pos_per_row: list[np.ndarray] = [None] * n  # type: ignore[list-item]

    simple_rows = np.nonzero(mask_np)[0]
    if simple_rows.size:
        sub = texts.take(pa.array(simple_rows))
        flat, doc_idx, positions = _tokenize_simple(sub)
        flat_py = flat.to_pylist()
        bounds = np.searchsorted(doc_idx, np.arange(simple_rows.size + 1))
        for j, row in enumerate(simple_rows):
            lo, hi = bounds[j], bounds[j + 1]
            terms_per_row[row] = flat_py[lo:hi]
            pos_per_row[row] = positions[lo:hi]

    for row in np.nonzero(~mask_np)[0]:
        tp = analyzer.tokens_with_positions(texts[int(row)].as_py())
        terms_per_row[row] = [t for t, _ in tp]
        pos_per_row[row] = np.fromiter((p for _, p in tp), dtype=np.int32, count=len(tp))

    counts = np.fromiter((len(t) for t in terms_per_row), dtype=np.int64, count=n)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    flat_terms = pa.array(
        [t for row in terms_per_row for t in row], type=pa.string()
    )
    positions = (
        np.concatenate(pos_per_row) if n else np.empty(0, np.int32)
    ).astype(np.int32)
    return flat_terms, doc_idx, positions


def _tokenize_simple(texts: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace-split fast path (rows already verified simple)."""
    lists = pc.split_pattern(texts, " ")
    # drop empty strings from repeated/leading/trailing spaces
    flat = pc.list_flatten(lists)
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lengths)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    positions = (np.arange(doc_idx.shape[0], dtype=np.int64) - offsets[doc_idx]).astype(
        np.int32
    )
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        flat = pc.filter(flat, keep)
        doc_idx = doc_idx[keep_np]
        # re-number positions densely per doc (empty tokens are not tokens)
        order_in_doc = _dense_positions(doc_idx)
        positions = order_in_doc
    return flat, doc_idx, positions


def _dense_positions(doc_idx: np.ndarray) -> np.ndarray:
    """0-based running index within each doc for a doc-sorted index array."""
    if doc_idx.size == 0:
        return np.empty(0, np.int32)
    starts = np.nonzero(np.diff(doc_idx, prepend=doc_idx[0] - 1))[0]
    run_starts = np.zeros(doc_idx.shape[0], dtype=np.int64)
    run_starts[starts] = starts
    run_starts = np.maximum.accumulate(run_starts)
    return (np.arange(doc_idx.shape[0]) - run_starts).astype(np.int32)
