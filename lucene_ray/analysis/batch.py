"""Batch-vectorized analysis for ``map_batches`` hot paths.

Turns an Arrow string column into flat (term, doc_index, position) arrays
without per-row Python work where possible:

* **fast path** — printable-ASCII rows tokenize through a chain of RE2
  kernels that reproduces the UAX#29-approx tokenizer exactly:
  ``utf8_lower`` (LowerCaseFilter), joiner protection (``.``/``'`` between
  word chars, ``,`` between digits — MidNumLet/SingleQuote/MidNum), a
  separator sweep, then ``split_pattern`` + ``list_flatten``. Stop
  filtering is a vectorized ``is_in`` over the flat token array with
  position gaps preserved (StopFilter semantics). Zero Python loops.
* **slow path** — non-ASCII rows (ideographs, combining marks, typographic
  quotes) and rows with >max_token_length chain runs go through the full
  Python analyzer, preserving exact semantics.

Real web text with case and punctuation stays on the Arrow path — only
genuinely non-ASCII rows pay Python (round-1 finding: the old fast path
required ``^[a-z0-9_ ]*$`` and any stop set disabled it entirely).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer

# placeholders for protected joiner chars (excluded from the fast-path mask)
_P_DOT, _P_APOS, _P_COMMA = "\x02", "\x03", "\x04"

# fast-path rows: printable ASCII + whitespace only (no placeholders, no
# ideographs, no typographic quotes, no combining marks)
_ASCII_RE = r"^[\x20-\x7e\t\n\r]*$"


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

    # trivial shortcut: rows of lowercase word chars + spaces tokenize as a
    # plain whitespace split — no lowering, no joiner chain (the common
    # case for pre-cleaned corpora; keeps the clean-text build rate)
    trivial = pc.fill_null(pc.match_substring_regex(texts, r"^[a-z0-9_ ]*$"), False)
    trivial = pc.and_(
        trivial,
        pc.invert(pc.fill_null(pc.match_substring_regex(
            texts, "[a-z0-9_]{%d}" % (analyzer.max_token_length + 1)), False)),
    )
    if bool(pc.all(trivial).as_py()):
        flat, doc_idx, positions = _split_ws(texts)
        flat, doc_idx, positions = _stop_filter(
            flat, doc_idx, positions, analyzer.stop_words
        )
        return _apply_token_filters(flat, analyzer), doc_idx, positions

    lower = analyzer.lowercase
    wc = "a-z0-9_" if lower else "A-Za-z0-9_"
    base = pc.utf8_lower(texts) if lower else texts

    fast = pc.fill_null(pc.match_substring_regex(texts, _ASCII_RE), False)
    # a chain run that long may need the reference's max-length chopping —
    # send the whole row to the exact Python path
    maxlen = analyzer.max_token_length
    long_run = pc.fill_null(
        pc.match_substring_regex(base, "[%s'.,]{%d}" % (wc, maxlen + 1)), False
    )
    fast = pc.and_(fast, pc.invert(long_run))
    mask_np = fast.to_numpy(zero_copy_only=False)

    if mask_np.all():
        flat, doc_idx, positions = _tokenize_ascii(base, wc)
        flat, doc_idx, positions = _stop_filter(
            flat, doc_idx, positions, analyzer.stop_words
        )
        return _apply_token_filters(flat, analyzer), doc_idx, positions

    # Mixed batch: vectorize the fast rows, Python the rest, then stitch
    # back into doc-major order.
    term_parts: list[pa.Array] = []
    doc_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []

    fast_rows = np.nonzero(mask_np)[0]
    if fast_rows.size:
        sub = base.take(pa.array(fast_rows))
        flat, doc_idx, positions = _tokenize_ascii(sub, wc)
        flat, doc_idx, positions = _stop_filter(
            flat, doc_idx, positions, analyzer.stop_words
        )
        flat = _apply_token_filters(flat, analyzer)
        term_parts.append(flat)
        doc_parts.append(fast_rows[doc_idx])
        pos_parts.append(positions)

    slow_rows = np.nonzero(~mask_np)[0]
    slow_terms: list[str] = []
    slow_doc: list[np.ndarray] = []
    slow_pos: list[np.ndarray] = []
    for row in slow_rows:
        tp = analyzer.tokens_with_positions(texts[int(row)].as_py())
        slow_terms.extend(t for t, _ in tp)
        slow_doc.append(np.full(len(tp), row, dtype=np.int64))
        slow_pos.append(np.fromiter((p for _, p in tp), dtype=np.int32, count=len(tp)))
    if slow_rows.size:
        term_parts.append(pa.array(slow_terms, type=pa.string()))
        doc_parts.append(np.concatenate(slow_doc) if slow_doc else np.empty(0, np.int64))
        pos_parts.append(np.concatenate(slow_pos) if slow_pos else np.empty(0, np.int32))

    flat = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                             for p in term_parts])
    doc_idx = np.concatenate(doc_parts)
    positions = np.concatenate(pos_parts).astype(np.int32)
    order = np.argsort(doc_idx, kind="stable")
    if not (np.diff(order) >= 0).all():
        flat = flat.take(pa.array(order))
        doc_idx = doc_idx[order]
        positions = positions[order]
    return flat, doc_idx, positions


def _tokenize_ascii(texts: pa.Array, wc: str) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """UAX#29-approx tokenization of ASCII rows as pure RE2 kernels.

    Joiners (``.``/``'`` between word chars, ``,`` between digits) are
    protected with placeholder bytes before the separator sweep; two passes
    handle chains (``a.b.c``, ``1,000,000``) because RE2's GlobalReplace
    consumes the shared boundary character of adjacent pairs."""
    t = texts
    for _ in range(2):
        t = pc.replace_substring_regex(t, "([%s])\\.([%s])" % (wc, wc), "\\1%s\\2" % _P_DOT)
        t = pc.replace_substring_regex(t, "([%s])'([%s])" % (wc, wc), "\\1%s\\2" % _P_APOS)
        t = pc.replace_substring_regex(t, "([0-9]),([0-9])", "\\1%s\\2" % _P_COMMA)
    t = pc.replace_substring_regex(t, "[^%s%s%s%s]+" % (wc, _P_DOT, _P_APOS, _P_COMMA), " ")
    t = pc.replace_substring(t, _P_DOT, ".")
    t = pc.replace_substring(t, _P_APOS, "'")
    t = pc.replace_substring(t, _P_COMMA, ",")
    return _split_ws(t)


def _apply_token_filters(flat: pa.Array, analyzer: Analyzer) -> pa.Array:
    """Per-token filters (fold/stem) mapped over the dictionary-encoded
    VOCABULARY, not per occurrence: Python cost is O(unique tokens)."""
    if not analyzer.has_token_filters or len(flat) == 0:
        return flat
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    vocab = d.dictionary.to_pylist()
    mapped = pa.array(
        [analyzer.transform_token(t) for t in vocab], type=pa.string()
    )
    return pc.take(mapped, d.indices)


def _stop_filter(
    flat: pa.Array, doc_idx: np.ndarray, positions: np.ndarray, stop_words
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Vectorized StopFilter: drop stop tokens, keep position gaps."""
    if not stop_words:
        return flat, doc_idx, positions
    sw = pa.array(sorted(stop_words), type=pa.string())
    keep = pc.invert(pc.is_in(flat, value_set=sw))
    keep_np = keep.to_numpy(zero_copy_only=False)
    if keep_np.all():
        return flat, doc_idx, positions
    return pc.filter(flat, keep), doc_idx[keep_np], positions[keep_np]


def _split_ws(texts: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace-split rows already reduced to space-separated tokens."""
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
        positions = _dense_positions(doc_idx)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, doc_idx, positions


# back-compat alias (round-1 name)
_tokenize_simple = _split_ws


def _dense_positions(doc_idx: np.ndarray) -> np.ndarray:
    """0-based running index within each doc for a doc-sorted index array."""
    if doc_idx.size == 0:
        return np.empty(0, np.int32)
    starts = np.nonzero(np.diff(doc_idx, prepend=doc_idx[0] - 1))[0]
    run_starts = np.zeros(doc_idx.shape[0], dtype=np.int64)
    run_starts[starts] = starts
    run_starts = np.maximum.accumulate(run_starts)
    return (np.arange(doc_idx.shape[0]) - run_starts).astype(np.int32)
