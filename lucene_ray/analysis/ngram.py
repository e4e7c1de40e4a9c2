"""Character n-gram expansion — NGramTokenizer / EdgeNGramTokenFilter
(analysis/common/.../ngram/NGramTokenizer.java:62,
EdgeNGramTokenFilter.java): sub-token character grams for substring and
search-as-you-type matching.

Vectorization: grams are generated per UNIQUE token (dictionary encode →
expand vocabulary → take), so Python cost is O(vocab x gram count), not
O(corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_ngrams(token: str, min_n: int, max_n: int, edge: bool = False) -> list[str]:
    """All (or edge-anchored) character n-grams of one token."""
    n = len(token)
    out = []
    if edge:
        for k in range(min_n, min(max_n, n) + 1):
            out.append(token[:k])
        return out
    for k in range(min_n, max_n + 1):
        for i in range(0, n - k + 1):
            out.append(token[i : i + k])
    return out


def expand_ngrams(
    flat_terms: pa.Array,
    doc_idx: np.ndarray,
    min_n: int = 2,
    max_n: int = 4,
    edge: bool = False,
) -> tuple[pa.Array, np.ndarray]:
    """(gram, doc_idx) rows for every token occurrence's n-grams."""
    if isinstance(flat_terms, pa.ChunkedArray):
        flat_terms = flat_terms.combine_chunks()
    if len(flat_terms) == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    d = pc.dictionary_encode(flat_terms)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary.to_pylist()
    grams_per = [token_ngrams(v, min_n, max_n, edge) for v in vocab]
    n_grams = np.array([len(g) for g in grams_per], dtype=np.int64)
    # vocabulary-level gram table, then occurrence expansion by repeat
    vocab_flat = pa.array([g for gs in grams_per for g in gs], type=pa.string())
    vocab_starts = np.cumsum(n_grams) - n_grams
    occ = n_grams[codes]
    take_idx = np.repeat(vocab_starts[codes], occ) + _ranges(occ)
    out_terms = vocab_flat.take(pa.array(take_idx))
    out_doc = np.repeat(doc_idx, occ)
    return out_terms, out_doc


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concatenate(arange(c) for c in counts), vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def edge_ngram_counts(pages, min_n: int = 2, max_n: int = 4,
                      text_col: str = "text"):
    """Per doc: number of DISTINCT edge n-grams over its tokens — the
    search-as-you-type vocabulary footprint (map_batches pipeline)."""
    from lucene_ray.analysis.batch import tokenize_column

    def count(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, doc_idx, _pos = tokenize_column(texts)
        grams, gdoc = expand_ngrams(flat, doc_idx, min_n, max_n, edge=True)
        if len(grams) == 0:
            return pa.table({
                "doc_id": b["doc_id"],
                "n_edge_ngrams": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            })
        t = pa.table({"d": gdoc, "g": grams})
        agg = t.group_by("d").aggregate([("g", "count_distinct")])
        counts = np.zeros(b.num_rows, dtype=np.int64)
        counts[agg["d"].to_numpy()] = agg["g_count_distinct"].to_numpy()
        return pa.table({"doc_id": b["doc_id"], "n_edge_ngrams": counts})

    return pages.map_batches(count, batch_format="pyarrow")
