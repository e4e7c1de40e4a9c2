"""Best-passage highlighting — the UnifiedHighlighter role
(highlighter/uhighlight/UnifiedHighlighter.java:96) reduced to its scoring
core: for a document and a set of query terms, pick the token window with
the most query-term occurrences (ties -> earliest window) and return its
start position and text. Runs vectorized per doc (one convolution over a
term-membership indicator), and as a batch ``map_batches`` stage over a
corpus for pipeline use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def best_passage(tokens: list[str], terms: set[str], window: int = 10):
    """(start, snippet) of the best window, or None when no term matches."""
    n = len(tokens)
    if n == 0:
        return None
    ind = np.fromiter((t in terms for t in tokens), dtype=bool, count=n).astype(np.int32)
    if not ind.any():
        return None
    counts = np.convolve(ind, np.ones(window, dtype=np.int32))[window - 1 :]
    max_start = max(n - window, 0)
    counts = counts[: max_start + 1]
    best = int(np.argmax(counts))  # argmax takes the FIRST maximum
    return best, " ".join(tokens[best : best + window])


def highlight_batch(
    batch: pa.Table,
    terms: set[str],
    analyzer,
    window: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """map_batches UDF: (doc_id, start, snippet) rows for matching docs."""
    ids, starts, snippets = [], [], []
    doc_ids = batch["doc_id"].to_pylist()
    for i, text in enumerate(batch[text_col].to_pylist()):
        hit = best_passage(analyzer.tokens(text), terms, window)
        if hit is not None:
            ids.append(doc_ids[i])
            starts.append(hit[0])
            snippets.append(hit[1])
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "start": pa.array(starts, type=pa.int64()),
            "snippet": pa.array(snippets, type=pa.string()),
        }
    )
