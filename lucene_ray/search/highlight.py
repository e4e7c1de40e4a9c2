"""Best-passage highlighting — the UnifiedHighlighter role
(highlighter/uhighlight/UnifiedHighlighter.java:96) reduced to its scoring
core: for a document and a set of query terms, pick the token window with
the most query-term occurrences (ties -> earliest window) and return its
start position plus the CHARACTER-OFFSET-accurate snippet sliced from the
original text (offsets ride with positions in the index — the
IndexOptions ..._AND_OFFSETS variant, index/IndexOptions.java:46).

Two sources:
* :func:`highlight_batch` — analyze the text column directly (map_batches
  stage over a corpus);
* :func:`highlight_from_index` — read (pos, start_offset, end_offset) rows
  from the positional index, no re-analysis (the stored-offsets path the
  reference's postings highlighter uses).
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


def best_passage_offsets(tokens_off, terms: set[str], window: int = 10):
    """(start_pos, start_offset, end_offset) of the best window over
    (term, pos, start, end) tuples, or None when no term matches."""
    n = len(tokens_off)
    if n == 0:
        return None
    ind = np.fromiter(
        (t in terms for t, _p, _s, _e in tokens_off), dtype=bool, count=n
    ).astype(np.int32)
    if not ind.any():
        return None
    counts = np.convolve(ind, np.ones(window, dtype=np.int32))[window - 1 :]
    counts = counts[: max(n - window, 0) + 1]
    best = int(np.argmax(counts))
    last = min(best + window, n) - 1
    return best, int(tokens_off[best][2]), int(tokens_off[last][3])


def highlight_batch(
    batch: pa.Table,
    terms: set[str],
    analyzer,
    window: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """map_batches UDF: (doc_id, start, start_offset, end_offset, snippet)
    rows for matching docs; the snippet is the exact character slice of the
    original text."""
    ids, starts, s_offs, e_offs, snippets = [], [], [], [], []
    doc_ids = batch["doc_id"].to_pylist()
    for i, text in enumerate(batch[text_col].to_pylist()):
        hit = best_passage_offsets(analyzer.tokens_with_offsets(text), terms, window)
        if hit is not None:
            pos, so, eo = hit
            ids.append(doc_ids[i])
            starts.append(pos)
            s_offs.append(so)
            e_offs.append(eo)
            snippets.append(text[so:eo])
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "start": pa.array(starts, type=pa.int64()),
            "start_offset": pa.array(s_offs, type=pa.int64()),
            "end_offset": pa.array(e_offs, type=pa.int64()),
            "snippet": pa.array(snippets, type=pa.string()),
        }
    )


def highlight_from_index(searcher, doc_ids, terms: set[str], window: int = 10):
    """Offset-accurate passages WITHOUT re-analysis: the per-token
    (pos, start_offset, end_offset) rows come from the positional index,
    the snippet text from the stored-fields source. ``doc_ids`` are global
    ids; returns the same schema as :func:`highlight_batch`."""
    import pyarrow.compute as pc

    from lucene_ray.index.fields import FIELD_MARK

    ids = sorted(int(d) for d in doc_ids)
    rows = {}
    for reader in searcher.readers:
        t = reader.positions_for_docs(ids)
        if t.num_rows == 0:
            continue
        # default field only: \x01-prefixed field-section tokens have their
        # own position space and would interleave wrongly
        t = t.filter(pc.invert(pc.starts_with(t["term"], FIELD_MARK)))
        if t.num_rows == 0:
            continue
        d = t["doc_id"].to_numpy()
        tm = t["term"].to_pylist()
        p = t["pos"].to_numpy()
        so = t["start_offset"].to_numpy()
        eo = t["end_offset"].to_numpy()
        order = np.lexsort((p, d))
        for i in order:
            rows.setdefault(int(d[i]), []).append(
                (tm[i], int(p[i]), int(so[i]), int(eo[i]))
            )
    out_ids, starts, s_offs, e_offs = [], [], [], []
    for doc in ids:
        toks = rows.get(doc)
        if not toks:
            continue
        hit = best_passage_offsets(toks, terms, window)
        if hit is None:
            continue
        out_ids.append(doc)
        starts.append(hit[0])
        s_offs.append(hit[1])
        e_offs.append(hit[2])
    snippets = [None] * len(out_ids)
    try:
        id_col = searcher.manifest.get("id_col", "doc_id")
        text_col = searcher.manifest.get("text_col", "text")
        fetched = searcher.fetch_docs(out_ids, columns=[id_col, text_col])
        # fetch silently drops ids missing from the source: align by id
        by_id = dict(zip(fetched[id_col].to_pylist(),
                         fetched[text_col].to_pylist()))
        snippets = [
            (by_id[d][s:e] if d in by_id else None)
            for d, s, e in zip(out_ids, s_offs, e_offs)
        ]
    except ValueError:
        pass  # no stored source: offsets only
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "start": pa.array(starts, type=pa.int64()),
            "start_offset": pa.array(s_offs, type=pa.int64()),
            "end_offset": pa.array(e_offs, type=pa.int64()),
            "snippet": pa.array(snippets, type=pa.string()),
        }
    )


def top_passages(searcher, doc_ids, terms: set, max_passages: int = 3,
                 window: int = 10):
    """Scored multi-passage selection — the UnifiedHighlighter
    PassageScorer role (highlighter/uhighlight/PassageScorer.java:42,
    FieldHighlighter.highlightOffsetsEnums): rank each document's
    passages by summed per-term weight and keep the top
    ``max_passages``.

    Adaptations, documented:
    * passages are fixed non-overlapping ``window``-token ranges
      (start positions 0, window, 2*window, ...) — the reference breaks
      on sentences via BreakIterator; the synthetic corpus has no
      sentence structure, so fixed windows stand in;
    * passage score = sum over query terms of tf_in_passage * idf with
      the engine's BM25 idf ln(1 + (N - df + 0.5)/(df + 0.5)) — the
      reference's PassageScorer folds tf through a k1-saturation with a
      passage-position norm; the idf*tf core and the ranking contract
      (score desc, start asc) are the same.

    Returns a pyarrow Table (doc_id, win_start, score, start_off,
    end_off) — per doc up to ``max_passages`` rows ordered by
    (doc_id, score desc, win_start)."""
    import math

    stats = searcher.term_stats(set(terms))
    n = float(searcher.doc_count)
    idf = {t: math.log(1 + (n - df + 0.5) / (df + 0.5))
           for t, (df, _ttf) in stats.items()}
    ids = sorted(int(d) for d in doc_ids)
    rows: dict = {}
    for reader in searcher.readers:
        t = reader.positions_for_docs(ids)
        if t.num_rows == 0:
            continue
        import pyarrow.compute as pc

        from lucene_ray.index.fields import FIELD_MARK

        t = t.filter(pc.invert(pc.starts_with(t["term"], FIELD_MARK)))
        d = t["doc_id"].to_numpy()
        tm = t["term"].to_pylist()
        p = t["pos"].to_numpy()
        so = t["start_offset"].to_numpy()
        eo = t["end_offset"].to_numpy()
        for i in range(d.shape[0]):
            rows.setdefault(int(d[i]), []).append(
                (int(p[i]), tm[i], int(so[i]), int(eo[i])))
    out = {"doc_id": [], "win_start": [], "score": [],
           "start_off": [], "end_off": []}
    for doc in ids:
        toks = rows.get(doc)
        if not toks:
            continue
        wins: dict = {}
        for pos, term, s_off, e_off in toks:
            w = wins.setdefault(pos // window * window,
                                [0.0, None, None])
            if term in idf:
                w[0] += idf[term]
            # passage offsets span first..last token in the window
            w[1] = s_off if w[1] is None else min(w[1], s_off)
            w[2] = e_off if w[2] is None else max(w[2], e_off)
        ranked = sorted(((ws, st) for st, (ws, _s, _e) in wins.items()
                         if ws > 0), key=lambda x: (-x[0], x[1]))
        for score, start in ranked[:max_passages]:
            out["doc_id"].append(doc)
            out["win_start"].append(start)
            out["score"].append(score)
            out["start_off"].append(wins[start][1])
            out["end_off"].append(wins[start][2])
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "win_start": pa.array(out["win_start"], pa.int64()),
        "score": pa.array(out["score"], pa.float64()),
        "start_off": pa.array(out["start_off"], pa.int64()),
        "end_off": pa.array(out["end_off"], pa.int64()),
    })


def format_passage(text: str, matches: list, start_off: int, end_off: int,
                   pre: str = "<b>", post: str = "</b>",
                   ellipsis: str = "... ") -> str:
    """Tagged snippet assembly — the DefaultPassageFormatter role
    (highlighter/uhighlight/DefaultPassageFormatter.java:32): slice the
    stored text to the passage's [start_off, end_off) window and wrap
    every match's character range in pre/post tags; a passage that
    starts mid-document is prefixed with the ellipsis. ``matches`` are
    (start_off, end_off) pairs in ANY order (matches_api / top_passages
    rows); overlapping ranges merge like the reference's formatter."""
    spans = sorted((max(s, start_off), min(e, end_off + 1))
                   for s, e in matches
                   if s < end_off + 1 and e > start_off)
    merged: list = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    out = [ellipsis] if start_off > 0 else []
    cur = start_off
    for s, e in merged:
        out.append(text[cur:s])
        out.append(pre)
        out.append(text[s:e])
        out.append(post)
        cur = e
    out.append(text[cur:end_off + 1])
    return "".join(out)
