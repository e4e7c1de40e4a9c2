"""Percolation — the Monitor / MemoryIndex role
(lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java,
index/memory/MemoryIndex.java): N REGISTERED queries, a STREAM of
documents; emit (doc, query) for every registered query a document
matches (alerting / routing / saved-search).

Ray-Data translation: an actor-pool ``map_batches`` stage. Queries parse
once per actor (``__init__``); each batch inverts IN MEMORY through the
same vectorized tokenize+invert+encode pipeline the segment builder uses,
wraps as a ``SegmentReader``-compatible view, and every registered query
evaluates against that mini-segment with the standard ``eval_query`` —
the full query surface (booleans, phrases, multiterm, fields) works
against streamed docs with zero files."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.search.segreader import SegmentReader


class BatchMemoryReader(SegmentReader):
    """A SegmentReader over one in-memory batch (the MemoryIndex)."""

    def __init__(self, texts, analyzer: Analyzer, with_positions: bool = True) -> None:  # noqa: super-init-not-called
        from lucene_ray.analysis.batch import tokenize_column
        from lucene_ray.codec.postings import encode_postings_many
        from lucene_ray.util.smallfloat import int_to_byte4_array

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        flat, doc_idx, positions = tokenize_column(texts, analyzer)
        doc_len = np.bincount(doc_idx, minlength=n).astype(np.int64)
        norms = int_to_byte4_array(doc_len)

        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary
        sort_idx = pc.array_sort_indices(vocab)
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[sort_idx.to_numpy(zero_copy_only=False)] = np.arange(len(vocab))
        sorted_vocab = vocab.take(sort_idx)
        codes = rank[codes]
        key = codes * max(n, 1) + doc_idx[: codes.shape[0]]
        ukey, freqs = np.unique(key, return_counts=True)
        p_codes = ukey // max(n, 1)
        p_docs = (ukey % max(n, 1)).astype(np.int64)
        p_norms = norms[ukey % max(n, 1)]
        term_starts = np.searchsorted(p_codes, np.arange(len(vocab) + 1))
        buf, offsets, lengths = encode_postings_many(
            p_docs, freqs.astype(np.uint32), p_norms, term_starts
        )

        self.path = "<memory>"
        self.meta = {"owns_docs": True}
        self.doc_base = 0
        self.doc_count = n
        from lucene_ray.search.segreader import TermDict

        self.terms = TermDict(sorted_vocab)
        self.df = np.diff(term_starts)
        self.ttf = np.add.reduceat(
            freqs.astype(np.int64), term_starts[:-1]
        ) if len(self.terms) else np.empty(0, np.int64)
        self.offsets = offsets
        self.lengths = lengths
        self.postings = buf
        self._norms = norms
        self._doc_ids = np.arange(n, dtype=np.int64)
        self._field_cols = {"doc_len": doc_len}
        self._pos_tbl = None
        if with_positions and len(flat):
            self._pos_tbl = pa.table(
                {
                    "term": flat,
                    "doc_id": doc_idx.astype(np.int64),
                    "pos": positions.astype(np.int32),
                }
            )

    def positions_table(self, terms: list[str]) -> pa.Table:
        if self._pos_tbl is None:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int32())})
        return self._pos_tbl.filter(pc.is_in(self._pos_tbl["term"],
                                             value_set=pa.array(terms)))

    def positions_for_docs(self, doc_ids):
        if self._pos_tbl is None:
            return self.positions_table([])
        return self._pos_tbl.filter(
            pc.is_in(self._pos_tbl["doc_id"], value_set=pa.array(doc_ids))
        )


class QueryMonitor:
    """Actor-pool callable: registered queries vs streamed doc batches."""

    def __init__(self, query_texts: list[str],
                 analyzer: Analyzer = StandardAnalyzer,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        from lucene_ray.search.parser import parse_query
        from lucene_ray.search.query import resolve_fields

        self.analyzer = analyzer
        self.text_col = text_col
        self.id_col = id_col
        self.queries = [
            resolve_fields(parse_query(q, analyzer)) for q in query_texts
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_ray.search.query import collect_scored_terms
        from lucene_ray.search.scoring import EvalContext, eval_query

        reader = BatchMemoryReader(batch[self.text_col], self.analyzer)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # batch-local stats (scores are irrelevant for matching; df>0
        # membership is what drives the scorers)
        stats = dict(zip(reader.terms, zip(reader.df.astype(int), reader.ttf.astype(int))))
        sum_ttf = int(reader._field_cols["doc_len"].sum())
        out_doc, out_query = [], []
        for qi, q in enumerate(self.queries):
            terms: set[str] = set()
            collect_scored_terms(q, terms)
            ctx = EvalContext(
                {t: stats.get(t, (0, 0)) for t in terms},
                max(reader.doc_count, 1), max(sum_ttf, 1),
            )
            d, _s, _e = eval_query(reader, q, ctx)
            out_doc.append(ids[d])
            out_query.append(np.full(d.shape[0], qi, dtype=np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(out_doc) if out_doc else np.empty(0, np.int64),
                "query_id": np.concatenate(out_query) if out_query else np.empty(0, np.int64),
            }
        )


def monitor_matches(docs_ds, query_texts: list[str],
                    analyzer: Analyzer = StandardAnalyzer,
                    text_col: str = "text", id_col: str = "doc_id",
                    concurrency: int = 4, batch_size: int = 4096):
    """(doc_id, query_id) matches of every registered query over a doc
    stream — the percolator as an actor-pool map_batches stage."""
    import functools

    return docs_ds.map_batches(
        functools.partial(
            _monitor_call, query_texts=tuple(query_texts), analyzer=analyzer,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


_MONITORS: dict = {}
_MONITORS_MAX = 8  # bound the per-worker cache: distinct registered-query
# sets would otherwise accumulate parsed monitors for the process lifetime


def _monitor_call(batch, query_texts, analyzer, text_col, id_col):
    # per-process monitor cache: queries parse once per worker, not per
    # batch. Keyed on the analyzer's VALUE (frozen dataclass) — id() could
    # collide after GC address reuse and match the wrong analysis chain.
    # Small LRU (move-to-end on hit, evict oldest past the cap).
    key = (query_texts, analyzer, text_col, id_col)
    m = _MONITORS.pop(key, None)
    if m is None:
        m = QueryMonitor(list(query_texts), analyzer, text_col, id_col)
    _MONITORS[key] = m  # re-insert == most recent (dicts keep order)
    while len(_MONITORS) > _MONITORS_MAX:
        _MONITORS.pop(next(iter(_MONITORS)))
    return m(batch)
