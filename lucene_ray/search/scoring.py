"""Per-segment query evaluation — vectorized block-max scoring.

This is the engine's Scorer/BulkScorer layer. Strategy per query shape
(BooleanScorerSupplier's choice, search/BooleanScorerSupplier.java):

* single term            -> block-max posting scan (ImpactsDISI semantics,
                            search/ImpactsDISI.java + MaxScoreCache.java:74-140):
                            upper bounds for ALL blocks computed in one
                            vectorized call from the skip table's
                            (max_freq, min_norm) impacts; blocks whose bound
                            is below the current minCompetitiveScore are
                            never decoded.
* pure disjunction       -> block-max MaxScore (search/MaxScoreBulkScorer.java:26):
                            terms split into essential / non-essential by
                            their max score vs the threshold; essential
                            lists are decoded (block-pruned), non-essential
                            scores are probed only at candidate docs by
                            skip-table-targeted block decode (the WAND-style
                            advanceShallow).
* conjunction            -> leapfrog replaced by sorted-array intersection
                            starting from the rarest term
                            (ConjunctionDISI semantics, search/ConjunctionDISI.java:37,166).
* MUST_NOT               -> sorted anti-join (ReqExclScorer, search/ReqExclScorer.java:26).
* phrase                 -> positional intersection over the positions
                            columns (ExactPhraseMatcher, search/ExactPhraseMatcher.java:37,141).

Pruning never changes results: bounds are conservative (>= any true score
in the block), verified by tests that compare pruned vs exhaustive runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.search import query as Q
from lucene_ray.search.segreader import SegmentReader
from lucene_ray.search.similarity import make_scorer

_DOC_SHIFT = np.int64(1) << np.int64(32)


class EvalContext:
    """Per-query state shared across segments: global-stats scorers and the
    running score threshold (minCompetitiveScore feedback,
    search/TopScoreDocCollector.java:106-164)."""

    __slots__ = ("term_stats", "doc_count", "sum_ttf", "field_ttf", "mode",
                 "k1", "b", "_scorers", "threshold")

    def __init__(self, term_stats, doc_count, sum_ttf, mode="f32", k1=1.2, b=0.75,
                 field_ttf=None):
        self.term_stats = term_stats  # storage key -> (df, ttf), GLOBAL stats
        self.doc_count = doc_count
        self.sum_ttf = sum_ttf  # default field
        self.field_ttf = field_ttf or {}  # field name -> sum_ttf (avgdl per field)
        self.mode = mode
        self.k1 = k1
        self.b = b
        self._scorers = {}
        self.threshold = -np.inf

    def field_sum_ttf(self, field: str | None) -> int:
        if field is None:
            return self.sum_ttf
        return self.field_ttf.get(field, self.sum_ttf)

    def _sum_ttf_for(self, key: str) -> int:
        """Field-local sum_ttf for a storage key (per-field avgdl)."""
        from lucene_ray.index.fields import split_key

        return self.field_sum_ttf(split_key(key)[0])

    def scorer(self, term: str, boost: float = 1.0):
        key = (term, boost)
        s = self._scorers.get(key)
        if s is None:
            df, ttf = self.term_stats.get(term, (0, 0))
            if df == 0:
                return None
            s = make_scorer(df, self.doc_count, self._sum_ttf_for(term),
                            mode=self.mode, k1=self.k1, b=self.b, boost=boost,
                            ttf=ttf)
            self._scorers[key] = s
        return s

    def phrase_scorer(self, terms, boost: float = 1.0):
        """BM25 for phrases: idf = sum over terms' f32 idfs accumulated in
        double then cast (BM25Similarity.idfExplain(termStats[])). For the
        SimilarityBase-family modes (lm_*) the per-term scorers are summed
        over the shared phrase freq (MultiSimilarity.MultiSimScorer); for
        classic, idf sums (TFIDFSimilarity.idfExplain(termStats[]))."""
        dfs = [self.term_stats.get(t, (0, 0))[0] for t in terms]
        if any(df == 0 for df in dfs):
            return None
        sttf = self._sum_ttf_for(terms[0])
        from lucene_ray.search.similarity import _parse_mode

        base_mode, _arg = _parse_mode(self.mode)
        if (base_mode in ("lm_dirichlet", "lm_jm", "boolean",
                          "dfr_inl2", "ib_ll", "ib_spl_ttf",
                          "ax_f2exp", "indri_dirichlet")
                or base_mode.startswith(("dfi_", "ax_f", "dfr_"))):
            # every SimilarityBase-family model scores a phrase as the SUM
            # of its per-term scorers over the shared phrase freq
            # (MultiSimilarity.MultiSimScorer) — DFR/IB/Axiomatic included
            from lucene_ray.search.similarity import BooleanSimScorer, SumScorer

            if base_mode == "boolean":
                return BooleanSimScorer(1, self.doc_count, sttf, boost=boost)
            subs = [
                make_scorer(df, self.doc_count, sttf, mode=self.mode,
                            ttf=self.term_stats.get(t, (0, 0))[1])
                for t, df in zip(terms, dfs)
            ]
            s = SumScorer(subs)
            if boost != 1.0:
                for sub in s.subs:
                    sub.boost = float(boost) * sub.boost
            return s
        if base_mode in ("classic", "sweetspot"):
            # TFIDFSimilarity subclasses: phrase idf sums
            # (TFIDFSimilarity.idfExplain(termStats[])); SweetSpot keeps
            # its plateau norm table (misc/SweetSpotSimilarity.java:47)
            s = make_scorer(1, self.doc_count, sttf, mode=self.mode,
                            boost=boost)
            s.idf = float(sum(
                np.log((self.doc_count + 1) / (df + 1.0)) + 1.0 for df in dfs
            ))
            return s
        if self.mode == "f32":
            from lucene_ray.search.similarity import BM25Scorer, idf_f32

            s = BM25Scorer(1, self.doc_count, sttf, k1=self.k1, b=self.b)
            idf_sum = np.float32(sum(float(idf_f32(df, self.doc_count)) for df in dfs))
            s.idf = idf_sum
            s.weight = np.float32(boost) * idf_sum
            return s
        from lucene_ray.search.similarity import BM25ScorerF64

        s = BM25ScorerF64(1, self.doc_count, sttf, k1=self.k1, b=self.b, boost=boost)
        s.idf = float(
            sum(np.log(1.0 + (self.doc_count - df + 0.5) / (df + 0.5)) for df in dfs)
        )
        return s


# ---------------------------------------------------------------------------
# term-level primitives
# ---------------------------------------------------------------------------

def decode_term(reader: SegmentReader, idx: int, scorer, threshold: float):
    """(local_docs, scores, pruned) decoding only competitive blocks."""
    r = reader.postings_reader(idx)
    if np.isfinite(threshold) and threshold > 0:
        ubs = scorer.max_score(r.max_freq, r.min_norm)
        keep = np.nonzero(ubs >= threshold)[0]
        pruned = keep.size < r.n_blocks
    else:
        keep = np.arange(r.n_blocks)
        pruned = False
    docs, freqs, norms = r.decode_blocks(keep)
    return docs, scorer.score(freqs, norms), pruned


def probe_postings(reader: SegmentReader, idx: int, local_doc: int):
    """(found, freq, norm_byte) of one doc in one posting list — decodes
    only the single block that can contain it (explain() support)."""
    r = reader.postings_reader(idx)
    b = int(np.searchsorted(r.last_doc, local_doc))
    if b >= r.n_blocks:
        return False, 0, 0
    docs, freqs, norms = r.decode_blocks(np.array([b]))
    pos = int(np.searchsorted(docs, local_doc))
    if pos < docs.shape[0] and docs[pos] == local_doc:
        return True, int(freqs[pos]), int(norms[pos])
    return False, 0, 0


def docs_only(reader: SegmentReader, idx: int) -> np.ndarray:
    docs, _f, _n = reader.postings_reader(idx).decode_all()
    return docs


def scores_at(reader: SegmentReader, idx: int, scorer, targets: np.ndarray):
    """Probe a posting list at sorted target docs (advance via skip table).

    Returns (mask, scores) aligned with ``targets``; decodes only the blocks
    that can contain a target (np.searchsorted over the skip table's
    last_doc — the vectorized advanceShallow)."""
    if targets.shape[0] == 0:
        return np.zeros(0, dtype=bool), np.zeros(0, dtype=np.float64)
    r = reader.postings_reader(idx)
    blocks = np.unique(np.searchsorted(r.last_doc, targets))
    blocks = blocks[blocks < r.n_blocks]
    docs, freqs, norms = r.decode_blocks(blocks)
    if docs.shape[0] == 0:
        return np.zeros(targets.shape[0], dtype=bool), np.zeros(
            targets.shape[0], dtype=np.float64
        )
    pos = np.searchsorted(docs, targets)
    pos_c = np.minimum(pos, docs.shape[0] - 1)
    mask = docs[pos_c] == targets
    scores = np.zeros(targets.shape[0], dtype=np.float64)
    if scorer is not None and mask.any():
        all_scores = scorer.score(freqs, norms)
        scores[mask] = all_scores[pos_c[mask]].astype(np.float64)
    return mask, scores


# ---------------------------------------------------------------------------
# boolean shapes
# ---------------------------------------------------------------------------

def _union_maxscore(reader, term_boosts, ctx, count_matches=False):
    """Disjunction over plain terms with MaxScore essential/non-essential
    partitioning. Returns (docs, scores, counts|None, exact)."""
    entries = []  # (idx, scorer, max_score)
    for term, boost in term_boosts:
        idx = reader.term_index(term)
        if idx < 0:
            continue
        scorer = ctx.scorer(term, boost)
        if scorer is None:
            continue
        r = reader.postings_reader(idx)
        ubs = scorer.max_score(r.max_freq, r.min_norm)
        entries.append((idx, scorer, float(ubs.max()) if ubs.size else 0.0))
    if not entries:
        z = np.empty(0, np.int64)
        return z, np.empty(0, np.float64), (np.empty(0, np.int64) if count_matches else None), True

    thr = ctx.threshold
    entries.sort(key=lambda e: -e[2])
    total = sum(e[2] for e in entries)
    # non-essential = maximal suffix whose max-score sum stays below thr
    # (MaxScoreBulkScorer essential/non-essential split)
    n_ess = len(entries)
    if np.isfinite(thr) and thr > 0 and not count_matches:
        suffix = 0.0
        while n_ess > 1 and suffix + entries[n_ess - 1][2] < thr:
            suffix += entries[n_ess - 1][2]
            n_ess -= 1
    essential, non_essential = entries[:n_ess], entries[n_ess:]

    docs_parts, score_parts = [], []
    pruned_any = False
    for idx, scorer, ms in essential:
        # a block can be skipped when even combined with every other term's
        # max score it cannot reach the threshold
        others = total - ms
        block_thr = thr - others if (np.isfinite(thr) and not count_matches) else -np.inf
        d, s, pruned = decode_term(reader, idx, scorer, block_thr)
        pruned_any |= pruned
        docs_parts.append(d)
        score_parts.append(s.astype(np.float64))
    cat_docs = np.concatenate(docs_parts)
    cat_scores = np.concatenate(score_parts)
    docs, inv, counts = np.unique(cat_docs, return_inverse=True, return_counts=True)
    scores = np.zeros(docs.shape[0], dtype=np.float64)
    np.add.at(scores, inv, cat_scores)
    if count_matches:
        counts = counts.astype(np.int64)
    for idx, scorer, _ms in non_essential:
        mask, s = scores_at(reader, idx, scorer, docs)
        scores += s.astype(np.float64)
        if count_matches:
            counts += mask.astype(np.int64)
    # A non-empty non-essential set is itself pruning: docs matching ONLY
    # non-essential terms never enter `docs`, so the hit count is a lower
    # bound (relation GTE), exactly like block-skip pruning.
    exact = not pruned_any and not non_essential
    return docs, scores, (counts if count_matches else None), exact


_EXPR_CACHE: dict = {}


def _compiled_expr(source: str, variables: tuple):
    """Per-process Expression compile cache (JavascriptCompiler compiles
    once; expressions are tiny, the cache is unbounded by design)."""
    key = (source, variables)
    e = _EXPR_CACHE.get(key)
    if e is None:
        from lucene_ray.search.expressions import Expression

        e = _EXPR_CACHE[key] = Expression(source, list(variables))
    return e


def _dv_values(reader, q):
    """Row-aligned DV column for a dv_range/dv_set query (numeric ndarray
    or pa.StringArray, update generations overlaid), or None when the DV
    field was never indexed (missing feat_/sdv_ column)."""
    try:
        if isinstance(q, (Q.DocValuesRangeQuery, Q.DocValuesMultiRangeQuery)):
            return reader.feature(q.feature)
        return reader.string_values(q.name)
    except (KeyError, pa.lib.ArrowInvalid):
        return None


def _merged_ranges(ranges):
    """Sort + merge overlapping [lo, hi] clauses into disjoint intervals
    (SortedNumericDocValuesMultiRangeQuery.java:49 does the same before
    matching); returns (lowers, uppers) as float64 arrays. None bounds =
    open ends. Empty/inverted clauses drop."""
    iv = []
    for lo, hi in ranges:
        lo = -np.inf if lo is None else float(lo)
        hi = np.inf if hi is None else float(hi)
        if lo <= hi:
            iv.append((lo, hi))
    if not iv:
        return np.empty(0), np.empty(0)
    iv.sort()
    out = [list(iv[0])]
    for lo, hi in iv[1:]:
        if lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    a = np.asarray(out, dtype=np.float64)
    return a[:, 0], a[:, 1]


def _multi_range_hits(vals: np.ndarray, lowers, uppers) -> np.ndarray:
    """Vectorized membership in disjoint sorted intervals: one
    searchsorted to the candidate interval, one upper-bound compare."""
    if lowers.shape[0] == 0:
        return np.zeros(vals.shape[0], dtype=bool)
    pos = np.searchsorted(lowers, vals, side="right") - 1
    pos_c = np.maximum(pos, 0)
    return (pos >= 0) & (vals <= uppers[pos_c])


def _dv_mask(q, vals) -> np.ndarray:
    """Boolean match mask over a full DV column (nulls never match)."""
    if isinstance(q, Q.DocValuesMultiRangeQuery):
        return _multi_range_hits(vals, *_merged_ranges(q.ranges))
    if isinstance(q, Q.DocValuesRangeQuery):
        m = np.ones(vals.shape[0], dtype=bool)
        if q.lower is not None:
            m &= vals >= q.lower
        if q.upper is not None:
            m &= vals <= q.upper
        return m
    import pyarrow.compute as pc

    hit = pc.is_in(vals, value_set=pa.array(list(q.values), type=pa.string()))
    return pc.fill_null(hit, False).to_numpy(zero_copy_only=False)


def _dv_mask_at(reader, q, docs: np.ndarray) -> np.ndarray:
    """Verify a dv_range/dv_set predicate at lead-candidate LOCAL docs —
    the IndexOrDocValuesQuery 'dv plan at small lead cost' side
    (IndexOrDocValuesQuery.java:68): no full-column mask materialization,
    no intersect1d; one searchsorted into the segment's doc_id column,
    then a vectorized predicate on just the candidates."""
    vals = _dv_values(reader, q)
    if vals is None:
        return np.zeros(docs.shape[0], dtype=bool)
    all_ids = reader.doc_ids
    if all_ids.shape[0] == 0 or docs.shape[0] == 0:
        return np.zeros(docs.shape[0], dtype=bool)
    gids = docs + reader.doc_base
    pos = np.searchsorted(all_ids, gids)
    pos_c = np.minimum(pos, all_ids.shape[0] - 1)
    present = all_ids[pos_c] == gids
    if isinstance(q, Q.DocValuesMultiRangeQuery):
        return present & _multi_range_hits(
            vals[pos_c], *_merged_ranges(q.ranges))
    if isinstance(q, Q.DocValuesRangeQuery):
        v = vals[pos_c]
        m = present.copy()
        if q.lower is not None:
            m &= v >= q.lower
        if q.upper is not None:
            m &= v <= q.upper
        return m
    import pyarrow.compute as pc

    sub = vals.take(pa.array(pos_c))
    hit = pc.is_in(sub, value_set=pa.array(list(q.values), type=pa.string()))
    return pc.fill_null(hit, False).to_numpy(zero_copy_only=False) & present


def eval_query(reader: SegmentReader, q: Q.Query, ctx: EvalContext):
    """Evaluate a query on one segment -> (local_docs sorted, scores f64, exact).

    ``exact`` is False when block-max pruning may have dropped non-competitive
    matching docs (then the doc list is top-k-complete but not hit-complete).
    """
    if isinstance(q, Q.TermQuery):
        docs, scores, c, exact = _union_maxscore(reader, [(q.term, q.boost)], ctx)
        return docs, scores, exact

    if isinstance(q, Q.SynonymQuery):
        return _eval_synonym(reader, q, ctx)

    if isinstance(q, Q.BlendedTermQuery):
        return _eval_blended(reader, q, ctx)

    if isinstance(q, Q.BoostQuery):
        d, s, e = eval_query(reader, _push_boost(q.query, q.boost), ctx)
        return d, s, e

    if isinstance(q, Q.ConstantScoreQuery):
        sub_ctx = _unpruned(ctx)
        d, _s, _e = eval_query(reader, q.query, sub_ctx)
        return d, np.full(d.shape[0], float(q.boost), dtype=np.float64), True

    if isinstance(q, Q.MatchNoDocsQuery):
        return np.empty(0, np.int64), np.empty(0, np.float64), True

    if isinstance(q, Q.MatchAllDocsQuery):
        # term-sharded merged segments share one doc space; only the shard
        # flagged owns_docs emits it (otherwise every shard would repeat
        # every doc)
        if not reader.meta.get("owns_docs", True):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        d = (reader.doc_ids - reader.doc_base).astype(np.int64)
        return d, np.full(d.shape[0], float(q.boost), dtype=np.float64), True

    if isinstance(q, Q.FieldExistsQuery):
        # FieldExistsQuery.java:63 — same owns_docs guard as match-all;
        # existence = norm byte > 0 (>= 1 analyzed token). Unknown field
        # (no norm_<f> column) matches nothing, like an unindexed field.
        if not reader.meta.get("owns_docs", True):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        try:
            norms = reader.norms_for(q.field)
        except (KeyError, pa.lib.ArrowInvalid):
            # missing norm_<f> column = field never indexed -> no matches;
            # real I/O errors still propagate
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        d = (reader.doc_ids - reader.doc_base).astype(np.int64)
        d = d[norms > 0]
        return d, np.full(d.shape[0], float(q.boost), dtype=np.float64), True

    if isinstance(q, (Q.DocValuesRangeQuery, Q.DocValuesSetQuery,
                      Q.DocValuesMultiRangeQuery)):
        # "slow" doc-values queries (SortedNumericDocValuesField.java:108
        # newSlowRangeQuery / SortedDocValuesField.java:126 newSlowSetQuery):
        # full DV-column scan, constant score. Same owns_docs guard as
        # match-all (term-sharded merges share one doc space).
        if not reader.meta.get("owns_docs", True):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        vals = _dv_values(reader, q)
        if vals is None:  # DV field never indexed -> no matches
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        mask = _dv_mask(q, vals)
        d = (reader.doc_ids - reader.doc_base).astype(np.int64)[mask]
        return d, np.full(d.shape[0], float(q.boost), dtype=np.float64), True

    if isinstance(q, Q.FunctionRangeQuery):
        # FunctionRangeQuery.java:44 / ValueSourceScorer.java:39 — the
        # score IS the function value; expression compiled once per
        # process (stateful-stage rule), evaluated vectorized over the
        # segment's feature columns.
        if not reader.meta.get("owns_docs", True):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        arrays = {}
        try:
            for f in q.features:
                arrays[f] = reader.feature(f)
        except (KeyError, pa.lib.ArrowInvalid):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        vals = _compiled_expr(q.expression, q.features).evaluate(**arrays)
        m = np.ones(vals.shape[0], dtype=bool)
        if q.lower is not None:
            m &= vals >= q.lower
        if q.upper is not None:
            m &= vals <= q.upper
        d = (reader.doc_ids - reader.doc_base).astype(np.int64)[m]
        return d, vals[m] * float(q.boost), True

    if isinstance(q, Q.RangeFieldQuery):
        # range-FIELD relations (RangeFieldQuery.java:73): one vectorized
        # comparison over the doc's [min, max] feature columns
        if not reader.meta.get("owns_docs", True):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        try:
            dmin = reader.feature(q.min_feature)
            dmax = reader.feature(q.max_feature)
        except (KeyError, pa.lib.ArrowInvalid):
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        inter = (dmax >= q.lower) & (dmin <= q.upper)
        within = (dmin >= q.lower) & (dmax <= q.upper)
        if q.relation == "intersects":
            m = inter
        elif q.relation == "within":
            m = within
        elif q.relation == "contains":
            m = (dmin <= q.lower) & (dmax >= q.upper)
        elif q.relation == "crosses":
            m = inter & ~within  # RangeFieldQuery.java:260
        else:
            raise ValueError(f"unknown range relation {q.relation!r}")
        d = (reader.doc_ids - reader.doc_base).astype(np.int64)[m]
        return d, np.full(d.shape[0], float(q.boost), dtype=np.float64), True

    if isinstance(q, Q.SpanPayloadCheckQuery):
        docs, _counts = payload_check_freqs(reader, list(q.terms),
                                            list(q.payloads))
        return (docs, np.full(docs.shape[0], float(q.boost), np.float64),
                True)

    if isinstance(q, Q.ScoringRewriteQuery):
        # must dissolve in Searcher._prep (the rewrite needs the
        # TOP-LEVEL dictionary + global stats); reaching evaluation
        # means a caller skipped the rewrite step
        raise ValueError(
            "ScoringRewriteQuery must be rewritten by Searcher._prep "
            "before evaluation (Query.rewrite happens against the "
            "top-level reader, search/ScoringRewrite.java:39)")

    if isinstance(q, Q.IndexOrDocValuesQuery):
        # standalone the full doc set is needed, so the index plan wins
        # (IndexOrDocValuesQuery.java:68 — ScorerSupplier.get(leadCost) with
        # leadCost = maxDoc); the DV plan fires in _eval_bool's filter loop
        # where lead candidates already exist.
        return eval_query(reader, q.index_query, ctx)

    if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery,
                      Q.FuzzyQuery, Q.TermRangeQuery, Q.TermInSetQuery)):
        # dictionary-scan rewrites are the queries the reference's
        # UsageTrackingQueryCachingPolicy always considers caching; the
        # doc set is constant-score and ctx-free, so it memoizes cleanly
        from lucene_ray.search.querycache import get_query_cache

        cache = get_query_cache()
        if cache is None:
            return _eval_multiterm(reader, q, ctx)
        docs = cache.docs(reader, q,
                          lambda: _eval_multiterm(reader, q, ctx)[0])
        return docs, np.full(docs.shape[0], float(q.boost), np.float64), True

    if isinstance(q, Q.PhraseQuery):
        return _eval_phrase(reader, q, ctx)

    if isinstance(q, Q.SpanNearQuery):
        return _eval_span_near(reader, q, ctx)
    if isinstance(q, Q.IntervalQuery):
        if q.score_mode == "saturation":
            from lucene_ray.search.intervals import scored_docs

            docs, scores = scored_docs(reader, q.source, q.boost, q.pivot)
            return docs, scores, True
        from lucene_ray.search.intervals import matching_docs

        docs, _counts = matching_docs(reader, q.source)
        return (
            docs,
            np.full(docs.shape[0], q.boost, dtype=np.float64),
            True,
        )

    if isinstance(q, Q.FeatureQuery):
        return _eval_feature(reader, q)

    if isinstance(q, Q.DistanceFeatureQuery):
        return _eval_distance_feature(reader, q)

    if isinstance(q, Q.PayloadScoreQuery):
        return _eval_payload_score(reader, q, ctx)

    if isinstance(q, Q.BooleanQuery):
        return _eval_bool(reader, q, ctx)

    if isinstance(q, Q.CombinedFieldQuery):
        return _eval_combined_field(reader, q, ctx)

    if isinstance(q, Q.DisjunctionMaxQuery):
        return _eval_dismax(reader, q, ctx)

    if isinstance(q, Q.CoveringQuery):
        return _eval_covering(reader, q, ctx)

    if isinstance(q, Q.PhraseWildcardQuery):
        return _eval_phrase_wildcard(reader, q, ctx)

    if isinstance(q, Q.MultiPhraseQuery):
        return _eval_multiphrase(reader, q, ctx)

    if isinstance(q, Q.CommonTermsQuery):
        # df-split rewrite (CommonTermsQuery.java:55): low-freq terms drive
        # matching, high-freq terms only add score where they co-occur
        low, high = [], []
        for t in q.terms:
            df, _ttf = ctx.term_stats.get(t, (0, 0))
            (low if df <= q.max_doc_freq else high).append(
                Q.TermQuery(t, boost=q.boost)
            )
        if not low:
            rw = Q.BooleanQuery(should=tuple(high))
        else:
            rw = Q.BooleanQuery(
                must=(Q.BooleanQuery(should=tuple(low)),), should=tuple(high)
            )
        return eval_query(reader, rw, ctx)

    raise ValueError(f"unsupported query {q!r}")


def _eval_multiphrase_freqs(reader, positions) -> tuple:
    """(local docs, phrase freqs): per position the occurrence-key set is
    the UNION over that position's alternatives (deduped), intersected
    across positions (MultiPhraseQuery.java:236 / ExactPhraseMatcher)."""
    flat = [t for p in positions for t in p]
    tbl = reader.positions_table(flat)
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t_arr = np.asarray(tbl["term"].to_pylist(), dtype=object)
    d_arr = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p_arr = tbl["pos"].to_numpy().astype(np.int64)

    cand = None
    for i, alts in enumerate(positions):
        sel = np.isin(t_arr, list(alts))
        keys = d_arr[sel] * _DOC_SHIFT + (p_arr[sel] - i)
        keys = np.unique(keys[p_arr[sel] >= i])
        cand = keys if cand is None else np.intersect1d(cand, keys, assume_unique=True)
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
    docs, freqs = np.unique(cand >> np.int64(32), return_counts=True)
    return docs, freqs.astype(np.int64)


def _eval_multiphrase(reader, q: Q.MultiPhraseQuery, ctx):
    """Exact multi-phrase: occurrence keys per position are the UNION over
    that position's alternatives, deduped, then intersected across
    positions (MultiPhraseQuery.java:236 / ExactPhraseMatcher semantics).
    Scored as a phrase with idf summed over every involved term."""
    flat = [t for p in q.positions for t in p]
    docs, freqs = _eval_multiphrase_freqs(reader, q.positions)
    if docs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    # idf over the terms that exist (absent alternatives contribute nothing)
    present = [t for t in flat if ctx.term_stats.get(t, (0, 0))[0] > 0]
    scorer = ctx.phrase_scorer(present, q.boost) if present else None
    if scorer is None:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    from lucene_ray.index.fields import split_key

    rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
    norms = reader.norms_for(split_key(flat[0])[0])[rows]
    return docs, scorer.score(freqs, norms).astype(np.float64), True


from lucene_ray.search.query import is_wildcard_slot  # noqa: E402


def expand_wildcard_slots(reader, slots, max_expansions: int):
    """Per-segment expansion of PhraseWildcardQuery slots
    (PhraseWildcardQuery.java:63 segment-based expansion): each wildcard
    slot (trailing-``*`` prefix fast path; mid-word ``*``/``?`` via ONE
    RE2 dictionary scan) becomes the tuple of matching dictionary terms,
    CAPPED at ``max_expansions`` (the reference caps, it does not fail).
    Past the cap the surviving expansion set — and hence the match set,
    not just scores — depends on this segment's dictionary order, i.e.
    on segment layout; that mirrors the reference's per-segment
    expansion and is documented on the query class. Returns the
    positions tuple, or None when a wildcard slot matches nothing in
    this segment (the phrase cannot match here)."""
    import re as _re

    from lucene_ray.index.fields import field_prefix, split_key

    positions = []
    for s in slots:
        if is_wildcard_slot(s):
            f, t = split_key(s)
            if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
                idxs = reader.terms_matching_prefix(s[:-1])
            else:
                pat = "^" + _wildcard_to_regex(t) + "$"
                if f is not None:
                    pat = ("^" + _re.escape(field_prefix(f))
                           + _wildcard_to_regex(t) + "$")
                idxs = reader.terms_matching_regex(pat)
                if f is None:
                    # keep a default-field scan out of \x01 field sections
                    idxs = idxs[idxs >= reader.default_start]
            if idxs.shape[0] == 0:
                return None
            if idxs.shape[0] > max_expansions:
                idxs = idxs[:max_expansions]
            positions.append(tuple(reader.terms[int(i)] for i in idxs))
        else:
            positions.append((s,))
    return tuple(positions)


def _eval_phrase_wildcard(reader, q: "Q.PhraseWildcardQuery", ctx):
    """PhraseWildcardQuery.java:63 — expand ``*`` slots against THIS
    segment's dictionary, match as an exact multi-phrase, score as a
    phrase with idf summed over the concrete slots only (see the query's
    docstring for the deviation note)."""
    positions = expand_wildcard_slots(reader, q.slots, q.max_expansions)
    if positions is None:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    docs, freqs = _eval_multiphrase_freqs(reader, positions)
    if docs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    concrete = [s for s in q.slots
                if not is_wildcard_slot(s)
                and ctx.term_stats.get(s, (0, 0))[0] > 0]
    scorer = ctx.phrase_scorer(concrete, q.boost) if concrete else None
    if scorer is None:
        return docs, np.full(docs.shape[0], float(q.boost), np.float64), True
    from lucene_ray.index.fields import split_key

    rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
    norms = reader.norms_for(split_key(q.slots[0].rstrip("*") or
                                       q.slots[0])[0])[rows]
    return docs, scorer.score(freqs, norms).astype(np.float64), True


def _eval_combined_field(reader, q: Q.CombinedFieldQuery, ctx):
    """BM25F — fields blended into one pseudo-field
    (sandbox/.../search/CombinedFieldQuery.java:303-420 semantics):
    tf~ = sum_f w_f*tf_f, dl~ = sum_f w_f*len_f (exact lengths; the
    reference sums quantized per-field norms — documented deviation),
    avgdl~ = sum_f w_f*sumTTF_f / N, df~ = max_f df_f, summed over terms
    (a doc matches if any term appears in any listed field). Always
    hit-complete; computed in float64 for both scorer modes."""
    from lucene_ray.index.fields import field_key

    k1, b = ctx.k1, ctx.b
    n = float(ctx.doc_count)
    avgdl = sum(w * ctx.field_sum_ttf(f) for f, w in q.fields) / n

    dl = None  # weighted per-doc combined length, aligned with reader rows
    for f, w in q.fields:
        lf = reader.doc_len_for(f).astype(np.float64)
        dl = w * lf if dl is None else dl + w * lf

    out_docs, out_scores = [], []
    for t in q.terms:
        df = max(
            (ctx.term_stats.get(field_key(f, t), (0, 0))[0] for f, _w in q.fields),
            default=0,
        )
        if df == 0:
            continue
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        docs_parts, freq_parts = [], []
        for f, w in q.fields:
            idx = reader.term_index(field_key(f, t))
            if idx < 0:
                continue
            d, fr, _nm = reader.postings_reader(idx).decode_all()
            docs_parts.append(d)
            freq_parts.append(w * fr.astype(np.float64))
        if not docs_parts:
            continue
        cat_d = np.concatenate(docs_parts)
        cat_f = np.concatenate(freq_parts)
        docs, inv = np.unique(cat_d, return_inverse=True)
        tf = np.zeros(docs.shape[0], dtype=np.float64)
        np.add.at(tf, inv, cat_f)
        rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
        dld = dl[rows]
        out_docs.append(docs)
        out_scores.append(idf * tf / (tf + k1 * (1.0 - b + b * dld / avgdl)))
    if not out_docs:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    cat_d = np.concatenate(out_docs)
    cat_s = np.concatenate(out_scores)
    docs, inv = np.unique(cat_d, return_inverse=True)
    scores = np.zeros(docs.shape[0], dtype=np.float64)
    np.add.at(scores, inv, cat_s)
    return docs, scores * q.boost, True


def _union_aggregate(docs_parts: list, score_parts: list):
    """Shared union-of-disjuncts kernel: concatenate per-sub (docs, scores)
    and aggregate per unique doc — returns (docs, ssum, smax, nmatch).
    One np.unique + add.at/maximum.at pass; used by DisMax, Covering and
    Blended so the duplicate-doc handling lives in exactly one place."""
    cat_d = np.concatenate(docs_parts)
    cat_s = np.concatenate(score_parts)
    docs, inv = np.unique(cat_d, return_inverse=True)
    ssum = np.zeros(docs.shape[0], dtype=np.float64)
    np.add.at(ssum, inv, cat_s)
    smax = np.zeros(docs.shape[0], dtype=np.float64)
    np.maximum.at(smax, inv, cat_s)
    nmatch = np.zeros(docs.shape[0], dtype=np.int64)
    np.add.at(nmatch, inv, 1)
    return docs, ssum, smax, nmatch


def _eval_subqueries_unpruned(reader, queries, ctx):
    """Evaluate each sub-query hit-complete; returns (docs_parts,
    score_parts, exact)."""
    sub_ctx = _unpruned(ctx)
    docs_parts, score_parts = [], []
    exact = True
    for sub in queries:
        d, s, e = eval_query(reader, sub, sub_ctx)
        exact &= e
        if d.shape[0]:
            docs_parts.append(d)
            score_parts.append(s)
    return docs_parts, score_parts, exact


def _eval_dismax(reader, q: Q.DisjunctionMaxQuery, ctx):
    """max(sub) + tie_breaker * (sum - max) over the union of disjunct doc
    sets (DisjunctionMaxQuery.java scoring contract). Subqueries evaluate
    unpruned so every union member's full score contributes."""
    docs_parts, score_parts, exact = _eval_subqueries_unpruned(
        reader, q.queries, ctx)
    if not docs_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64), exact
    docs, ssum, smax, _n = _union_aggregate(docs_parts, score_parts)
    scores = (smax + q.tie_breaker * (ssum - smax)) * q.boost
    return docs, scores, exact


def _eval_covering(reader, q: "Q.CoveringQuery", ctx):
    """CoveringQuery scorer (sandbox/search/CoveringScorer.java:129-135,
    208-216): doc matches when its count of matching sub-queries reaches
    max(1, minMatch(doc)) with minMatch read from a dense feature column
    (or the constant fallback); score = sum of matching sub scores.
    Subqueries evaluate unpruned so every union member contributes."""
    docs_parts, score_parts, exact = _eval_subqueries_unpruned(
        reader, q.queries, ctx)
    if not docs_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64), exact
    docs, ssum, _smax, nmatch = _union_aggregate(docs_parts, score_parts)
    if q.min_match_feature is not None:
        # feature columns are row-aligned with the (sorted) doc_ids column,
        # which need not be contiguous after merges with deletes
        rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
        mm = reader.feature(q.min_match_feature)[rows].astype(np.int64)
    else:
        mm = np.full(docs.shape[0], int(q.min_match), dtype=np.int64)
    mm = np.maximum(mm, 1)  # CoveringScorer.setMinMatch: values < 1 -> 1
    keep = nmatch >= mm
    return docs[keep], (q.boost * ssum[keep]), exact


def _push_boost(q: Q.Query, boost: float) -> Q.Query:
    import dataclasses

    return dataclasses.replace(q, boost=q.boost * boost)


def _unpruned(ctx: EvalContext) -> EvalContext:
    sub = EvalContext(ctx.term_stats, ctx.doc_count, ctx.sum_ttf, ctx.mode,
                      ctx.k1, ctx.b, ctx.field_ttf)
    sub._scorers = ctx._scorers
    return sub


def _eval_synonym(reader, q: Q.SynonymQuery, ctx):
    """Blended stats: df = max, ttf = sum (SynonymQuery.java:52); freq summed
    across the variant terms, then scored once."""
    dfs = [ctx.term_stats.get(t, (0, 0)) for t in q.terms]
    df = max((d for d, _ in dfs), default=0)
    ttf = sum(t for _, t in dfs)
    if df == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    scorer = make_scorer(df, ctx.doc_count, ctx._sum_ttf_for(q.terms[0]),
                         mode=ctx.mode, k1=ctx.k1, b=ctx.b, boost=q.boost)
    del ttf
    docs_parts, freq_parts, norm_parts = [], [], []
    for t in q.terms:
        idx = reader.term_index(t)
        if idx < 0:
            continue
        d, f, n = reader.postings_reader(idx).decode_all()
        docs_parts.append(d)
        freq_parts.append(f.astype(np.int64))
        norm_parts.append(n)
    if not docs_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    cat_d = np.concatenate(docs_parts)
    cat_f = np.concatenate(freq_parts)
    cat_n = np.concatenate(norm_parts)
    docs, inv = np.unique(cat_d, return_inverse=True)
    freqs = np.zeros(docs.shape[0], dtype=np.int64)
    np.add.at(freqs, inv, cat_f)
    norms = np.zeros(docs.shape[0], dtype=np.uint8)
    norms[inv] = cat_n  # same doc -> same norm byte
    return docs, scorer.score(freqs, norms).astype(np.float64), True


def _eval_blended(reader, q: "Q.BlendedTermQuery", ctx):
    """BlendedTermQuery (search/BlendedTermQuery.java:270-300): every term
    scores with the BLENDED stats (df = max of the terms' docFreqs, ttf =
    sum — adjustFrequencies), each over its own postings, then the per-doc
    scores combine as DisjunctionMax(tie_breaker)
    (DISJUNCTION_MAX_REWRITE, BlendedTermQuery.java:190)."""
    stats = [ctx.term_stats.get(t, (0, 0)) for t in q.terms]
    df = max((d for d, _ in stats), default=0)
    ttf = sum(t for _, t in stats)
    if df == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    # boost folds into the leaf weight, matching Lucene's boost
    # propagation through the rewritten DisMax to the term weights
    # (f32 mode stays bit-exact under non-power-of-two boosts)
    scorer = make_scorer(df, ctx.doc_count, ctx._sum_ttf_for(q.terms[0]),
                         mode=ctx.mode, k1=ctx.k1, b=ctx.b, ttf=ttf,
                         boost=q.boost)
    docs_parts, score_parts = [], []
    for t in q.terms:
        idx = reader.term_index(t)
        if idx < 0:
            continue
        d, f, nm = reader.postings_reader(idx).decode_all()
        docs_parts.append(d)
        score_parts.append(
            scorer.score(f.astype(np.int64), nm).astype(np.float64))
    if not docs_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    docs, ssum, smax, _n = _union_aggregate(docs_parts, score_parts)
    scores = smax + q.tie_breaker * (ssum - smax)
    return docs, scores, True


def _eval_feature(reader, q: "Q.FeatureQuery"):
    """Static-feature scorer — document/FeatureField.java:356-438.

    Matches docs with feature value > 0; one vectorized pass over the
    segment's feat_<name> column (lazy, cached per reader like norms)."""
    if not reader.meta.get("owns_docs", True):
        # term-sharded merged segments share one doc space
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    v = reader.feature(q.feature)
    sel = np.nonzero(v > 0)[0]
    x = v[sel]
    if q.function == "saturation":
        s = x / (x + q.pivot)
    elif q.function == "log":
        s = np.log(q.a + x)
    elif q.function == "sigmoid":
        xa = np.power(x, q.a)
        s = xa / (xa + np.power(q.pivot, q.a))
    elif q.function == "linear":
        s = x.astype(np.float64)
    else:
        raise ValueError(f"unknown feature function {q.function!r}")
    docs = (reader.doc_ids[sel] - reader.doc_base).astype(np.int64)
    return docs, q.boost * s.astype(np.float64), True


def _eval_distance_feature(reader, q: "Q.DistanceFeatureQuery"):
    """LongPoint.newDistanceFeatureQuery scorer (LongDistanceFeatureQuery):
    boost * pivot / (pivot + |v - origin|) over a dense feature column.
    Every live doc in the segment matches (the feature columns build_index
    writes are dense — one value per doc)."""
    if not reader.meta.get("owns_docs", True):
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    v = reader.feature(q.feature)
    s = q.boost * (q.pivot / (q.pivot + np.abs(v - q.origin)))
    docs = (reader.doc_ids - reader.doc_base).astype(np.int64)
    return docs, s.astype(np.float64), True


def _eval_payload_score(reader, q: "Q.PayloadScoreQuery", ctx):
    """Payload scorer — queries/payloads/PayloadScoreQuery.java:47.

    One pruned read of the term's positions rows (payload float32 column
    written by the DelimitedPayloadTokenFilter build path), then a
    grouped reduceat per aggregation function. include_span_score
    multiplies the payload aggregate into the term's BM25 score, the
    reference's includeSpanScore=true composition."""
    tbl = reader.positions_table([q.term])
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    if "payload" not in tbl.column_names:
        raise ValueError(
            "index has no payload column — build it with "
            "Analyzer(payload_delimiter=...) and with_positions=True")
    d = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p = tbl["payload"].to_numpy().astype(np.float64)
    order = np.argsort(d, kind="stable")
    d, p = d[order], p[order]
    docs, starts, counts = np.unique(d, return_index=True,
                                     return_counts=True)
    if q.function == "sum":
        agg = np.add.reduceat(p, starts)
    elif q.function == "min":
        agg = np.minimum.reduceat(p, starts)
    elif q.function == "max":
        agg = np.maximum.reduceat(p, starts)
    elif q.function == "avg":
        agg = np.add.reduceat(p, starts) / counts
    else:
        raise ValueError(f"unknown payload function {q.function!r}")
    if q.include_span_score:
        from lucene_ray.index.fields import split_key

        scorer = ctx.scorer(q.term, q.boost)
        if scorer is None:
            return np.empty(0, np.int64), np.empty(0, np.float64), True
        rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
        norms = reader.norms_for(split_key(q.term)[0])[rows]
        s = scorer.score(counts.astype(np.int64), norms) * agg
    else:
        s = q.boost * agg
    return docs, s.astype(np.float64), True


def payload_check_freqs(reader, terms: list, payloads: list):
    """(local docs, span counts) for a payload-checked exact phrase —
    queries/payloads/SpanPayloadCheckQuery.java:54: a span of the
    consecutive ``terms`` is accepted only when the payload at each of
    its positions equals ``payloads``. One pruned positions read, one
    fused-key searchsorted per non-anchor slot — the house span-near
    shape with a payload equality fused in."""
    tbl = reader.positions_table(list(set(terms)))
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if "payload" not in tbl.column_names:
        raise ValueError(
            "index has no payload column — build it with "
            "Analyzer(payload_delimiter=...) and with_positions=True")
    t_arr = np.asarray(tbl["term"].to_pylist(), dtype=object)
    d_all = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p_all = tbl["pos"].to_numpy().astype(np.int64)
    pay_all = tbl["payload"].to_numpy().astype(np.float64)
    per = {}
    for t in set(terms):
        sel = t_arr == t
        d, p, pay = d_all[sel], p_all[sel], pay_all[sel]
        o = np.lexsort((p, d))
        d, p, pay = d[o], p[o], pay[o]
        per[t] = (d, d * _DOC_SHIFT + p, pay)
    d0, k0, pay0 = per[terms[0]]
    ok = pay0 == float(payloads[0])
    for i, t in enumerate(terms[1:], start=1):
        _d, keys, pay = per[t]
        tgt = k0 + np.int64(i)
        pos = np.searchsorted(keys, tgt)
        pos_c = np.minimum(pos, max(keys.shape[0] - 1, 0))
        hit = (keys.shape[0] > 0) & (keys[pos_c] == tgt) \
            & (pay[pos_c] == float(payloads[i]))
        ok &= hit
    if not ok.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs, counts = np.unique(d0[ok], return_counts=True)
    return docs, counts


def _eval_multiterm(reader, q, ctx):
    """Multi-term queries rewrite to a constant-score union of the matching
    dictionary terms (MultiTermQuery CONSTANT_SCORE rewrite,
    search/MultiTermQuery.java:86-119)."""
    idxs = expand_multiterm(reader, q)
    if idxs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    parts = [docs_only(reader, int(i)) for i in idxs]
    docs = np.unique(np.concatenate(parts))
    return docs, np.full(docs.shape[0], float(q.boost), dtype=np.float64), True


def expand_multiterm(reader, q) -> np.ndarray:
    """Dictionary expansion of a multi-term query -> sorted term indexes
    (the term-collection half of MultiTermQuery's rewrite; also the
    Matches API's source of leaf terms, search/MatchesIterator.java)."""
    from lucene_ray.index.fields import field_prefix

    if isinstance(q, Q.PrefixQuery):
        idxs = reader.terms_matching_prefix(q.prefix)
    elif isinstance(q, Q.WildcardQuery):
        pat = "^" + _wildcard_to_regex(q.pattern) + "$"
        if q.field:  # anchor the scan inside the field's dictionary section
            import re as _re

            pat = "^" + _re.escape(field_prefix(q.field)) + _wildcard_to_regex(q.pattern) + "$"
        idxs = reader.terms_matching_regex(pat)
    elif isinstance(q, Q.RegexpQuery):
        pat = "^(?:" + q.pattern + ")$"
        if q.field:
            import re as _re

            pat = "^" + _re.escape(field_prefix(q.field)) + "(?:" + q.pattern + ")$"
        idxs = reader.terms_matching_regex(pat)
    elif isinstance(q, Q.TermRangeQuery):
        idxs = reader.term_range(q.lower, q.upper, q.include_lower, q.include_upper)
    elif isinstance(q, Q.TermInSetQuery):
        idxs = np.array(
            sorted(i for i in (reader.term_index(t) for t in q.terms) if i >= 0),
            dtype=np.int64,
        )
    elif isinstance(q, Q.FuzzyQuery):
        idxs = _fuzzy_expand(reader, q)
    else:  # pragma: no cover
        raise ValueError(q)
    # a default-field scan must not leak into \x01-prefixed field sections
    # (e.g. regex '^.*k$' or an unbounded range would otherwise match keys)
    from lucene_ray.index.fields import FIELD_MARK

    clamp = False
    if isinstance(q, Q.PrefixQuery):
        clamp = not q.prefix.startswith(FIELD_MARK)
    elif isinstance(q, (Q.WildcardQuery, Q.RegexpQuery, Q.FuzzyQuery)):
        clamp = not q.field
    elif isinstance(q, Q.TermRangeQuery):
        clamp = q.lower is None or not q.lower.startswith(FIELD_MARK)
    if clamp:
        idxs = idxs[idxs >= reader.default_start]
    return idxs


def _wildcard_to_regex(pattern: str) -> str:
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def _fuzzy_expand(reader, q: Q.FuzzyQuery) -> np.ndarray:
    """Edit-distance expansion over the dictionary. The reference compiles a
    Levenshtein automaton (util/automaton/LevenshteinAutomata.java); we run a
    banded edit-distance scan over the (prefix-pruned) term table — same
    accepted set, O(dict) instead of O(automaton)."""
    from lucene_ray.index.fields import field_prefix

    sect = field_prefix(q.field) if q.field else ""
    cand = (
        reader.terms_matching_prefix(sect + q.term[: q.prefix_length])
        if q.prefix_length or sect
        else np.arange(len(reader.terms))
    )
    base = q.term
    strip = len(sect)
    maxe = q.max_edits
    keep = []
    lb = len(base)
    # ONE vectorized take materializes the candidate slice (the TermDict
    # is Arrow-backed; per-index scalar access would pay as_py each time)
    cand_terms = reader.terms[cand] if len(cand) else []
    for i, t in zip(cand, cand_terms):
        if strip:
            t = t[strip:]
        if abs(len(t) - lb) > maxe:
            continue
        if _edit_distance_leq(base, t, maxe, q.transpositions):
            keep.append(i)
    return np.asarray(keep, dtype=np.int64)


def _edit_distance(a: str, b: str, k: int) -> int:
    """Plain banded Levenshtein distance, capped at k+1 (spell check —
    DuckDB's levenshtein() has no transpositions, so neither does this)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [k + 1] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        row_min = cur[0] if lo == 1 else k + 1
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = v
            row_min = min(row_min, v)
        if row_min > k:
            return k + 1
        prev = cur
    return min(prev[lb], k + 1)


def _edit_distance_leq(a: str, b: str, k: int, transpositions: bool = True) -> bool:
    """Banded Levenshtein (with transpositions by default, like FuzzyQuery's
    Damerau automaton) — early-exits when the band exceeds k."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        row_min = cur[0] if lo == 1 else k + 1
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transpositions
                and prev2 is not None
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
            row_min = min(row_min, v)
        if j < lb:
            cur[j + 1 :] = [k + 1] * (lb - j)
        if row_min > k:
            return False
        prev2, prev = prev, cur
    return prev[lb] <= k


def _eval_phrase_freqs(reader, terms: list, slop: int = 0):
    """(local docs, phrase freqs) via positional intersection: occurrence
    keys doc<<32 | (pos - i) intersected across terms (ExactPhraseMatcher
    semantics); sloppy matching (slop>0) via within-window check."""
    tbl = reader.positions_table(terms)
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t_arr = np.asarray(tbl["term"].to_pylist(), dtype=object)
    d_arr = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p_arr = tbl["pos"].to_numpy().astype(np.int64)

    if slop == 0:
        cand = None
        for i, t in enumerate(terms):
            sel = t_arr == t
            keys = d_arr[sel] * _DOC_SHIFT + (p_arr[sel] - i)
            keys = keys[p_arr[sel] >= i]
            cand = keys if cand is None else np.intersect1d(cand, keys, assume_unique=True)
            if cand.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, freqs = np.unique(cand >> np.int64(32), return_counts=True)
        return docs, freqs.astype(np.int64)
    return _sloppy_phrase(terms, t_arr, d_arr, p_arr, slop)


def _eval_phrase(reader, q: Q.PhraseQuery, ctx):
    terms = list(q.terms)
    docs, freqs = _eval_phrase_freqs(reader, terms, q.slop)
    if docs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True

    scorer = ctx.phrase_scorer(terms, q.boost)
    if scorer is None:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    from lucene_ray.index.fields import split_key

    rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
    norms = reader.norms_for(split_key(terms[0])[0])[rows]
    return docs, scorer.score(freqs, norms).astype(np.float64), True


def _span_near_unordered(reader, terms: list, slop: int):
    """(local docs, freqs) for unordered span-near: anchor = first term's
    occurrences; every other term must occur within len+slop-1 positions
    in either direction. One fused-key searchsorted per term — vectorized
    across all docs at once."""
    tbl = reader.positions_table(terms)
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t_arr = np.asarray(tbl["term"].to_pylist(), dtype=object)
    d_all = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p_all = tbl["pos"].to_numpy().astype(np.int64)
    per = {}
    for t in set(terms):
        sel = t_arr == t
        d, p = d_all[sel], p_all[sel]
        o = np.lexsort((p, d))
        d, p = d[o], p[o]
        per[t] = (d, p, d * _DOC_SHIFT + p)
    d0, p0, _k0 = per[terms[0]]
    if d0.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    w = len(terms) + slop - 1
    ok = np.ones(p0.shape[0], dtype=bool)
    for t in terms[1:]:
        d, p, keys = per[t]
        if d.shape[0] == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        lo = d0 * _DOC_SHIFT + np.maximum(p0 - w, 0)
        idx = np.searchsorted(keys, lo)
        valid = idx < keys.shape[0]
        idxc = np.minimum(idx, keys.shape[0] - 1)
        ok &= valid & (d[idxc] == d0) & (p[idxc] <= p0 + w)
    docs, freqs = np.unique(d0[ok], return_counts=True)
    return docs.astype(np.int64), freqs.astype(np.int64)


def _eval_span_near(reader, q: Q.SpanNearQuery, ctx):
    """SpanNearQuery: ordered = the sloppy-phrase matcher; unordered =
    either-direction window test (see query.SpanNearQuery). Scored like a
    phrase (idf summed over terms, freq = matching anchors)."""
    terms = list(q.terms)
    if q.in_order:
        docs, freqs = _eval_phrase_freqs(reader, terms, q.slop)
    else:
        docs, freqs = _span_near_unordered(reader, terms, q.slop)
    if docs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    scorer = ctx.phrase_scorer(terms, q.boost)
    if scorer is None:
        return np.empty(0, np.int64), np.empty(0, np.float64), True
    from lucene_ray.index.fields import split_key

    rows = np.searchsorted(reader.doc_ids, docs + reader.doc_base)
    norms = reader.norms_for(split_key(terms[0])[0])[rows]
    return docs, scorer.score(freqs, norms).astype(np.float64), True


def _sloppy_phrase(terms, t_arr, d_arr, p_arr, slop):
    """Sloppy match: docs where all terms occur with span width <= len+slop.

    Conservative ordered-window implementation (SloppyPhraseMatcher's
    semantics for the common case; freq = number of matching start
    positions of the first term). Fully vectorized ACROSS docs: the greedy
    next-occurrence walk runs as one searchsorted per term over fused
    (doc << 32 | pos) keys — no per-doc Python."""
    per_term = []
    for t in terms:
        sel = t_arr == t
        d, p = d_arr[sel].astype(np.int64), p_arr[sel].astype(np.int64)
        o = np.lexsort((p, d))
        per_term.append((d[o], p[o]))
    d0, p0 = per_term[0]
    if d0.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ok = np.ones(p0.shape[0], dtype=bool)
    prev = p0.copy()
    for i, (d, p) in enumerate(per_term[1:], start=1):
        if d.shape[0] == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        keys = d * _DOC_SHIFT + p
        tgt = d0 * _DOC_SHIFT + prev + 1
        idx = np.searchsorted(keys, tgt)
        valid = idx < keys.shape[0]
        idxc = np.minimum(idx, keys.shape[0] - 1)
        same_doc = valid & (d[idxc] == d0)
        cand = p[idxc]
        ok &= same_doc & (cand - p0 <= i + slop)
        prev = np.where(same_doc, cand, prev)
    out_docs, out_freqs = np.unique(d0[ok], return_counts=True)
    return out_docs.astype(np.int64), out_freqs.astype(np.int64)


def _eval_bool(reader, q: Q.BooleanQuery, ctx):
    # pure disjunction of plain terms -> MaxScore path
    if (
        not q.must
        and not q.must_not
        and not q.filter
        and q.should
        and all(isinstance(s, Q.TermQuery) for s in q.should)
    ):
        msm = max(1, q.minimum_should_match)
        need_counts = msm > 1
        docs, scores, counts, exact = _union_maxscore(
            reader,
            [(s.term, s.boost * q.boost) for s in q.should],
            ctx,
            count_matches=need_counts,
        )
        if need_counts:
            keep = counts >= msm
            docs, scores = docs[keep], scores[keep]
        return docs, scores, exact

    sub_ctx = _unpruned(ctx)  # inner general clauses must be hit-complete
    exact = True

    # ---- conjunction: leapfrog term clauses off the rarest term ----
    # (BlockMaxConjunction(Bulk)Scorer semantics,
    # search/BlockMaxConjunctionScorer.java / ConjunctionDISI.java:37,166):
    # the rarest term drives; every other term clause is probed ONLY at the
    # driver's candidate docs via the skip table (scores_at decodes just
    # the blocks that can contain a candidate). With an active top-k
    # threshold and no SHOULD clauses, driver blocks whose block-max bound
    # plus the other scored terms' global max scores cannot reach the
    # threshold are never decoded (result then top-k-complete, exact=False).
    term_must = [m for m in q.must if isinstance(m, Q.TermQuery)]
    term_filter = [f for f in q.filter if isinstance(f, Q.TermQuery)]
    gen_must = [m for m in q.must if not isinstance(m, Q.TermQuery)]
    gen_filter = [f for f in q.filter if not isinstance(f, Q.TermQuery)]

    docs = None
    scores = None
    if term_must or term_filter:
        entries = []  # (term, scorer|None, idx)
        for t in term_must:
            idx = reader.term_index(t.term)
            scorer = ctx.scorer(t.term, t.boost * 1.0)
            if idx < 0 or scorer is None:
                return np.empty(0, np.int64), np.empty(0, np.float64), True
            entries.append((t.term, scorer, idx))
        for t in term_filter:
            idx = reader.term_index(t.term)
            if idx < 0:
                return np.empty(0, np.int64), np.empty(0, np.float64), True
            entries.append((t.term, None, idx))
        # driver = globally rarest clause (fewest postings to decode)
        dfs = [ctx.term_stats.get(t, (0, 0))[0] for t, _s, _i in entries]
        drv = int(np.argmin(dfs))
        d_term, d_scorer, d_idx = entries[drv]
        others = entries[:drv] + entries[drv + 1 :]

        thr = ctx.threshold
        block_thr = -np.inf
        if (
            d_scorer is not None and np.isfinite(thr) and thr > 0
            and not q.should and not gen_must and not gen_filter
            and q.boost > 0
        ):
            # sum of the other scored clauses' global max scores
            others_max = 0.0
            for _t, sc, idx in others:
                if sc is not None:
                    r = reader.postings_reader(idx)
                    ub = sc.max_score(r.max_freq, r.min_norm)
                    others_max += float(ub.max()) if ub.size else 0.0
            # threshold applies to final (q.boost-scaled) scores
            block_thr = thr / q.boost - others_max
        if d_scorer is not None:
            d_docs, d_scores, pruned = decode_term(reader, d_idx, d_scorer, block_thr)
            exact &= not pruned
            docs = d_docs
            scores = d_scores.astype(np.float64)
        else:
            docs = docs_only(reader, d_idx)
            scores = np.zeros(docs.shape[0], dtype=np.float64)
        for _t, sc, idx in others:
            if docs.shape[0] == 0:
                return docs, np.empty(0, np.float64), exact
            mask, s = scores_at(reader, idx, sc, docs)
            docs, scores = docs[mask], scores[mask] + s[mask]

    # general MUST clauses: intersect, scores summed
    for m in gen_must:
        d, s, _ = eval_query(reader, m, sub_ctx)
        if docs is None:
            docs, scores = d, s.astype(np.float64)
        else:
            docs, ia, ib = np.intersect1d(docs, d, assume_unique=True, return_indices=True)
            scores = scores[ia] + s[ib]
        if docs.shape[0] == 0:
            return docs, np.empty(0, np.float64), exact

    # general FILTER clauses: intersect, no score contribution (and the
    # LRUQueryCache's other admission point — filter-role doc sets)
    from lucene_ray.search.querycache import get_query_cache

    _qc = get_query_cache()
    for fq in gen_filter:
        # IndexOrDocValuesQuery / bare DV queries with lead candidates in
        # hand: verify ONLY the candidates through the doc-values column
        # (IndexOrDocValuesQuery.java:68 — the dv plan wins when leadCost
        # is small), instead of scanning the index side for the full set
        dvq = None
        if docs is not None:
            if isinstance(fq, (Q.DocValuesRangeQuery, Q.DocValuesSetQuery,
                               Q.DocValuesMultiRangeQuery)):
                dvq = fq
            elif isinstance(fq, Q.IndexOrDocValuesQuery) and isinstance(
                    fq.dv_query, (Q.DocValuesRangeQuery, Q.DocValuesSetQuery,
                                  Q.DocValuesMultiRangeQuery)):
                dvq = fq.dv_query
        if dvq is not None:
            m = _dv_mask_at(reader, dvq, docs)
            docs, scores = docs[m], scores[m]
            if docs.shape[0] == 0:
                return docs, np.empty(0, np.float64), exact
            continue
        # multi-term filters cache inside their own dispatch above —
        # wrapping them here would double-count usage on the same key
        # CommonTermsQuery's doc set depends on GLOBAL df (the
        # high/low-frequency split moves as the index grows), so its
        # cached set would go stale under an unchanged segment key.
        # DV-backed filters stay out of the cache too: DV UPDATE
        # generations commit without changing the segment key, so a
        # cached doc set would serve pre-update values.
        if _qc is None or isinstance(fq, (
            Q.MatchAllDocsQuery, Q.PrefixQuery, Q.WildcardQuery,
            Q.RegexpQuery, Q.FuzzyQuery, Q.TermRangeQuery,
            Q.TermInSetQuery, Q.CommonTermsQuery,
            Q.DocValuesRangeQuery, Q.DocValuesSetQuery,
            Q.DocValuesMultiRangeQuery, Q.IndexOrDocValuesQuery,
        )):
            d, _s, _ = eval_query(reader, fq, sub_ctx)
        else:
            d = _qc.docs(reader, fq,
                         lambda fq=fq: eval_query(reader, fq, sub_ctx)[0])
        if docs is None:
            docs = d
            scores = np.zeros(d.shape[0], dtype=np.float64)
        else:
            docs, ia, _ib = np.intersect1d(docs, d, assume_unique=True, return_indices=True)
            scores = scores[ia]
        if docs.shape[0] == 0:
            return docs, np.empty(0, np.float64), exact

    # SHOULD
    if q.should:
        if docs is None:
            parts = [eval_query(reader, s, sub_ctx) for s in q.should]
            cat_d = np.concatenate([p[0] for p in parts])
            cat_s = np.concatenate([p[1] for p in parts])
            docs, inv, counts = np.unique(cat_d, return_inverse=True, return_counts=True)
            scores = np.zeros(docs.shape[0], dtype=np.float64)
            np.add.at(scores, inv, cat_s)
            msm = max(1, q.minimum_should_match)
            if msm > 1:
                # counts from unique() double-count a doc matching one clause
                # twice only if a clause yields duplicate docs (it can't:
                # per-clause docs are unique)
                keep = counts >= msm
                docs, scores = docs[keep], scores[keep]
        else:
            match_count = np.zeros(docs.shape[0], dtype=np.int64)
            for s in q.should:
                if isinstance(s, Q.TermQuery):
                    idx = reader.term_index(s.term)
                    scorer = ctx.scorer(s.term, s.boost)
                    if idx < 0 or scorer is None:
                        continue
                    mask, sc = scores_at(reader, idx, scorer, docs)
                else:
                    d, sc_all, _ = eval_query(reader, s, sub_ctx)
                    pos = np.searchsorted(d, docs)
                    pos_c = np.minimum(pos, max(d.shape[0] - 1, 0))
                    mask = (d.shape[0] > 0) & (d[pos_c] == docs) if d.shape[0] else np.zeros(docs.shape[0], bool)
                    sc = np.zeros(docs.shape[0], dtype=np.float64)
                    sc[mask] = sc_all[pos_c[mask]]
                scores = scores + sc.astype(np.float64)
                match_count += mask.astype(np.int64)
            if q.minimum_should_match > 0:
                keep = match_count >= q.minimum_should_match
                docs, scores = docs[keep], scores[keep]

    if docs is None:
        return np.empty(0, np.int64), np.empty(0, np.float64), True

    # MUST_NOT: sorted anti-join
    if q.must_not:
        excl_parts = []
        for mn in q.must_not:
            d, _s, _ = eval_query(reader, mn, sub_ctx)
            excl_parts.append(d)
        if excl_parts:
            excl = np.unique(np.concatenate(excl_parts))
            keep = ~np.isin(docs, excl, assume_unique=True)
            docs, scores = docs[keep], scores[keep]

    # The general path never folds q.boost into sub-clause scorers (the
    # term-only MaxScore path above does), so apply it unconditionally here —
    # including for pure-SHOULD queries of non-TermQuery clauses.
    if q.boost != 1.0:
        scores = scores * q.boost
    return docs, scores, exact


# ---------------------------------------------------------------------------
# TermAutomatonQuery (sandbox/src/java/org/apache/lucene/search/
# TermAutomatonQuery.java:59, TermAutomatonScorer.java): a positional
# automaton over terms — states, term transitions, ANY transitions — that
# accepts a document wherever some path through the automaton matches
# consecutive token positions. Generalizes phrase/multi-phrase to paths of
# DIFFERENT lengths (optional tokens, synonym runs), which MultiPhraseQuery
# cannot express. The reference runs an NFA per document position; the
# columnar re-expression is one dynamic-programming pass over the automaton's
# states in topological order, where each state's reach set is a sorted
# int64 key array (doc << 32 | next_position) and every transition is one
# vectorized intersect/shift — no per-document work.
# ---------------------------------------------------------------------------

def automaton_from_token_stream(tokens):
    """TokenStreamToTermAutomatonQuery.java:38 role: build (n_states,
    transitions, accept) from ``(term, position_increment)`` pairs — a
    posinc of 0 adds a synonym edge in parallel with the previous token,
    a posinc of k > 1 inserts k-1 ANY edges (holes left by stop removal).
    Returns a linear DAG."""
    transitions: list[tuple[int, int, "str | None"]] = []
    state = 0
    last_from = 0
    for term, posinc in tokens:
        if posinc == 0:
            transitions.append((last_from, state, term))  # synonym edge
            continue
        for _ in range(int(posinc) - 1):
            transitions.append((state, state + 1, None))  # hole -> ANY
            state += 1
        transitions.append((state, state + 1, term))
        last_from = state
        state += 1
    return state + 1, tuple(transitions), (state,)


def _eval_term_automaton_freqs(reader, n_states: int, transitions,
                               accept) -> tuple:
    """(local docs, accepted-occurrence freqs) for a term automaton on one
    segment. Freq counts DISTINCT accepted end positions per doc (two
    paths converging on the same end count once), matching the dedup the
    exact-phrase matcher applies to occurrence keys."""
    # topological order (Kahn); token streams are finite so the automata
    # TokenStreamToTermAutomatonQuery emits are always DAGs
    indeg = np.zeros(n_states, np.int64)
    for f, t, _term in transitions:
        indeg[t] += 1
    order, queue = [], [s for s in range(n_states) if indeg[s] == 0]
    out_edges: dict[int, list] = {}
    for f, t, term in transitions:
        out_edges.setdefault(f, []).append((t, term))
    while queue:
        s = queue.pop()
        order.append(s)
        for t, _term in out_edges.get(s, ()):
            indeg[t] -= 1
            if indeg[t] == 0:
                queue.append(t)
    if len(order) != n_states:
        raise ValueError("term automaton must be acyclic")
    if any(term is None for t, term in out_edges.get(0, ())):
        raise NotImplementedError(
            "ANY transition out of the initial state (a leading hole) is "
            "not supported — anchor the automaton on a real term")

    terms = sorted({term for _f, _t, term in transitions if term is not None})
    tbl = reader.positions_table(terms)
    empty = np.empty(0, np.int64)
    if tbl.num_rows == 0:
        return empty, empty
    t_arr = np.asarray(tbl["term"].to_pylist(), dtype=object)
    d_arr = tbl["doc_id"].to_numpy().astype(np.int64) - reader.doc_base
    p_arr = tbl["pos"].to_numpy().astype(np.int64)
    term_keys = {
        term: np.unique(d_arr[t_arr == term] * _DOC_SHIFT
                        + p_arr[t_arr == term])
        for term in terms
    }
    doc_len = None  # lazy: only ANY edges need it

    reach: dict[int, np.ndarray] = {s: empty for s in range(n_states)}
    for s in order:
        for t, term in out_edges.get(s, ()):
            if s == 0:
                contrib = term_keys[term] + 1  # (doc, pos) -> (doc, pos+1)
            elif term is not None:
                src = reach[s]
                contrib = np.intersect1d(
                    src, term_keys[term], assume_unique=True) + 1
            else:  # ANY: consumes whatever token sits at pos
                src = reach[s]
                if src.shape[0] == 0:
                    continue
                if doc_len is None:
                    doc_len = reader.doc_len_for(None)
                docs_of = (src >> np.int64(32)).astype(np.int64)
                pos_of = src & np.int64(0xFFFFFFFF)
                rows = np.searchsorted(reader.doc_ids,
                                       docs_of + reader.doc_base)
                contrib = src[pos_of < doc_len[rows]] + 1
            if contrib.shape[0]:
                reach[t] = (contrib if reach[t].shape[0] == 0
                            else np.union1d(reach[t], contrib))

    acc_parts = [reach[a] for a in accept if reach[a].shape[0]]
    if not acc_parts:
        return empty, empty
    acc = np.unique(np.concatenate(acc_parts))
    docs, freqs = np.unique(acc >> np.int64(32), return_counts=True)
    return docs.astype(np.int64), freqs.astype(np.int64)
