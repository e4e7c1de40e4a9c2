"""IndexSearcher equivalent: query -> per-segment evaluation -> merged top-k.

Mirrors the reference lifecycle (search/IndexSearcher.java:623,831):
term stats are gathered ONCE globally (TermStates.build semantics,
index/TermStates.java:96-140 — here a pruned read of the index's
``global_terms`` parquet), each segment is scored independently, and
per-segment top-k results merge with the TopDocs.merge tie-break —
score desc, then segment order, then docID (search/TopDocs.java:203-228);
since our segments are disjoint ascending docID ranges, that reduces to
(score desc, global docID asc), exactly HitQueue's ordering.

The searcher feeds the best k-th score back into the evaluation context as
segments are visited (minCompetitiveScore, TopScoreDocCollector.java:106-164),
so later segments prune posting blocks via block-max impacts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from lucene_ray.analysis.analyzers import Analyzer
from lucene_ray.index.build import load_manifest, read_global_term_stats
from lucene_ray.search import query as Q
from lucene_ray.search.query import collect_scored_terms
from lucene_ray.search.scoring import EvalContext, eval_query
from lucene_ray.search.segreader import SegmentReader


@dataclass
class TopDocs:
    total_hits: int
    relation: str  # "EQ" exact | "GTE" lower bound (pruning engaged)
    doc_ids: np.ndarray  # global doc ids
    scores: np.ndarray
    # IndexSearcher#setTimeout / TimeLimitingCollector role: True when the
    # search deadline expired and unvisited segments were skipped (results
    # are then partial; relation is forced to GTE)
    timed_out: bool = False


def merge_topk(
    docs: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, doc asc) — HitQueue ordering."""
    if docs.shape[0] > max(4 * k, 4096):
        # cheap pre-cut: keep everything scoring >= the k-th best score so
        # score ties survive for the docID tie-break
        kth = -np.partition(-scores, k - 1)[k - 1]
        keep = scores >= kth
        docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))
    order = order[:k]
    return docs[order], scores[order]


class Searcher:
    def __init__(self, index_dir: str, mode: str = "f32",
                 commit: "int | None" = None):
        """``commit`` opens a point-in-time view of that surviving commit
        generation (DirectoryReader.open(IndexCommit)) — the manifest AND
        the delete overlay come from the frozen commit point, so searches
        reproduce that commit exactly while the live index moves on."""
        self.index_dir = index_dir
        self.mode = mode
        self.commit = commit
        m = load_manifest(index_dir, generation=commit)
        self.manifest = m
        self.doc_count = m["doc_count"]
        self.sum_ttf = m["sum_total_term_freq"]
        from lucene_ray.index.build import analyzer_from_manifest

        self.analyzer = analyzer_from_manifest(m)
        from lucene_ray.index.build import field_analyzers_from_manifest

        self.field_analyzers = field_analyzers_from_manifest(m)
        from lucene_ray.search.segreader import group_segment_paths, open_reader

        self.readers = [open_reader(g) for g in group_segment_paths(m["segments"])]
        self.field_ttf = {
            f: info["sum_ttf"] for f, info in m.get("fields", {}).items()
        }
        from lucene_ray.index.deletes import load_tombstones

        if commit is not None:
            import pyarrow.parquet as _pq

            tpath = os.path.join(
                index_dir, "commits", f"tombstones_{commit}.parquet")
            self.tombstones = (
                _pq.read_table(tpath)["doc_id"].to_numpy().astype(np.int64)
                if os.path.exists(tpath) else np.empty(0, dtype=np.int64)
            )
        else:
            self.tombstones = load_tombstones(index_dir)  # sorted global ids
        self._stats_cache: dict[str, tuple[int, int]] = {}

    # -- global stats (TermStates.build) ------------------------------------
    def term_stats(self, terms: set[str]) -> dict[str, tuple[int, int]]:
        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            tbl = read_global_term_stats(self.index_dir, missing, self.manifest)
            got = dict(
                zip(
                    tbl["term"].to_pylist(),
                    zip(tbl["df"].to_pylist(), tbl["ttf"].to_pylist()),
                )
            )
            for t in missing:
                self._stats_cache[t] = got.get(t, (0, 0))
        return {t: self._stats_cache[t] for t in terms}

    def make_context(self, query: Q.Query) -> EvalContext:
        terms: set[str] = set()
        collect_scored_terms(query, terms)
        return EvalContext(
            self.term_stats(terms), self.doc_count, self.sum_ttf, mode=self.mode,
            field_ttf=self.field_ttf,
        )

    def parse(self, text: str) -> Q.Query:
        from lucene_ray.search.parser import parse_query

        return parse_query(text, self.analyzer, set(self.field_ttf),
                           self.field_analyzers)

    def _prep(self, query: "Q.Query | str") -> Q.Query:
        """Parse (if a string) and rewrite field-scoped terms to storage
        keys (query.resolve_fields) — the per-search rewrite step. Also
        dissolves ScoringRewriteQuery wrappers against the top-level
        dictionary (MultiTermQuery.SCORING_BOOLEAN_QUERY_REWRITE,
        search/MultiTermQuery.java:86 / ScoringRewrite.java:39)."""
        if isinstance(query, str):
            query = self.parse(query)
        return self._scoring_rewrite(Q.resolve_fields(query))

    def _scoring_rewrite(self, q: Q.Query) -> Q.Query:
        import dataclasses

        if isinstance(q, Q.ScoringRewriteQuery):
            from lucene_ray.search.scoring import expand_multiterm

            terms: set = set()
            for reader in self.readers:
                idxs = expand_multiterm(reader, q.query)
                terms.update(reader.terms[int(i)] for i in idxs)
            boost = getattr(q.query, "boost", 1.0)
            if not terms:
                return Q.MatchNoDocsQuery()
            return Q.BooleanQuery(should=tuple(
                Q.TermQuery(t, boost=boost) for t in sorted(terms)))
        if isinstance(q, Q.BooleanQuery):
            return dataclasses.replace(
                q,
                must=tuple(self._scoring_rewrite(s) for s in q.must),
                should=tuple(self._scoring_rewrite(s) for s in q.should),
                must_not=tuple(self._scoring_rewrite(s)
                               for s in q.must_not),
                filter=tuple(self._scoring_rewrite(s) for s in q.filter),
            )
        if isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
            return dataclasses.replace(
                q, query=self._scoring_rewrite(q.query))
        return q

    def search(self, query: "Q.Query | str", k: int = 10, prune: bool = True,
               timeout_s: "float | None" = None) -> TopDocs:
        """``timeout_s`` is the IndexSearcher#setTimeout /
        TimeLimitingCollector role: the deadline is checked between
        SEGMENT evaluations (the reference's ExitableDirectoryReader
        checks between doc blocks — segments are this engine's unit of
        sequential work); on expiry the remaining segments are skipped
        and the partial TopDocs returns ``timed_out=True`` with relation
        GTE, like TopDocs after TimeExceededException."""
        import time

        query = self._prep(query)
        ctx = self.make_context(query)
        if not prune:
            ctx_threshold_enabled = False
        else:
            ctx_threshold_enabled = True
        deadline = None if timeout_s is None else time.monotonic() + timeout_s

        best_docs = np.empty(0, dtype=np.int64)
        best_scores = np.empty(0, dtype=np.float64)
        total = 0
        exact_all = True
        timed_out = False
        from lucene_ray.index.deletes import mask_live

        for reader in self.readers:
            if deadline is not None and time.monotonic() > deadline:
                timed_out = True
                exact_all = False
                break
            d, s, exact = eval_query(reader, query, ctx)
            exact_all &= exact
            if d.shape[0]:
                gdocs = d + reader.doc_base
                live = mask_live(gdocs, self.tombstones)
                gdocs, s = gdocs[live], s[live]
                total += int(gdocs.shape[0])
                best_docs = np.concatenate([best_docs, gdocs])
                best_scores = np.concatenate([best_scores, s])
                best_docs, best_scores = merge_topk(best_docs, best_scores, k)
            if ctx_threshold_enabled and best_docs.shape[0] >= k:
                ctx.threshold = float(best_scores[-1])
        return TopDocs(
            total_hits=total,
            relation="EQ" if exact_all else "GTE",
            doc_ids=best_docs,
            scores=best_scores,
            timed_out=timed_out,
        )

    def search_all(self, query: "Q.Query | str"):
        """Hit-complete (no pruning) evaluation: every matching doc with its
        score, as (global doc_ids, scores) — the Weight.bulkScorer-over-
        everything path used by oracle comparisons and collectors."""
        query = self._prep(query)
        ctx = self.make_context(query)  # threshold -inf -> exhaustive
        from lucene_ray.index.deletes import mask_live

        docs_parts, score_parts = [], []
        for reader in self.readers:
            d, s, _ = eval_query(reader, query, ctx)
            if d.shape[0]:
                gdocs = d + reader.doc_base
                live = mask_live(gdocs, self.tombstones)
                docs_parts.append(gdocs[live])
                score_parts.append(s[live])
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(docs_parts), np.concatenate(score_parts)

    def search_with_collector(self, query: "Q.Query | str", manager):
        """The IndexSearcher.search(Query, CollectorManager) extension
        surface (search/CollectorManager.java:42; search/collectors.py):
        evaluate the query hit-complete per segment, hand each segment's
        (reader, global docs, scores) to ``manager.collect_leaf`` —
        vectorized per leaf, never per doc — and fold the partials with
        ``manager.reduce``. Tombstones are masked before collection,
        matching every other search path."""
        query = self._prep(query)
        ctx = self.make_context(query)
        from lucene_ray.index.deletes import mask_live

        partials = []
        for reader in self.readers:
            d, s, _ = eval_query(reader, query, ctx)
            if d.shape[0] == 0:
                continue
            gdocs = d + reader.doc_base
            live = mask_live(gdocs, self.tombstones)
            if live.any():
                partials.append(
                    manager.collect_leaf(reader, gdocs[live], s[live]))
        return manager.reduce(partials)

    def rescore(self, first: "Q.Query | str", second: "Q.Query | str",
                k_first: int = 100, k: int = 10,
                weight: float = 1.0) -> TopDocs:
        """Two-pass rescoring — search/QueryRescorer.java:46: take the
        first query's top ``k_first`` (pruned, cheap), re-rank them as
        ``first_score + weight * second_score`` where the (expensive)
        second query also matches, first_score alone otherwise, and
        return the top ``k``. The canonical use is a term-query first
        pass re-ranked by a phrase/proximity second pass.

        The second pass only touches segments that hold a candidate —
        with ``k_first`` in the hundreds that is the handful of segments
        the first pass surfaced, not the corpus; candidate intersection
        is one searchsorted per segment."""
        td = self.search(first, k=k_first)
        if td.doc_ids.shape[0] == 0:
            return TopDocs(0, "EQ", td.doc_ids, td.scores)
        cand = np.sort(td.doc_ids)
        combined = dict(zip(td.doc_ids.tolist(), td.scores.tolist()))

        query2 = self._prep(second)
        ctx2 = self.make_context(query2)
        for reader in self.readers:
            # actual id span of the segment (global ids need not be
            # contiguous per segment — the corpus may arrive shuffled)
            lo, hi = int(reader.doc_ids[0]), int(reader.doc_ids[-1]) + 1
            i0, i1 = np.searchsorted(cand, [lo, hi])
            if i0 == i1:  # no candidate in this segment: skip entirely
                continue
            d, s, _ = eval_query(reader, query2, ctx2)
            if not d.shape[0]:
                continue
            gdocs = d + reader.doc_base
            hit = np.isin(gdocs, cand[i0:i1])
            for g, sc in zip(gdocs[hit].tolist(), s[hit].tolist()):
                combined[g] += weight * sc
        docs = np.fromiter(combined.keys(), np.int64, len(combined))
        scores = np.fromiter(combined.values(), np.float64, len(combined))
        docs, scores = merge_topk(docs, scores, k)
        return TopDocs(td.total_hits, td.relation, docs, scores)

    def explain(self, query: "Q.Query | str", doc_id: int) -> dict:
        """Score explanation for one document — the Weight.explain role
        (search/Weight.java; the reference's CheckHits asserts
        explanation == score, test-framework/.../search/CheckHits.java:181-333).
        Returns the total score plus a per-term breakdown (df, idf, freq,
        quantized doc length, partial score) for every scored term that
        matches the doc."""
        from lucene_ray.index.fields import split_key
        from lucene_ray.search.scoring import probe_postings
        from lucene_ray.util.smallfloat import LENGTH_TABLE_INT

        query = self._prep(query)
        ctx = self.make_context(query)
        docs, scores = self.search_all(query)
        hit = np.nonzero(docs == int(doc_id))[0]
        matched = hit.size > 0
        formula = (
            "BM25(k1=%.2f, b=%.2f): sum over terms of "
            "idf * tf / (tf + k1*(1-b+b*dl/avgdl))" % (1.2, 0.75)
            if self.mode in ("f32", "f64")
            else f"similarity mode {self.mode!r} (see "
                 "search/similarity.py for the formula); per-term df/freq/"
                 "dl details below are the shared inputs"
        )
        out = {
            "doc_id": int(doc_id),
            "matched": bool(matched),
            "score": float(scores[hit[0]]) if matched else 0.0,
            "mode": self.mode,
            "formula": formula,
            "details": [],
        }
        terms: set[str] = set()
        collect_scored_terms(query, terms)
        for key in sorted(terms):
            df, ttf = self.term_stats({key}).get(key, (0, 0))
            if df == 0:
                continue
            field, plain = split_key(key)
            scorer = ctx.scorer(key)
            for reader in self.readers:
                local = int(doc_id) - reader.doc_base
                idx = reader.term_index(key)
                if idx < 0:
                    continue
                found, freq, norm = probe_postings(reader, idx, local)
                if not found:
                    continue
                partial = float(
                    scorer.score(
                        np.array([freq], dtype=np.uint32),
                        np.array([norm], dtype=np.uint8),
                    )[0]
                )
                out["details"].append(
                    {
                        "term": plain,
                        "field": field,
                        "df": int(df),
                        "ttf": int(ttf),
                        "idf": float(scorer.idf),
                        "freq": freq,
                        "quantized_dl": int(LENGTH_TABLE_INT[norm]),
                        "avgdl": ctx._sum_ttf_for(key) / ctx.doc_count,
                        "partial_score": partial,
                    }
                )
                break
        return out

    def fetch_docs(
        self,
        doc_ids,
        columns: "list[str] | None" = None,
        on_missing: str = "warn",
    ) -> "object":
        """Stored-field fetch — the searcher.storedFields().document(docid)
        role (search/IndexSearcher.java / SURVEY §3.2 step 6): return the
        source rows for ``doc_ids`` IN THE GIVEN ORDER, via a pruned
        predicate-pushdown read of the index's stored source Parquet
        (``manifest.stored_source`` plus any ``stored_sources`` appended by
        ``add_documents``). No segment holds a copy of the originals; the
        read touches only row groups containing the requested ids.

        Tombstoned (deleted) ids are masked out — deleted docs are never
        fetchable. Requested ids absent from every stored source are
        dropped; ``on_missing`` controls whether that drop is silent
        (``"drop"``), warns (``"warn"``, default), or raises
        (``"raise"``)."""
        import pyarrow.dataset as pads

        srcs = [self.manifest.get("stored_source")] + list(
            self.manifest.get("stored_sources", [])
        )
        srcs = [s for s in srcs if s]
        if not srcs:
            raise ValueError(
                "index has no stored-fields source (build_index(stored_source=...))"
            )
        ids = [int(d) for d in doc_ids]
        if self.tombstones.shape[0] and ids:
            from lucene_ray.index.deletes import mask_live

            live = mask_live(np.asarray(ids, dtype=np.int64), self.tombstones)
            ids = [d for d, ok in zip(ids, live) if ok]
        id_col = self.manifest.get("id_col", "doc_id")
        if columns is not None and id_col not in columns:
            columns = [id_col] + list(columns)
        dset = (
            pads.dataset(srcs[0], format="parquet")
            if len(srcs) == 1
            else pads.dataset([pads.dataset(s, format="parquet") for s in srcs])
        )
        t = dset.to_table(columns=columns, filter=pads.field(id_col).isin(ids))
        import pyarrow as _pa

        if t.num_rows == 0 or not ids:
            if ids and on_missing != "drop":
                self._report_missing(ids, on_missing)
            return t.slice(0, 0)
        got = t[id_col].to_numpy()
        order = np.argsort(got)
        pos = np.searchsorted(got[order], np.asarray(ids, dtype=got.dtype))
        pos = np.clip(pos, 0, got.shape[0] - 1)
        found = got[order][pos] == np.asarray(ids, dtype=got.dtype)
        if not found.all() and on_missing != "drop":
            self._report_missing(
                [d for d, ok in zip(ids, found) if not ok], on_missing
            )
        return t.take(_pa.array(order[pos][found]))

    @staticmethod
    def _report_missing(missing: list, on_missing: str) -> None:
        msg = (
            f"fetch_docs: {len(missing)} requested id(s) absent from the "
            f"stored source(s) (e.g. {missing[:5]})"
        )
        if on_missing == "raise":
            raise KeyError(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)

    def more_like_this(self, text: str, max_terms: int = 10):
        """Query-by-document (queries/mlt/MoreLikeThis.java:149): analyze
        the text, rank its terms by tf * ln(doc_count / df) (terms absent
        from the index are skipped), keep the top ``max_terms`` (ties by
        term asc), and return the disjunction of those terms."""
        from collections import Counter

        from lucene_ray.search import query as Q

        tf = Counter(self.analyzer.tokens(text))
        stats = self.term_stats(set(tf))
        scored = []
        for t, f in tf.items():
            df, _ttf = stats.get(t, (0, 0))
            if df > 0:
                scored.append((-f * np.log(self.doc_count / df), t))
        scored.sort()
        top = [t for _s, t in scored[:max_terms]]
        return Q.BooleanQuery(should=tuple(Q.TermQuery(t) for t in top))

    def suggest(self, prefix: str, k: int = 10):
        """Prefix completion ranked by global df (the AnalyzingInfixSuggester
        role, suggest/analyzing/AnalyzingInfixSuggester.java:97, with
        popularity = document frequency) straight off the sorted global
        term dictionary — no extra index needed."""
        import os

        import pyarrow.dataset as pads

        from lucene_ray.index.build import stats_path

        dset = pads.dataset(
            stats_path(self.index_dir, self.manifest), format="parquet"
        )
        t = dset.to_table(
            filter=(pads.field("term") >= prefix)
            & (pads.field("term") < prefix + chr(0x10FFFF))
        )
        order = np.lexsort(
            (np.asarray(t["term"].to_pylist(), dtype=object), -t["df"].to_numpy())
        )[:k]
        return t.take(order)

    def suggest_fuzzy(self, prefix: str, k: int = 10, max_edits: int = 1,
                      non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 3):
        """Typo-tolerant completion — the FuzzySuggester contract
        (suggest/analyzing/FuzzySuggester.java:60): suggestions whose
        *prefix* is within ``max_edits`` Levenshtein edits of the typed
        text (prefix edit distance: min over all prefixes of the
        candidate), the first ``non_fuzzy_prefix`` chars matching
        exactly, and no fuzziness at all for inputs shorter than
        ``min_fuzzy_length``. Ranked df desc, term asc.

        The exact first char range-prunes the sorted dictionary (the
        analog of the reference intersecting a LevenshteinAutomaton with
        the suggest FST); the Levenshtein DP then runs as ONE numpy
        recurrence over the whole slice at once — candidates truncated
        to len(prefix)+max_edits codepoints sit in a fixed-width
        (n, W) uint32 matrix and each of the m·W DP cells is a
        vectorized min across all n candidates (no per-term Python)."""
        import os

        import pyarrow as _pa
        import pyarrow.dataset as pads

        if len(prefix) < min_fuzzy_length or max_edits == 0:
            return self.suggest(prefix, k=k)
        anchor = prefix[:max(non_fuzzy_prefix, 1)]
        from lucene_ray.index.build import stats_path

        dset = pads.dataset(
            stats_path(self.index_dir, self.manifest), format="parquet"
        )
        t = dset.to_table(
            filter=(pads.field("term") >= anchor)
            & (pads.field("term") < anchor + chr(0x10FFFF))
        )
        m = len(prefix)
        W = m + max_edits
        terms_obj = np.asarray(t["term"].to_pylist(), dtype=object)
        n = terms_obj.shape[0]
        empty = _pa.table({
            "rank": _pa.array([], type=_pa.int64()),
            "term": _pa.array([], type=_pa.string()),
            "df": _pa.array([], type=_pa.int64()),
        })
        if n == 0:
            return empty
        # dtype-U conversion truncates to W codepoints and zero-pads;
        # viewing as uint32 gives the (n, W) codepoint matrix.
        mat = np.array(terms_obj, dtype=f"U{W}").view(np.uint32).reshape(n, W)
        lens = np.minimum((mat != 0).sum(axis=1), W)
        pref_codes = np.frombuffer(prefix.encode("utf-32-le"), dtype=np.uint32)
        # prefix edit distance: dp over (prefix x candidate-prefix);
        # answer = min over valid j of the last row.
        prev = np.tile(np.arange(W + 1, dtype=np.int32), (n, 1))
        cur = np.empty_like(prev)
        for i in range(1, m + 1):
            cur[:, 0] = i
            pch = pref_codes[i - 1]
            for j in range(1, W + 1):
                sub = prev[:, j - 1] + (mat[:, j - 1] != pch)
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
                np.minimum(cur[:, j], sub, out=cur[:, j])
            prev, cur = cur, prev
        cols = np.arange(W + 1, dtype=np.int64)
        valid = cols[None, :] <= lens[:, None]
        ped = np.where(valid, prev, np.int32(1 << 20)).min(axis=1)
        keep = np.nonzero(ped <= max_edits)[0]
        if keep.shape[0] == 0:
            return empty
        dfs = t["df"].to_numpy()[keep].astype(np.int64)
        kept_terms = terms_obj[keep]
        order = np.lexsort((kept_terms, -dfs))[:k]
        return _pa.table({
            "rank": _pa.array(
                np.arange(1, order.shape[0] + 1, dtype=np.int64)),
            "term": _pa.array(kept_terms[order], type=_pa.string()),
            "df": _pa.array(dfs[order], type=_pa.int64()),
        })

    def doc_values_stats(self, query, feature: str) -> dict:
        """DocValuesStats collector (misc/search/DocValuesStats.java:29,
        124-156): count / min / max / sum / mean / variance / stdev of a
        numeric doc-values field (a dense ``feat_<name>`` column) over the
        docs matching ``query``. Population variance, the reference's
        Welford accumulation evaluated in closed form; per-segment
        vectorized gathers, merged like the reference's per-leaf
        accumulators. The query runs constant-score — the collector only
        needs the matching doc set, never the BM25 math."""
        from lucene_ray.search import query as _Q

        if isinstance(query, str):
            query = self._prep(query)
        docs, _scores = self.search_all(_Q.ConstantScoreQuery(query))
        tot, s, ss = 0, 0.0, 0.0
        mn, mx = np.inf, -np.inf
        for r in self.readers:
            if not r.meta.get("owns_docs", True):
                continue
            ids = r.doc_ids
            if ids.shape[0] == 0:
                continue
            idx = np.searchsorted(ids, docs)
            idx_c = np.clip(idx, 0, ids.shape[0] - 1)
            sel = ids[idx_c] == docs
            if not sel.any():
                continue
            v = r.feature(feature)[idx_c[sel]].astype(np.float64)
            tot += v.shape[0]
            s += float(v.sum())
            ss += float((v * v).sum())
            mn = min(mn, float(v.min()))
            mx = max(mx, float(v.max()))
        if tot == 0:
            return {"count": 0, "vmin": None, "vmax": None, "vsum": 0.0,
                    "mean": 0.0, "variance": 0.0, "stdev": 0.0}
        mean = s / tot
        var = max(ss / tot - mean * mean, 0.0)
        return {"count": tot, "vmin": mn, "vmax": mx, "vsum": s,
                "mean": mean, "variance": var, "stdev": float(np.sqrt(var))}

    def string_doc_values_stats(self, query, name: str) -> dict:
        """SortedDocValuesStats (misc/search/DocValuesStats.java:479):
        count / lexicographic min / max / distinct values of a STRING
        doc-values field over the docs matching ``query`` — with the
        committed string-DV update generations overlaid. Same
        constant-score collection shape as the numeric stats."""
        from lucene_ray.search import query as _Q

        if isinstance(query, str):
            query = self._prep(query)
        docs, _scores = self.search_all(_Q.ConstantScoreQuery(query))
        tot = 0
        vmin = vmax = None
        distinct: set = set()
        for r in self.readers:
            if not r.meta.get("owns_docs", True):
                continue
            ids = r.doc_ids
            if ids.shape[0] == 0:
                continue
            idx = np.searchsorted(ids, docs)
            idx_c = np.clip(idx, 0, ids.shape[0] - 1)
            sel = ids[idx_c] == docs
            if not sel.any():
                continue
            import pyarrow as _pa

            vals = r.string_values(name).take(
                _pa.array(idx_c[sel])).to_pylist()
            vals = [v for v in vals if v is not None]
            if not vals:
                continue
            tot += len(vals)
            lo, hi = min(vals), max(vals)
            vmin = lo if vmin is None else min(vmin, lo)
            vmax = hi if vmax is None else max(vmax, hi)
            distinct.update(vals)
        return {"count": tot, "vmin": vmin, "vmax": vmax,
                "distinct": len(distinct)}

    def string_doc_values_counts(self, query, name: str):
        """Value counts of a STRING doc-values field over the docs
        matching ``query`` — the SortedSetDocValues facet-count shape
        with committed string-DV UPDATE overlays applied
        (IndexWriter.updateBinaryDocValue, IndexWriter.java:1940;
        segreader.string_values). Returns a pyarrow table
        (value, count) sorted by value."""
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from lucene_ray.search import query as _Q

        if isinstance(query, str):
            query = self._prep(query)
        docs, _scores = self.search_all(_Q.ConstantScoreQuery(query))
        parts = []
        for r in self.readers:
            if not r.meta.get("owns_docs", True):
                continue
            ids = r.doc_ids
            if ids.shape[0] == 0:
                continue
            idx = np.searchsorted(ids, docs)
            idx_c = np.clip(idx, 0, ids.shape[0] - 1)
            sel = ids[idx_c] == docs
            if sel.any():
                parts.append(r.string_values(name).take(
                    _pa.array(idx_c[sel])))
        if not parts:
            return _pa.table({"value": _pa.array([], _pa.string()),
                              "count": _pa.array([], _pa.int64())})
        vc = _pc.value_counts(_pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, _pa.ChunkedArray) else p
             for p in parts]))
        t = _pa.table({"value": vc.field("values"),
                       "count": vc.field("counts").cast(_pa.int64())})
        return t.sort_by("value")

    def term_vector(self, doc_id: int, field: "str | None" = None) -> "object":
        """Per-document term vector — the TermVectorsReader role
        (codecs/lucene90/compressing/Lucene90CompressingTermVectorsReader.java,
        IndexReader.getTermVectors): every (term, position[, offsets]) of
        ONE doc, sorted by (term, position), read from the persisted
        positions columns (requires ``with_positions=True``). ``field``
        selects one field's section (terms return unprefixed); None = the
        default field."""
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from lucene_ray.index.fields import FIELD_MARK, field_prefix

        parts = []
        for reader in self.readers:
            t = reader.positions_for_docs([int(doc_id)])
            if t.num_rows:
                parts.append(t)
        if not parts:
            return _pa.table({"term": _pa.array([], _pa.string()),
                              "pos": _pa.array([], _pa.int32())})
        t = _pa.concat_tables(parts)
        if field is None:
            t = t.filter(_pc.invert(_pc.starts_with(t["term"], FIELD_MARK)))
        else:
            pref = field_prefix(field)
            t = t.filter(_pc.starts_with(t["term"], pref))
            t = t.set_column(
                t.schema.get_field_index("term"), "term",
                _pc.utf8_slice_codeunits(t["term"], len(pref), 2**31 - 1),
            )
        return t.take(_pc.sort_indices(
            t, sort_keys=[("term", "ascending"), ("pos", "ascending")]
        ))

    def matches(self, query: "Q.Query | str", doc_id: int):
        """Matches API (search/Matches.java:33, MatchesIterator.java:38,
        Weight#matches): every match occurrence of ``query`` in ONE doc as
        (field, label, start_pos, end_pos, start_off, end_off) tuples
        sorted by (field, start, end); None when the doc does not match
        the parent query. Requires ``with_positions=True``."""
        from lucene_ray.search.matches import doc_matches

        return doc_matches(self, query, doc_id)

    def suggest_infix(self, fragment: str, k: int = 10):
        """Infix completion — the AnalyzingInfixSuggester's actual infix
        contract (suggest/analyzing/AnalyzingInfixSuggester.java:97:
        matches ANYWHERE in the suggestion, not just the prefix), ranked
        by global df desc then term asc. One substring kernel over the
        global terms table (the table the prefix path range-prunes;
        infix can't range-prune a sorted dictionary — same full-scan
        trade the reference makes by keeping a dedicated suggest index)."""
        import os

        import pyarrow.compute as _pc
        import pyarrow.dataset as pads

        from lucene_ray.index.build import stats_path

        t = pads.dataset(
            stats_path(self.index_dir, self.manifest), format="parquet"
        ).to_table()
        from lucene_ray.index.fields import FIELD_MARK

        keep = _pc.and_(
            _pc.match_substring(t["term"], fragment),
            _pc.invert(_pc.starts_with(t["term"], FIELD_MARK)),
        )
        t = t.filter(keep)
        order = np.lexsort(
            (np.asarray(t["term"].to_pylist(), dtype=object), -t["df"].to_numpy())
        )[:k]
        return t.take(order)

    def classify_knn(self, text: str, label_col: str, k: int = 10,
                     max_terms: int = 10):
        """K-nearest-neighbor text classification — the classification
        module's KNearestNeighborClassifier
        (classification/KNearestNeighborClassifier.java): a MoreLikeThis
        query over the labeled corpus, labels of the top-k neighbors
        fetched from stored fields, votes tallied. Returns a votes table
        (label, votes) ordered (votes desc, label asc); row 1 is the
        prediction. Top-k selection uses round4(score) desc, doc asc so
        the result is deterministic across float stacks."""
        q = self.more_like_this(text, max_terms=max_terms)
        docs, scores = self.search_all(q)
        r = np.sign(scores) * np.floor(np.abs(scores) * 1e4 + 0.5) / 1e4
        order = np.lexsort((docs, -r))[:k]
        top = [int(d) for d in docs[order]]
        fetched = self.fetch_docs(top, columns=[label_col])
        labels = fetched[label_col].to_pylist()
        from collections import Counter

        votes = Counter(labels)
        import pyarrow as _pa

        items = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        return _pa.table(
            {
                "label": [l for l, _ in items],
                "votes": _pa.array([v for _, v in items], type=_pa.int64()),
            }
        )

    def spell_correct(self, term: str, max_edits: int = 2, k: int = 5):
        """Did-you-mean — the DirectSpellChecker role
        (suggest/spell/DirectSpellChecker.java): dictionary terms within
        ``max_edits`` plain-Levenshtein edits of ``term``, ranked by
        (distance asc, df desc, term asc). Scans the tiny global term
        stats (default field section); at web scale the scan would bucket
        by length/prefix the way the reference's LevenshteinAutomata
        prunes the FST."""
        from lucene_ray.index.build import read_global_term_stats
        from lucene_ray.index.fields import FIELD_MARK
        from lucene_ray.search.scoring import _edit_distance

        t = read_global_term_stats(self.index_dir, manifest=self.manifest)
        rows = []
        lb = len(term)
        for cand, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            if cand.startswith(FIELD_MARK) or abs(len(cand) - lb) > max_edits:
                continue
            dist = _edit_distance(term, cand, max_edits)
            if dist <= max_edits:
                rows.append((dist, -int(df), cand))
        rows.sort()
        import pyarrow as _pa

        top = rows[:k]
        return _pa.table(
            {
                "rank": _pa.array(range(1, len(top) + 1), type=_pa.int64()),
                "term": [r[2] for r in top],
                "distance": _pa.array([r[0] for r in top], type=_pa.int64()),
                "df": _pa.array([-r[1] for r in top], type=_pa.int64()),
            }
        )

    def spell_correct_jaro_winkler(self, term: str,
                                   min_similarity: float = 0.7,
                                   k: int = 5):
        """Did-you-mean ranked by Jaro-Winkler similarity — the
        SpellChecker + JaroWinklerDistance pairing
        (suggest/spell/SpellChecker.java setStringDistance,
        JaroWinklerDistance.java:32): dictionary terms with similarity
        >= ``min_similarity`` (the setAccuracy role), ranked
        (similarity desc, df desc, term asc). Same tiny global-stats
        scan as the Levenshtein path."""
        from lucene_ray.index.build import read_global_term_stats
        from lucene_ray.index.fields import FIELD_MARK
        from lucene_ray.util.strdist import jaro_winkler

        t = read_global_term_stats(self.index_dir, manifest=self.manifest)
        rows = []
        for cand, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            if cand.startswith(FIELD_MARK):
                continue
            sim = jaro_winkler(term, cand)
            if sim >= min_similarity:
                rows.append((-sim, -int(df), cand))
        rows.sort()
        import pyarrow as _pa

        top = rows[:k]
        return _pa.table({
            "rank": _pa.array(range(1, len(top) + 1), type=_pa.int64()),
            "term": [r[2] for r in top],
            "similarity": _pa.array([-r[0] for r in top],
                                    type=_pa.float64()),
            "df": _pa.array([-r[1] for r in top], type=_pa.int64()),
        })

    def _global_df(self) -> dict:
        """{term: df} over the default field's global term stats, loaded
        once per searcher (the WordBreakSpellChecker dictionary role)."""
        if not hasattr(self, "_gdf_cache"):
            from lucene_ray.index.build import read_global_term_stats
            from lucene_ray.index.fields import FIELD_MARK

            t = read_global_term_stats(self.index_dir,
                                       manifest=self.manifest)
            self._gdf_cache = {
                term: int(df)
                for term, df in zip(t["term"].to_pylist(),
                                    t["df"].to_pylist())
                if not term.startswith(FIELD_MARK)
            }
        return self._gdf_cache

    def suggest_word_breaks(self, term: str, k: int = 5,
                            max_changes: int = 1,
                            min_break_length: int = 1,
                            min_freq: int = 1,
                            mode: str = "not_in_index",
                            max_evaluations: int = 1000):
        """WordBreakSpellChecker.suggestWordBreaks role (suggest/spell/
        WordBreakSpellChecker.java:74): split ``term`` into dictionary
        words — bisects first, then recursive splits of the right side
        of any valid left part, up to ``max_changes`` breaks — ranked
        NUM_CHANGES_THEN_MAX_FREQUENCY (fewer breaks, then higher max
        component df). Returns [(parts, changes, max_freq), ...]."""
        df = self._global_df()
        orig = df.get(term, 0)
        if orig > 0 and mode == "not_in_index":
            return []
        floor = max(min_freq, 1)
        if mode == "more_popular":
            floor = orig if orig else 1
        out = []
        evals = 0

        def rec(text: str, breaks: int, prefix: tuple, maxfreq: int):
            nonlocal evals
            n = len(text)
            if n < min_break_length * 2:
                return
            valid_lefts = []
            for i in range(min_break_length, n - min_break_length + 1):
                if evals >= max_evaluations:
                    return
                evals += 1
                left, right = text[:i], text[i:]
                ldf = df.get(left, 0)
                if ldf >= floor:
                    valid_lefts.append((i, ldf))
                    rdf = df.get(right, 0)
                    if rdf >= floor:
                        out.append((prefix + (left, right), breaks,
                                    max(maxfreq, ldf, rdf)))
            if breaks + 1 > max_changes:
                return
            for i, ldf in valid_lefts:
                rec(text[i:], breaks + 1, prefix + (text[:i],),
                    max(maxfreq, ldf))
                if evals >= max_evaluations:
                    return

        rec(term, 1, (), 0)
        out.sort(key=lambda r: (r[1], -r[2], r[0]))
        return out[:k]

    def suggest_word_combinations(self, terms: list, k: int = 5,
                                  max_changes: int = 1,
                                  max_combined_length: int = 20,
                                  min_freq: int = 1,
                                  mode: str = "not_in_index"):
        """WordBreakSpellChecker.suggestWordCombinations role
        (suggest/spell/WordBreakSpellChecker.java:148): combine up to
        ``max_changes``+1 adjacent terms into one dictionary word.
        Returns [(combined, first_index, last_index, freq), ...] ranked
        by (combinations asc, freq desc)."""
        df = self._global_df()
        origs = [df.get(t, 0) for t in terms]
        out = []
        for i in range(len(terms) - 1):
            combined = terms[i]
            if len(combined) > max_combined_length:
                continue
            maxf = minf = origs[i]
            for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
                combined += terms[j]
                if len(combined) > max_combined_length:
                    break
                maxf = max(maxf, origs[j])
                minf = min(minf, origs[j])
                cf = df.get(combined, 0)
                if mode == "more_popular" and cf < maxf:
                    continue
                if mode == "not_in_index" and minf != 0:
                    continue
                if cf >= min_freq:
                    out.append((combined, i, j, cf, j - i))
        out.sort(key=lambda r: (r[4], -r[3], r[0]))
        return [(c, i, j, f) for c, i, j, f, _ in out[:k]]

    def multi_phrase_freqs(self, positions: tuple):
        """(global doc_ids, occurrence counts) for a multi-phrase — each
        position accepts any of its alternative terms."""
        from lucene_ray.search.scoring import _eval_multiphrase_freqs

        docs_parts, freq_parts = [], []
        for reader in self.readers:
            d, f = _eval_multiphrase_freqs(reader, positions)
            if d.shape[0]:
                docs_parts.append(d + reader.doc_base)
                freq_parts.append(f)
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(docs_parts), np.concatenate(freq_parts)

    def phrase_wildcard_freqs(self, slots: tuple,
                              max_expansions: int = 128):
        """PhraseWildcardQuery (sandbox/src/java/org/apache/lucene/search/
        PhraseWildcardQuery.java:63): a phrase where a slot may be a
        trailing-``*`` prefix pattern, expanded against EACH SEGMENT'S OWN
        dictionary (the reference's segment-based expansion that shares no
        global automaton state) and CAPPED at ``max_expansions`` like the
        reference, then matched with the multi-phrase matcher. Returns
        (global doc_ids, phrase occurrence counts)."""
        from lucene_ray.search.scoring import (_eval_multiphrase_freqs,
                                               expand_wildcard_slots)

        docs_parts, freq_parts = [], []
        for reader in self.readers:
            positions = expand_wildcard_slots(reader, slots, max_expansions)
            if positions is None:
                continue
            d, f = _eval_multiphrase_freqs(reader, positions)
            if d.shape[0]:
                docs_parts.append(d + reader.doc_base)
                freq_parts.append(f)
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(docs_parts), np.concatenate(freq_parts)

    def term_automaton_freqs(self, n_states: int, transitions, accept):
        """TermAutomatonQuery (sandbox/src/java/org/apache/lucene/search/
        TermAutomatonQuery.java:59): a positional automaton over terms —
        ``transitions`` is ``(from_state, to_state, term_or_None)`` with
        ``None`` meaning ANY (the hole transition
        TokenStreamToTermAutomatonQuery emits for position gaps), state 0
        initial, ``accept`` the accepting states. Generalizes phrase /
        multi-phrase to paths of different lengths. Returns (global
        doc_ids, distinct accepted-occurrence counts)."""
        from lucene_ray.search.scoring import _eval_term_automaton_freqs

        docs_parts, freq_parts = [], []
        for reader in self.readers:
            d, f = _eval_term_automaton_freqs(reader, n_states,
                                              transitions, accept)
            if d.shape[0]:
                docs_parts.append(d + reader.doc_base)
                freq_parts.append(f)
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(docs_parts), np.concatenate(freq_parts)

    def diversified_topk(self, query, key_col: str, k: int,
                         max_per_key: int = 1):
        """DiversifiedTopDocsCollector (misc/src/java/org/apache/lucene/
        misc/search/DiversifiedTopDocsCollector.java:63): global top-``k``
        by score with at most ``max_per_key`` hits sharing a key. Keys
        come from the stored source via the pruned-pushdown fetch of only
        the matched ids' key column (the reference reads a doc-values
        iterator per leaf). Ordering is (score desc, doc asc), the
        TopDocs tie-break.

        Scale note: per-segment diversified top-k is a superset of the
        global answer, so the distributed path runs this collector per
        serving actor and re-runs the same vectorized scan on the
        fan-in — nothing here needs the full hit list on one node beyond
        the per-key cap survivors."""
        docs, scores = self.search_all(query)
        if docs.shape[0] == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, object))
        # on_missing="raise": a dropped id would silently misalign keys
        # with (docs, scores) — diversification needs one key per hit
        fetched = self.fetch_docs(docs.tolist(), columns=["doc_id", key_col],
                                  on_missing="raise")
        keys = np.asarray(fetched[key_col].to_numpy(zero_copy_only=False),
                          dtype=object)
        _uk, key_codes = np.unique(keys, return_inverse=True)
        # rank within key in (score desc, doc asc) order — one lexsort +
        # run scan, no per-key loop
        order = np.lexsort((docs, -scores, key_codes))
        kc = key_codes[order]
        new = np.ones(kc.shape[0], dtype=bool)
        new[1:] = kc[1:] != kc[:-1]
        starts = np.nonzero(new)[0]
        run_id = np.cumsum(new) - 1
        rank = np.arange(kc.shape[0]) - starts[run_id]
        keep_idx = order[rank < max_per_key]
        d2, s2, k2 = docs[keep_idx], scores[keep_idx], keys[keep_idx]
        top = np.lexsort((d2, -s2))[:k]
        return d2[top], s2[top], k2[top]

    def payload_check_freqs(self, terms: tuple, payloads: tuple):
        """(global doc_ids, accepted-span counts) for a payload-checked
        exact phrase (SpanPayloadCheckQuery.java:54 — a span counts only
        when every position's payload equals the expected sequence)."""
        from lucene_ray.search.scoring import payload_check_freqs

        docs_parts, freq_parts = [], []
        for reader in self.readers:
            d, f = payload_check_freqs(reader, list(terms), list(payloads))
            if d.shape[0]:
                docs_parts.append(d + reader.doc_base)
                freq_parts.append(f)
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(docs_parts), np.concatenate(freq_parts)

    def phrase_freqs(self, terms: tuple, slop: int = 0):
        """(global doc_ids, phrase occurrence counts) for a phrase."""
        from lucene_ray.search.scoring import _eval_phrase_freqs

        docs_parts, freq_parts = [], []
        for reader in self.readers:
            d, f = _eval_phrase_freqs(reader, list(terms), slop)
            if d.shape[0]:
                docs_parts.append(d + reader.doc_base)
                freq_parts.append(f)
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(docs_parts), np.concatenate(freq_parts)

    def count(self, query: "Q.Query | str") -> int:
        """TotalHitCountCollector — exact hit count, no scoring shortcuts."""
        query = self._prep(query)
        from lucene_ray.index.deletes import mask_live

        ctx = self.make_context(query)  # threshold stays -inf -> no pruning
        n = 0
        for r in self.readers:
            d = eval_query(r, query, ctx)[0]
            n += int(mask_live(d + r.doc_base, self.tombstones).sum())
        return n

    def search_after(
        self, query: "Q.Query | str", k: int, after_score: float, after_doc: int
    ) -> TopDocs:
        """Resumable pagination (IndexSearcher.searchAfter,
        search/IndexSearcher.java:587-599): keep hits strictly worse than the
        cursor in (score desc, doc asc) order."""
        query = self._prep(query)
        ctx = self.make_context(query)
        all_docs = np.empty(0, dtype=np.int64)
        all_scores = np.empty(0, dtype=np.float64)
        total = 0
        exact_all = True
        for reader in self.readers:
            d, s, exact = eval_query(reader, query, ctx)
            exact_all &= exact
            if d.shape[0] == 0:
                continue
            from lucene_ray.index.deletes import mask_live

            gdocs = d + reader.doc_base
            live = mask_live(gdocs, self.tombstones)
            gdocs, s = gdocs[live], s[live]
            total += int(gdocs.shape[0])  # count AFTER tombstone mask, like search()
            keep = (s < after_score) | ((s == after_score) & (gdocs > after_doc))
            gdocs, s = gdocs[keep], s[keep]
            all_docs = np.concatenate([all_docs, gdocs])
            all_scores = np.concatenate([all_scores, s])
            all_docs, all_scores = merge_topk(all_docs, all_scores, k)
        return TopDocs(total, "EQ" if exact_all else "GTE", all_docs, all_scores)
