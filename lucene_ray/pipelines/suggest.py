"""Corpus-level suggesters — the FreeTextSuggester role
(suggest/analyzing/FreeTextSuggester.java:120).

The reference builds an n-gram language model (an FST of token
n-grams) and completes the user's current token conditioned on the
previous ones, scoring with "stupid backoff" (Brants et al. 2007,
the paper the reference cites): use the conditional n-gram frequency
when the history was seen, otherwise back off to the lower order
scaled by alpha (the reference's ALPHA = 0.4), chaining down through
every shorter history to the unigram floor:

    S(c | w_1..w_h) = count(w_1..w_h c) / count(w_1..w_h)   if seen
                    = alpha * S(c | w_2..w_h)               otherwise
    S(c)            = count(c) / N                          (unigram)

Ray-Data-first analog: ONE streaming pass over the corpus emits
per-batch partial counts for EVERY history order at once (h-gram
continuations of each context suffix, the context-suffix occurrence
counts, prefix-matching unigrams, total tokens), a tiny groupby-sum
reduces them, and the driver walks the backoff chain over the handful
of candidates. Everything per batch is Arrow kernels + shifted-mask
numpy ANDs (split_pattern / value_counts); the shuffle moves only
candidate-term count rows, never text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(texts: pa.Array):
    """(flat token array, doc index per token) — two tokens belong to the
    same document iff their doc indexes are equal, which generalizes the
    bigram boundary mask to arbitrary-length n-gram spans."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = pc.split_pattern(texts, " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    offs = lst.offsets.to_numpy()
    n = len(flat)
    doc_of = np.searchsorted(offs, np.arange(n), side="right")
    return flat, doc_of


def free_text_suggest(pages, context: str, prefix: str, k: int = 10,
                      alpha: float = 0.4, text_col: str = "text",
                      min_count: int = 1,
                      cand_cap: "int | None" = None) -> pa.Table:
    """Next-token completion: candidates extending ``prefix`` after the
    token sequence ``context`` (space-separated; the last tokens are
    the history, longest order first), stupid-backoff scored down the
    full chain. Returns (rank, term, score) with score rounded to 6
    decimals, ties broken term asc.

    Model-size bound (round-4: the driver-side dict was unbounded at
    crawl scale): candidate counting is already restricted to
    prefix-matching continuations, and before collection the Dataset
    applies ``min_count`` pruning plus a per-order top-``cand_cap``
    (default max(1024, 64·k)) by count, so the driver never holds more
    than (orders+2)·cand_cap rows. With defaults the caps are far above
    any top-k cut and the result is exact; past the cap the model is the
    same kind of pruned n-gram model the reference's FreeTextSuggester
    builds (suggest/analyzing/FreeTextSuggester.java:121 builds from a
    discounted, pruned gram FST — documented approximation: a term
    truncated from a high order may back off to a lower order's score)."""

    ctx = [t for t in context.split(" ") if t]
    C = len(ctx)
    cand_cap = cand_cap or max(1024, 64 * k)

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of = _flat_tokens(b[text_col])
        kinds, terms, counts = [], [], []
        n = len(flat)
        if n:
            is_pref = pc.starts_with(flat, prefix).to_numpy(
                zero_copy_only=False)
            # eq[j]: token equals ctx[j]
            eq = [pc.equal(flat, c).to_numpy(zero_copy_only=False)
                  for c in ctx]
            # For each history length h (1..C, suffix ctx[C-h:]): a
            # position i hosts the history iff tokens i..i+h-1 match the
            # suffix and all sit in one doc; the continuation candidate
            # is token i+h.
            for h in range(1, C + 1):
                suf = eq[C - h:]
                if n < h:
                    continue
                # history occurrences (denominator count(w_1..w_h))
                hist = suf[0][: n - h + 1].copy()
                for j in range(1, h):
                    hist &= suf[j][j: n - h + 1 + j]
                hist &= doc_of[: n - h + 1] == doc_of[h - 1: n]
                kinds.append(f"h{h}")
                terms.append("")
                counts.append(int(hist.sum()))
                # continuations: history at i, prefix-candidate at i+h
                if n >= h + 1:
                    sel = hist[: n - h] & is_pref[h:] \
                        & (doc_of[: n - h] == doc_of[h:])
                    if sel.any():
                        vc = pc.value_counts(flat.take(
                            pa.array(np.nonzero(sel)[0] + h)))
                        kinds += [f"g{h}"] * len(vc)
                        terms += vc.field("values").to_pylist()
                        counts += vc.field("counts").to_pylist()
            if is_pref.any():
                vc = pc.value_counts(flat.filter(pa.array(is_pref)))
                kinds += ["uni"] * len(vc)
                terms += vc.field("values").to_pylist()
                counts += vc.field("counts").to_pylist()
            kinds.append("tot")
            terms.append("")
            counts.append(n)
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "term": pa.array(terms, pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "term"])
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        def prune(b: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            # candidate rows (g*/uni) below min_count drop; histogram
            # and total rows always survive (they are denominators)
            is_cand = _pc.or_(_pc.match_substring_regex(b["kind"], "^g"),
                              _pc.equal(b["kind"], "uni"))
            keep = _pc.or_(_pc.invert(is_cand),
                           _pc.greater_equal(b["n"], min_count))
            return b.filter(keep)

        agg = agg.map_batches(prune, batch_format="pyarrow")
    from lucene_ray.pipelines.facets import grouped_top_k

    rows = grouped_top_k(agg, "kind", "n", cand_cap).take_all()
    import logging

    logging.getLogger(__name__).info(
        "free_text_suggest model: %d rows collected (cap %d per order)",
        len(rows), cand_cap)
    grams: list[dict] = [dict() for _ in range(C + 1)]  # grams[h][term]
    hist_n = [0] * (C + 1)
    uni: dict = {}
    tot_n = 0
    for r in rows:
        kind = r["kind"]
        if kind == "uni":
            uni[r["term"]] = r["n"]
        elif kind == "tot":
            tot_n = r["n"]
        elif kind.startswith("g"):
            grams[int(kind[1:])][r["term"]] = r["n"]
        elif kind.startswith("h"):
            hist_n[int(kind[1:])] = r["n"]
    terms = sorted(uni)

    def score(t: str) -> float:
        s = 1.0
        for h in range(C, 0, -1):
            if t in grams[h] and hist_n[h]:
                return s * grams[h][t] / hist_n[h]
            s *= alpha
        return s * uni[t] / tot_n if tot_n else 0.0

    scores = np.array([score(t) for t in terms], dtype=np.float64)
    r6 = np.sign(scores) * np.floor(np.abs(scores) * 1e6 + 0.5) / 1e6
    order = np.lexsort((np.asarray(terms, dtype=object), -r6))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, order.shape[0] + 1, dtype=np.int64)),
        "term": pa.array([terms[i] for i in order], pa.string()),
        "score": pa.array(r6[order], pa.float64()),
    })


def blended_infix_suggest(pages, fragment: str, k: int = 10,
                          blender: str = "linear", exponent: float = 2.0,
                          text_col: str = "text", weight_col: str = None,
                          id_col: str = "doc_id") -> pa.Table:
    """BlendedInfixSuggester (suggest/analyzing/BlendedInfixSuggester
    .java:60): suggestions where ANY token starts with ``fragment``,
    ranked by weight * coefficient(position of the first matching
    token) — linear ``1 - 0.10*p``, reciprocal ``1/(1+p)``,
    exp_reciprocal ``1/(1+p)^exponent`` (the reference's three
    BlenderTypes). Per-batch vectorized top-k partials; the driver
    merges k rows per batch."""
    def part(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.fill_null(b[text_col], ""), " ")
        flat = pc.list_flatten(lists)
        n = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_row = np.repeat(np.arange(b.num_rows, dtype=np.int64), n)
        offs = np.concatenate(([0], np.cumsum(n)))
        pos = np.arange(doc_row.shape[0], dtype=np.int64) - offs[doc_row]
        m = pc.starts_with(flat, fragment).to_numpy(zero_copy_only=False)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "position": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if not m.any():
            return empty
        dr, pp = doc_row[m], pos[m]
        order = np.lexsort((pp, dr))
        dr, pp = dr[order], pp[order]
        first = np.concatenate(([True], dr[1:] != dr[:-1]))
        rows, minp = dr[first], pp[first]
        mp = minp.astype(np.float64)
        if blender == "linear":
            coef = 1 - 0.10 * mp
        elif blender == "reciprocal":
            coef = 1.0 / (mp + 1)
        else:
            coef = 1.0 / (mp + 1.0) ** exponent
        ids = b[id_col].to_numpy(zero_copy_only=False)[rows].astype(np.int64)
        w = (b[weight_col].to_numpy(zero_copy_only=False)[rows]
             .astype(np.float64) if weight_col
             else np.ones(rows.shape[0]))
        score = w * coef
        top = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "position": pa.array(minp[top]),
                         "score": pa.array(score[top], pa.float64())})

    parts = pages.map_batches(part, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "position": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    t = pa.Table.from_pylist(parts)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    sc = t["score"].to_numpy(zero_copy_only=False)
    top = np.lexsort((ids, -sc))[:k]
    return t.take(pa.array(top))


# ---------------------------------------------------------------------------
# AnalyzingSuggester — FST-backed analyzed completion
# ---------------------------------------------------------------------------

SEP = "\x1f"     # PRESERVE_SEP token separator (AnalyzingSuggester.java:133)
_END = b"\x1e"   # analyzed-form / surface-form boundary inside FST keys


class AnalyzingSuggester:
    """AnalyzingSuggester (suggest/analyzing/AnalyzingSuggester.java:100):
    analyze the surface form, key a minimal FST by
    ``analyzed + SEP-joined + surface``, complete the analyzed query
    prefix and rank by weight — with the reference's default
    EXACT_FIRST | PRESERVE_SEP semantics (exact analyzed matches
    outrank prefix matches; token boundaries are preserved in the
    analyzed key so "key v" completes across words, while without
    preserve_sep "keyv" would).

    ``maxSurfaceFormsPerAnalyzedForm`` (AnalyzingSuggester.java:142):
    keep only the top-weighted ``max_surface_per_analyzed`` surfaces
    per analyzed form at build time.

    Build input is a PRE-AGGREGATED, BOUNDED (surface, weight) table —
    produce it with ``corpus_prefix_surfaces`` (a distributed Ray Data
    aggregation); the FST itself is a driver/actor-side model like the
    free-text suggester's, broadcast once for serving.
    """

    def __init__(self, surfaces: pa.Table, analyzer=None,
                 preserve_sep: bool = True, exact_first: bool = True,
                 max_surface_per_analyzed: int = 256):
        from lucene_ray.analysis.analyzers import StandardAnalyzer
        from lucene_ray.util.fst import build_fst

        self.analyzer = analyzer or StandardAnalyzer
        self.preserve_sep = preserve_sep
        self.exact_first = exact_first
        sep = SEP if preserve_sep else ""

        surf = surfaces["surface"].to_pylist()
        wt = surfaces["weight"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        # vocabulary-mapped analysis: one tokens() call per unique surface
        entries: dict[tuple[str, str], int] = {}
        for s, w in zip(surf, wt):
            if "\x1e" in s or "\x1f" in s:
                raise ValueError(f"surface contains a reserved byte: {s!r}")
            a = sep.join(self.analyzer.tokens(s))
            k = (a, s)
            entries[k] = entries.get(k, 0) + int(w)
        # maxSurfaceFormsPerAnalyzedForm: top-weight surfaces per analyzed
        rows = sorted(((a, -w, s) for (a, s), w in entries.items()))
        kept: list[tuple[bytes, int]] = []
        run_a, run_n = None, 0
        for a, negw, s in rows:
            run_n = run_n + 1 if a == run_a else 1
            run_a = a
            if run_n <= max_surface_per_analyzed:
                kept.append((a.encode() + _END + s.encode(), -negw))
        kept.sort()
        self.fst = build_fst(kept)

    def _analyze_query(self, query: str) -> bytes:
        sep = SEP if self.preserve_sep else ""
        toks = self.analyzer.tokens(query)
        qa = sep.join(toks)
        # a trailing partial token stays a PREFIX of the analyzed key
        return qa.encode()

    def lookup(self, query: str, k: int = 10,
               max_candidates: int = 50_000) -> pa.Table:
        """Top-k (surface, weight) completions. Candidate enumeration is
        bounded by ``max_candidates``; the reference instead runs a
        weighted shortest-path search over the FST (Util.java:260) —
        with per-analyzed-form surface caps the candidate set is small
        by construction, so a bounded enumerate-then-rank keeps the
        same results without the admissible-heuristic machinery."""
        qa = self._analyze_query(query)
        cand = []
        for key, w in self.fst.completions(qa, limit=max_candidates):
            a, _, s = key.partition(_END)
            cand.append((not (self.exact_first and a == qa), -w,
                         s.decode()))
        cand.sort()
        top = cand[:k]
        return pa.table({
            "surface": pa.array([s for _, _, s in top], pa.string()),
            "weight": pa.array([-nw for _, nw, _ in top], pa.int64()),
        })


def corpus_prefix_surfaces(pages, text_col: str = "text",
                           max_tokens: int = 2,
                           max_entries: int = 1_000_000):
    """Distributed (surface, weight) extraction for suggester builds:
    the leading 1..max_tokens-token prefixes of every document, weight
    = number of documents sharing the prefix. Per-batch value_counts
    partials, one small groupby-sum shuffle of (prefix, count) rows —
    text never moves — then a weight-desc limit bounds the model that
    reaches the driver."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.fill_null(b[text_col], ""), " ")
        n = pc.list_value_length(lists)
        out_s, out_w = [], []
        for j in range(1, max_tokens + 1):
            has = pc.greater_equal(n, j)
            pref = pc.binary_join(
                pc.list_slice(pc.filter(lists, has), 0, j),
                pa.scalar(" "))
            vc = pc.value_counts(pref)
            out_s.append(vc.field("values"))
            out_w.append(pc.cast(vc.field("counts"), pa.int64()))
        return pa.table({"surface": pa.concat_arrays(out_s),
                         "weight": pa.concat_arrays(out_w)})

    agg = (pages.map_batches(part, batch_format="pyarrow")
           .groupby("surface").aggregate(Sum("weight", alias_name="weight"))
           .sort("weight", descending=True).limit(max_entries))
    t = pa.concat_tables(ref for ref in agg.iter_batches(
        batch_format="pyarrow", batch_size=None))
    return t


CTX_SEP = b"\x1d"  # context / analyzed-form boundary inside FST keys


class ContextSuggester:
    """Context-filtered completion — the ContextQuery over
    ContextSuggestField roles (suggest/document/ContextQuery.java:63,
    ContextSuggestField.java:46): every surface indexes under its
    CONTEXT (the reference prepends contexts to the completion
    automaton; here the FST key is ``context + CTX_SEP + analyzed +
    END + surface``). Lookups filter to the requested contexts and
    multiply each context's weights by its boost — all contexts with
    boost 1 when none are given (ContextQuery's allContexts mode).

    Build input: a pre-aggregated (context, surface, weight) table —
    produce it with :func:`corpus_context_surfaces`."""

    def __init__(self, surfaces: pa.Table, analyzer=None,
                 preserve_sep: bool = True,
                 max_surface_per_analyzed: int = 256):
        from lucene_ray.analysis.analyzers import StandardAnalyzer
        from lucene_ray.util.fst import build_fst

        self.analyzer = analyzer or StandardAnalyzer
        self.preserve_sep = preserve_sep
        sep = SEP if preserve_sep else ""
        ctxs = surfaces["context"].to_pylist()
        surf = surfaces["surface"].to_pylist()
        wt = surfaces["weight"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        entries: dict = {}
        for c, s, w in zip(ctxs, surf, wt):
            for txt, name in ((c, "context"), (s, "surface")):
                if "\x1d" in txt or "\x1e" in txt or "\x1f" in txt:
                    raise ValueError(
                        f"{name} contains a reserved byte: {txt!r}")
            a = sep.join(self.analyzer.tokens(s))
            k = (c, a, s)
            entries[k] = entries.get(k, 0) + int(w)
        rows = sorted(((c, a, -w, s) for (c, a, s), w in entries.items()))
        kept = []
        run_key, run_n = None, 0
        for c, a, negw, s in rows:
            run_n = run_n + 1 if (c, a) == run_key else 1
            run_key = (c, a)
            if run_n <= max_surface_per_analyzed:
                kept.append((c.encode() + CTX_SEP + a.encode()
                             + _END + s.encode(), -negw))
        kept.sort()
        self.fst = build_fst(kept)
        self.contexts = sorted({c for c, _a, _s in entries})

    def lookup(self, query: str, contexts: "dict | None" = None,
               k: int = 10, max_candidates: int = 50_000) -> pa.Table:
        """Top-k (surface, context, score) where score = weight × the
        context's boost; ties break (surface asc, context asc)."""
        sep = SEP if self.preserve_sep else ""
        qa = sep.join(self.analyzer.tokens(query)).encode()
        boosts = dict(contexts) if contexts else {
            c: 1.0 for c in self.contexts}
        cand = []
        for ctx in sorted(boosts):
            boost = float(boosts[ctx])
            prefix = ctx.encode() + CTX_SEP + qa
            for key, w in self.fst.completions(prefix,
                                               limit=max_candidates):
                _c, _, rest = key.partition(CTX_SEP)
                _a, _, s = rest.partition(_END)
                cand.append((-(w * boost), s.decode(), ctx))
        cand.sort()
        top = cand[:k]
        return pa.table({
            "surface": pa.array([s for _n, s, _c in top], pa.string()),
            "context": pa.array([c for _n, _s, c in top], pa.string()),
            "score": pa.array([-n for n, _s, _c in top], pa.float64()),
        })


def corpus_context_surfaces(pages, context_col: str,
                            text_col: str = "text", max_tokens: int = 2,
                            max_entries: int = 1_000_000):
    """Distributed (context, surface, weight) extraction: the leading
    1..max_tokens-token prefixes of every document keyed by its context
    column, weight = docs sharing (context, prefix). Same partial ->
    small-groupby shape as corpus_prefix_surfaces — text never moves."""
    from ray.data.aggregate import Sum

    def _flat(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    def part(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.fill_null(b[text_col], ""), " ")
        n = pc.list_value_length(lists)
        out_c, out_s = [], []
        for j in range(1, max_tokens + 1):
            has = pc.greater_equal(n, j)
            pref = pc.binary_join(
                pc.list_slice(pc.filter(lists, has), 0, j),
                pa.scalar(" "))
            out_c.append(_flat(pc.filter(b[context_col], has)))
            out_s.append(_flat(pref))
        t = pa.table({"context": pa.concat_arrays(out_c),
                      "surface": pa.concat_arrays(out_s)})
        return (t.group_by(["context", "surface"])
                 .aggregate([("surface", "count")])
                 .rename_columns(["context", "surface", "weight"]))

    agg = (pages.map_batches(part, batch_format="pyarrow")
           .groupby(["context", "surface"])
           .aggregate(Sum("weight", alias_name="weight"))
           .sort("weight", descending=True).limit(max_entries))
    return pa.concat_tables(agg.iter_batches(batch_format="pyarrow",
                                             batch_size=None))


def document_dictionary_surfaces(pages, surface_col: str,
                                 weight_col: "str | None" = None,
                                 max_entries: int = 1_000_000):
    """DocumentDictionary (suggest/DocumentDictionary.java:47): suggester
    build input taken from stored FIELDS — surface = ``surface_col``,
    weight = the SUM of ``weight_col`` over docs sharing the surface
    (the reference reads a numeric weight field per doc; docs sharing a
    surface accumulate), or the doc count when no weight field is given.
    One small groupby shuffle of (surface, weight) rows; feeds
    AnalyzingSuggester/ContextSuggester like corpus_prefix_surfaces."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        surf = b[surface_col]
        if isinstance(surf, pa.ChunkedArray):
            surf = surf.combine_chunks()
        ok = pc.and_(pc.is_valid(surf), pc.not_equal(surf, ""))
        if weight_col is None:
            w = pa.array(np.ones(b.num_rows, dtype=np.int64))
        else:
            w = pc.cast(b[weight_col], pa.int64())
            if isinstance(w, pa.ChunkedArray):
                w = w.combine_chunks()
        t = pa.table({"surface": pc.filter(surf, ok),
                      "weight": pc.filter(w, ok)})
        return (t.group_by("surface").aggregate([("weight", "sum")])
                 .rename_columns(["surface", "weight"]))

    agg = (pages.map_batches(part, batch_format="pyarrow")
           .groupby("surface").aggregate(Sum("weight", alias_name="weight"))
           .sort("weight", descending=True).limit(max_entries))
    return pa.concat_tables(agg.iter_batches(batch_format="pyarrow",
                                             batch_size=None))


def _prefix_edit_distance(q: bytes, a: bytes, max_edits: int):
    """min over prefixes a[:j] of levenshtein(q, a[:j]), or None when it
    exceeds ``max_edits`` — the fuzzy-prefix acceptance of
    FuzzyCompletionQuery (the reference intersects a Levenshtein
    automaton with the FST; over a bounded suggester model a banded DP
    per candidate is the same acceptance set)."""
    m = len(q)
    col = list(range(m + 1))  # distance(q[:i], "")
    best = col[m] if col[m] <= max_edits else None
    for j in range(1, len(a) + 1):
        prev_diag = col[0]
        col[0] = j if j <= m + max_edits else col[0]
        col0 = j
        new = [col0] + [0] * m
        lo = max_edits + 1
        for i in range(1, m + 1):
            cost = 0 if q[i - 1] == a[j - 1] else 1
            new[i] = min(new[i - 1] + 1, col[i] + 1, prev_diag + cost)
            prev_diag = col[i]
            lo = min(lo, new[i])
        col = new
        if col[m] <= max_edits:
            best = col[m] if best is None else min(best, col[m])
        if lo > max_edits and col0 > m + max_edits:
            break  # the whole band exceeded; longer prefixes only grow
    return best


class FuzzySuggesterLookup:
    """Fuzzy completion over an AnalyzingSuggester's FST — the
    FuzzyCompletionQuery role (suggest/document/FuzzyCompletionQuery.java:63
    and suggest/analyzing/FuzzySuggester.java:80): accept completions
    whose analyzed form has SOME PREFIX within ``max_edits`` edits of
    the analyzed query; ``prefix_length`` bytes must match exactly (the
    reference's nonFuzzyPrefix, default 1), which also prunes the FST
    walk to one subtree. Ranking: (edits asc, weight desc, surface asc)
    — typo count first, like the repo's dictionary fuzzy suggester."""

    def __init__(self, suggester: AnalyzingSuggester):
        self.s = suggester

    def lookup(self, query: str, k: int = 10, max_edits: int = 1,
               prefix_length: int = 1,
               max_candidates: int = 50_000) -> pa.Table:
        qa = self.s._analyze_query(query)
        pre = qa[:prefix_length]
        rows = []
        for key, w in self.s.fst.completions(pre, limit=max_candidates):
            a, _, surf = key.partition(_END)
            ed = _prefix_edit_distance(qa, a, max_edits)
            if ed is not None:
                rows.append((ed, -w, surf.decode()))
        rows.sort()
        top = rows[:k]
        return pa.table({
            "surface": pa.array([s for _e, _nw, s in top], pa.string()),
            "edits": pa.array([e for e, _nw, _s in top], pa.int64()),
            "weight": pa.array([-nw for _e, nw, _s in top], pa.int64()),
        })


class RegexSuggesterLookup:
    """Regex completion over an AnalyzingSuggester's FST — the
    RegexCompletionQuery role (suggest/document/RegexCompletionQuery
    .java:47): accept completions whose analyzed form STARTS WITH a
    match of the regex (the reference intersects the regex automaton
    with the FST; over the bounded model an anchored ``re.match`` per
    candidate is the same acceptance set). Ranked (weight desc,
    surface asc)."""

    def __init__(self, suggester: AnalyzingSuggester):
        self.s = suggester

    def lookup(self, pattern: str, k: int = 10,
               max_candidates: int = 50_000) -> pa.Table:
        import re

        rx = re.compile(pattern)
        rows = []
        for key, w in self.s.fst.completions(b"", limit=max_candidates):
            a, _, surf = key.partition(_END)
            if rx.match(a.decode("utf-8", "replace")):
                rows.append((-w, surf.decode()))
        rows.sort()
        top = rows[:k]
        return pa.table({
            "surface": pa.array([s for _nw, s in top], pa.string()),
            "weight": pa.array([-nw for nw, _s in top], pa.int64()),
        })
