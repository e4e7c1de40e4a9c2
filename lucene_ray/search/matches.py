"""Matches API — per-document match positions and offsets.

Role: search/Matches.java:33 + search/MatchesIterator.java:38 +
Weight#matches(LeafReaderContext, int) (search/Weight.java): given a
query and ONE document, report every match occurrence as
(field, label, start_position, end_position, start_offset, end_offset),
ordered by (field, start, end) — the machinery the reference's
MatchHighlighter and field-introspection tools build on. Returns None
when the document does not match the parent query (the Weight.matches
contract), and an empty list when it matches without positional leaves
(e.g. a pure MatchAllDocsQuery).

Offsets come straight from the positional index rows
(term, doc_id, pos, start_offset, end_offset) — no re-analysis, same
source as highlight.highlight_from_index.

Deviations, documented:
* Sloppy phrases report their LEAF TERM occurrences (submatch level)
  rather than reordered windows — the reference's SloppyPhraseMatcher
  enumerates windows; exact phrases here report true [first..last]
  spans like ExactPhraseMatcher.
* IntervalQuery reports its TRUE interval spans (IntervalsSource
  .matches contract) labeled 'intervals'; SpanNearQuery still reports
  leaf term occurrences.
"""

from __future__ import annotations

import numpy as np

from lucene_ray.index.fields import split_key
from lucene_ray.search import query as Q


def _doc_positions(reader, doc_id: int) -> dict:
    """{storage_term: (pos[], so[], eo[])} for ONE global doc id, each
    term's rows sorted by position."""
    t = reader.positions_for_docs([int(doc_id)])
    out: dict = {}
    if t.num_rows == 0:
        return out
    terms = t["term"].to_pylist()
    pos = t["pos"].to_numpy()
    so = t["start_offset"].to_numpy()
    eo = t["end_offset"].to_numpy()
    order = np.argsort(pos, kind="stable")
    for i in order:
        out.setdefault(terms[i], [[], [], []])
        slot = out[terms[i]]
        slot[0].append(int(pos[i]))
        slot[1].append(int(so[i]))
        slot[2].append(int(eo[i]))
    return out


def _term_spans(rows: dict, key: str) -> list:
    """Leaf occurrences of one storage term -> match tuples."""
    slot = rows.get(key)
    if not slot:
        return []
    field, disp = split_key(key)
    return [(field, disp, p, p, s, e)
            for p, s, e in zip(slot[0], slot[1], slot[2])]


def _exact_phrase_spans(rows: dict, terms: tuple) -> list:
    """ExactPhraseMatcher role: spans [p .. p+len-1] where term_i sits at
    p+i for every i; offsets cover first token start .. last token end."""
    slots = [rows.get(t) for t in terms]
    if any(s is None for s in slots):
        return []
    first = slots[0]
    out = []
    rest = [dict(zip(s[0], range(len(s[0])))) for s in slots[1:]]
    for j, p in enumerate(first[0]):
        ok = True
        last_idx = None
        for i, lookup in enumerate(rest, start=1):
            k = lookup.get(p + i)
            if k is None:
                ok = False
                break
            last_idx = (i, k)
        if not ok:
            continue
        if last_idx is None:  # single-term phrase
            eo = first[2][j]
        else:
            li, lk = last_idx
            eo = slots[li][2][lk]
        field, _ = split_key(terms[0])
        label = " ".join(split_key(t)[1] for t in terms)
        out.append((field, label, p, p + len(terms) - 1, first[1][j], eo))
    return out


def _collect(reader, q: Q.Query, rows: dict, out: list,
             ldoc: int = -1) -> None:
    """Recursive positive-clause walk (BooleanWeight.matches shape:
    prohibited clauses contribute nothing)."""
    if isinstance(q, Q.TermQuery):
        out.extend(_term_spans(rows, q.term))
    elif isinstance(q, (Q.SynonymQuery, Q.BlendedTermQuery)):
        for t in q.terms:
            out.extend(_term_spans(rows, t))
    elif isinstance(q, Q.CommonTermsQuery):
        for t in q.terms:
            out.extend(_term_spans(rows, t))
    elif isinstance(q, Q.PhraseQuery):
        if q.slop == 0:
            out.extend(_exact_phrase_spans(rows, q.terms))
        else:  # sloppy -> leaf submatches (documented deviation)
            for t in q.terms:
                out.extend(_term_spans(rows, t))
    elif isinstance(q, Q.MultiPhraseQuery):
        for alt in q.positions:
            for t in alt:
                out.extend(_term_spans(rows, t))
    elif isinstance(q, (Q.SpanNearQuery,)):
        for t in q.terms:
            out.extend(_term_spans(rows, t))
    elif isinstance(q, Q.IntervalQuery):
        # TRUE interval spans (IntervalsSource.matches contract) — not
        # just leaf submatches: evaluate the source on this segment and
        # keep this doc's intervals; offsets come from the position ->
        # offset map of ANY token at the boundary positions
        from lucene_ray.search.intervals import eval_intervals

        d, s, e = eval_intervals(reader, q.source)
        sel = d == ldoc
        pos_off: dict = {}
        for slot in rows.values():
            for p, so, eo in zip(slot[0], slot[1], slot[2]):
                if p not in pos_off:
                    pos_off[p] = (so, eo)
                else:
                    a, b = pos_off[p]
                    pos_off[p] = (min(a, so), max(b, eo))
        field = None  # interval sources evaluate the default field here
        label = "intervals"
        for sp, ep in zip(s[sel], e[sel]):
            so = pos_off.get(int(sp), (-1, -1))[0]
            eo = pos_off.get(int(ep), (-1, -1))[1]
            out.append((field, label, int(sp), int(ep), so, eo))
    elif isinstance(q, (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery,
                        Q.FuzzyQuery, Q.TermRangeQuery, Q.TermInSetQuery)):
        from lucene_ray.search.scoring import expand_multiterm

        for i in expand_multiterm(reader, q):
            key = reader.terms[int(i)]
            out.extend(_term_spans(rows, key))
    elif isinstance(q, Q.BooleanQuery):
        for sub in (*q.must, *q.should, *q.filter):
            _collect(reader, sub, rows, out, ldoc)
    elif isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
        _collect(reader, q.query, rows, out, ldoc)
    elif isinstance(q, (Q.DisjunctionMaxQuery, Q.CoveringQuery)):
        for sub in q.queries:
            _collect(reader, sub, rows, out, ldoc)
    elif isinstance(q, Q.IndexOrDocValuesQuery):
        _collect(reader, q.index_query, rows, out, ldoc)
    elif isinstance(q, Q.CombinedFieldQuery):
        from lucene_ray.index.fields import field_key

        for t in q.terms:
            out.extend(_term_spans(rows, t))  # default field
            for f, _w in q.fields:
                out.extend(_term_spans(rows, field_key(f, t)))
    # non-positional leaves (match-all, DV queries, feature queries...)
    # contribute no match positions — like the reference's
    # MatchesUtils.MATCH_WITH_NO_TERMS


def doc_matches(searcher, query, doc_id: int):
    """Weight.matches over a whole index: None if ``doc_id`` doesn't
    match ``query``; else match tuples
    (field, label, start_pos, end_pos, start_off, end_off) sorted by
    (field, start, end, label). Fields: None = the default text field."""
    from lucene_ray.index.deletes import mask_live
    from lucene_ray.search.scoring import eval_query

    query = searcher._prep(query)
    doc_id = int(doc_id)
    if not mask_live(np.array([doc_id]), searcher.tombstones)[0]:
        return None
    for reader in searcher.readers:
        ids = reader.doc_ids
        if ids.shape[0] == 0:
            continue
        p = np.searchsorted(ids, doc_id)
        if p >= ids.shape[0] or ids[p] != doc_id:
            continue
        ctx = searcher.make_context(query)
        d, _s, _e = eval_query(reader, query, ctx)
        if not np.isin(doc_id - reader.doc_base, d, assume_unique=True):
            return None
        rows = _doc_positions(reader, doc_id)
        out: list = []
        _collect(reader, query, rows, out,
                 ldoc=doc_id - reader.doc_base)
        out.sort(key=lambda m: (m[0] or "", m[2], m[3], m[1]))
        return out
    return None
