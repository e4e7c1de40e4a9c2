"""Query-time join — the JoinUtil.createJoinQuery role
(join/src/java/org/apache/lucene/search/join/JoinUtil.java:56,91):
gather the ``fromField`` values of the from-side selection, then match
to-side docs whose ``toField`` holds any gathered value.

Ray-Data-first: the from side is any Dataset (already filtered/derived by
the caller's pipeline — the fromQuery role); the value gather is a
distributed ``groupby(field).count()`` (only distinct values shuffle,
never rows), bounded by ``max_terms`` exactly like JoinUtil's in-memory
terms collection. The result is an ordinary :class:`TermInSetQuery`, so
it composes with every other query operator and runs on the serving
actors unchanged.

Score mode: ScoreMode.None only (constant score — the common
filter-join). The reference's Max/Avg modes aggregate from-side scores
per term; a scored variant would carry a per-term boost table, noted as
future surface.
"""

from __future__ import annotations

from lucene_ray.search import query as Q


def create_join_query(
    from_ds,
    from_field: str,
    to_field: "str | None" = None,
    max_terms: int = 100_000,
    score_mode: str = "none",
    score_col: "str | None" = None,
) -> Q.Query:
    """Distributed term gather -> a query against ``to_field``
    (None = default field). Raises when the from side yields more than
    ``max_terms`` distinct values (the join would degenerate to a scan —
    same bound JoinUtil's terms collection implies).

    ``score_mode`` (JoinUtil ScoreMode):

    * ``"none"`` — constant-score TermInSetQuery (the filter join).
    * ``"max" | "sum" | "avg"`` — ``score_col`` aggregates per gathered
      value (distributed groupby); each value becomes a constant-score
      term carrying its aggregate, and the to-side doc scores
      max-over-matched-terms (DisjunctionMax) or sum-over-matched-terms
      (Boolean should) of those aggregates — the TermsWithScoreQuery
      contract (to-side tf does NOT multiply in)."""
    if score_mode == "none":
        vals = from_ds.groupby(from_field).count().take(max_terms + 1)
        weights = None
    else:
        if score_col is None:
            raise ValueError("score_mode != 'none' requires score_col")
        from ray.data.aggregate import Max, Mean, Sum

        agg = {"max": Max, "sum": Sum, "avg": Mean}[score_mode](
            score_col, alias_name="w"
        )
        vals = from_ds.groupby(from_field).aggregate(agg).take(max_terms + 1)
        weights = True
    if len(vals) > max_terms:
        raise ValueError(
            f"join from-side produced > {max_terms} distinct "
            f"{from_field!r} values; raise max_terms or narrow the from query"
        )
    rows = sorted(
        (str(v[from_field]), float(v["w"]) if weights else 1.0)
        for v in vals
        if v[from_field] is not None
    )
    if not rows:
        # empty from side matches nothing (JoinUtil returns a no-match query)
        return Q.BooleanQuery(must=(Q.MatchAllDocsQuery(),),
                              must_not=(Q.MatchAllDocsQuery(),))
    if score_mode == "none":
        return Q.TermInSetQuery(tuple(t for t, _w in rows), field=to_field)
    clauses = tuple(
        Q.ConstantScoreQuery(Q.TermQuery(t, field=to_field), boost=w)
        for t, w in rows
    )
    if score_mode == "max":
        return Q.DisjunctionMaxQuery(clauses)
    return Q.BooleanQuery(should=clauses)


def join_query(searcher, from_ds, from_field: str,
               to_field: "str | None" = None, max_terms: int = 100_000):
    """Convenience one-shot: gather + evaluate on ``searcher``; returns
    (docs, scores) hit-complete."""
    return searcher.search_all(
        create_join_query(from_ds, from_field, to_field, max_terms)
    )


def to_child_block_join(child_searcher, parent_docs, parent_scores,
                        child_id_base: int):
    """ToChildBlockJoinQuery (join/src/java/org/apache/lucene/search/join/
    ToChildBlockJoinQuery.java:41): every CHILD of a matching parent
    matches, carrying its parent's score (the reference propagates the
    parent scorer's score to each child in the block).

    The nested-doc model here is the ``child_chunks`` convention
    (data/webpages.py): ``child_id = parent_id * child_id_base + chunk``,
    so parent membership is one vectorized ``searchsorted`` over the
    sorted parent hits — no per-child Python.

    Returns (child_doc_ids, scores) sorted by child id.

    Scale note: the match-all child enumeration is driver-resident, fine
    while |parents matched| x avg-children stays collector-sized (the
    reference's ToChildBlockJoin also materializes every child hit into
    the collector). At 10^9+ children, push the sorted parent set into
    the per-segment eval (broadcast via ray.put + the member_mask kernel)
    and keep only per-segment top-k, like the filtered-kNN path.
    """
    import numpy as np

    from lucene_ray.search import query as Q

    all_children, _ = child_searcher.search_all(Q.MatchAllDocsQuery())
    order = np.argsort(all_children)
    all_children = all_children[order]
    parents_of = all_children // child_id_base

    po = np.argsort(parent_docs)
    pd = np.asarray(parent_docs)[po]
    ps = np.asarray(parent_scores)[po]
    idx = np.searchsorted(pd, parents_of)
    idx_c = np.clip(idx, 0, max(pd.shape[0] - 1, 0))
    mask = pd.shape[0] > 0
    mask = (pd[idx_c] == parents_of) if mask else np.zeros(
        parents_of.shape[0], dtype=bool)
    return all_children[mask], ps[idx_c[mask]]


def to_parent_block_join(child_docs, child_scores, child_id_base: int,
                         score_mode: str = "max"):
    """ToParentBlockJoinQuery ScoreMode aggregation
    (join/src/java/org/apache/lucene/search/join/ScoreMode.java:25 —
    None/Avg/Max/Total/Min): collapse child hits to their parents,
    aggregating child scores per parent. Vectorized: one np.unique +
    ufunc.at per mode. Returns (parent_ids, scores) sorted by parent."""
    import numpy as np

    parents = np.asarray(child_docs) // child_id_base
    up, inv = np.unique(parents, return_inverse=True)
    s = np.asarray(child_scores, dtype=np.float64)
    if score_mode == "none":
        # ScoreMode.None produces score 0 for every parent in the
        # reference (ScoreMode.java:25) — not a constant 1.
        return up, np.zeros(up.shape[0], dtype=np.float64)
    if score_mode == "max":
        out = np.full(up.shape[0], -np.inf)
        np.maximum.at(out, inv, s)
        return up, out
    if score_mode == "min":
        out = np.full(up.shape[0], np.inf)
        np.minimum.at(out, inv, s)
        return up, out
    if score_mode in ("total", "avg"):
        out = np.zeros(up.shape[0])
        np.add.at(out, inv, s)
        if score_mode == "avg":
            out = out / np.bincount(inv, minlength=up.shape[0])
        return up, out
    raise ValueError(f"unknown block-join score_mode {score_mode!r}")
