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
) -> Q.Query:
    """Distributed term gather -> TermInSetQuery against ``to_field``
    (None = default field). Raises when the from side yields more than
    ``max_terms`` distinct values (the join would degenerate to a scan —
    same bound JoinUtil's terms collection implies)."""
    vals = from_ds.groupby(from_field).count().take(max_terms + 1)
    if len(vals) > max_terms:
        raise ValueError(
            f"join from-side produced > {max_terms} distinct "
            f"{from_field!r} values; raise max_terms or narrow the from query"
        )
    terms = sorted(
        str(v[from_field]) for v in vals if v[from_field] is not None
    )
    if not terms:
        # empty from side matches nothing (JoinUtil returns a no-match query)
        return Q.BooleanQuery(must=(Q.MatchAllDocsQuery(),),
                              must_not=(Q.MatchAllDocsQuery(),))
    return Q.TermInSetQuery(tuple(terms), field=to_field)


def join_query(searcher, from_ds, from_field: str,
               to_field: "str | None" = None, max_terms: int = 100_000):
    """Convenience one-shot: gather + evaluate on ``searcher``; returns
    (docs, scores) hit-complete."""
    return searcher.search_all(
        create_join_query(from_ds, from_field, to_field, max_terms)
    )
