"""Query-time join (search/join.py — JoinUtil.createJoinQuery role)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def test_join_query_filters_to_side(built_index):
    """Values gathered from the from side become a TermInSetQuery; hits
    are exactly the docs containing any gathered value."""
    from lucene_ray.search.join import create_join_query, join_query
    from lucene_ray.search.searcher import Searcher

    s = Searcher(built_index[0])
    from_ds = _ds({"val": ["scan", "scan", "window"]})
    q = create_join_query(from_ds, "val")
    assert sorted(q.terms) == ["scan", "window"]
    docs, scores = join_query(s, from_ds, "val")
    brute_docs, _ = s.search_all(
        __import__("lucene_ray.search.query", fromlist=["q"]).TermInSetQuery(
            ("scan", "window")
        )
    )
    assert np.array_equal(np.sort(docs), np.sort(brute_docs))
    assert np.all(scores == 1.0)


def test_join_query_empty_from_side(built_index):
    from lucene_ray.search.join import join_query
    from lucene_ray.search.searcher import Searcher

    s = Searcher(built_index[0])
    docs, _sc = join_query(s, _ds({"val": pa.array([], pa.string())}), "val")
    assert docs.shape[0] == 0


def test_join_query_max_terms_bound(built_index):
    from lucene_ray.search.join import create_join_query

    many = _ds({"val": [f"v{i}" for i in range(50)]})
    with pytest.raises(ValueError, match="distinct"):
        create_join_query(many, "val", max_terms=10)
