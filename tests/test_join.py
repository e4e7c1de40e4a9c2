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


def test_to_child_block_join(ray_session, tmp_path_factory):
    """ToChildBlockJoinQuery (join/ToChildBlockJoinQuery.java:41): children
    of matching parents, each carrying the parent's score; empty parent
    set -> empty result."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.data.webpages import CHILD_ID_BASE, child_chunks
    from lucene_ray.index.build import build_index
    from lucene_ray.search.join import to_child_block_join
    from lucene_ray.search.searcher import Searcher

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "a b c d e f",          # 2 chunks
            "g h i j",              # 1 chunk
            "k l m n o p q r s",    # 3 chunks
        ]),
    })
    idx = str(tmp_path_factory.mktemp("tcbj") / "chunks")
    ds = ray.data.from_arrow(t).map_batches(child_chunks,
                                            batch_format="pyarrow")
    build_index(ds.select_columns(["doc_id", "text"]), idx, num_segments=1)
    cs = Searcher(idx)
    # parents 0 and 2 matched with scores 1.5 / 2.5
    cdocs, cscores = to_child_block_join(
        cs, np.array([0, 2]), np.array([1.5, 2.5]), CHILD_ID_BASE)
    want = {0: 1.5, 1: 1.5, 200: 2.5, 201: 2.5, 202: 2.5}
    assert dict(zip(cdocs.tolist(), cscores.tolist())) == want
    # no matching parents
    c2, s2 = to_child_block_join(cs, np.array([], dtype=np.int64),
                                 np.array([]), CHILD_ID_BASE)
    assert c2.shape[0] == 0 and s2.shape[0] == 0


def test_to_parent_block_join_score_modes():
    """ScoreMode None/Max/Min/Total/Avg (join/ScoreMode.java:25) over a
    tiny hand-checked child hit list."""
    import numpy as np

    from lucene_ray.search.join import to_parent_block_join

    cd = np.array([0, 1, 200, 201, 202])  # parents 0 (x2), 2 (x3)
    cs = np.array([1.0, 3.0, 2.0, 4.0, 6.0])
    for mode, want in {
        "none": {0: 0.0, 2: 0.0},  # ScoreMode.None = score 0 per parent
        "max": {0: 3.0, 2: 6.0},
        "min": {0: 1.0, 2: 2.0},
        "total": {0: 4.0, 2: 12.0},
        "avg": {0: 2.0, 2: 4.0},
    }.items():
        up, sc = to_parent_block_join(cd, cs, 100, score_mode=mode)
        assert dict(zip(up.tolist(), sc.tolist())) == want, mode
