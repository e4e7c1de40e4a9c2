"""Index splitting (misc/index/PKIndexSplitter.java:42,105)."""

import os

import numpy as np
import pytest

from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_pair(ray_session, built_index, tmp_path_factory):
    from lucene_ray.index.split import split_index

    idx, _m = built_index
    root = tmp_path_factory.mktemp("split")
    a, b = str(root / "a"), str(root / "b")
    split_index(idx, a, b, Q.TermQuery("table"))
    return idx, a, b


def test_split_partitions_docs(split_pair):
    idx, a, b = split_pair
    src, sa, sb = Searcher(idx), Searcher(a), Searcher(b)
    t, _ = src.search_all(Q.TermQuery("table"))
    da, _ = sa.search_all(Q.MatchAllDocsQuery())
    db, _ = sb.search_all(Q.MatchAllDocsQuery())
    assert set(da.tolist()) == set(t.tolist())
    assert not set(da.tolist()) & set(db.tolist())
    alln, _ = src.search_all(Q.MatchAllDocsQuery())
    assert set(da.tolist()) | set(db.tolist()) == set(alln.tolist())


def test_split_sides_are_physical_and_positional(split_pair):
    """Materialized (no tombstone overlay needed), per-side stats, and
    positions survive the split merge (phrase queries work)."""
    idx, a, b = split_pair
    src, sa = Searcher(idx), Searcher(a)
    assert not os.path.exists(os.path.join(a, "tombstones.parquet"))
    p, _ = sa.search_all(Q.PhraseQuery(("key", "value")))
    want, _ = src.search_all(Q.BooleanQuery(
        filter=(Q.PhraseQuery(("key", "value")), Q.TermQuery("table"))))
    assert set(p.tolist()) == set(want.tolist())


def test_split_excludes_source_tombstones(ray_session, tmp_path):
    """Docs already deleted in the source appear in NEITHER side (the
    reference ANDs its split mask with the source liveDocs)."""
    from lucene_ray.index.build import build_index
    from lucene_ray.index.deletes import delete_docs
    from lucene_ray.index.split import split_index

    idx = str(tmp_path / "src")
    build_index(os.path.join(SF_DIR, "documents.parquet"), idx,
                num_segments=2)
    s = Searcher(idx)
    t, _ = s.search_all(Q.TermQuery("table"))
    dead = [int(t[0]), int(t[-1]), 3]
    delete_docs(idx, dead)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    split_index(idx, a, b, Q.TermQuery("table"))
    da, _ = Searcher(a).search_all(Q.MatchAllDocsQuery())
    db, _ = Searcher(b).search_all(Q.MatchAllDocsQuery())
    both = set(da.tolist()) | set(db.tolist())
    assert not both & set(dead)
    assert len(both) == 500 - len(set(dead))
