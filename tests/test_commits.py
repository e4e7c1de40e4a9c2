"""Commit points, snapshots, rollback (index/commits.py) — the
segments_N + SnapshotDeletionPolicy + rollback model
(index/SegmentInfos.java:123, index/SnapshotDeletionPolicy.java:43)."""

import os

import numpy as np
import pytest

from lucene_ray.index.build import add_documents, build_index
from lucene_ray.index.commits import (
    latest_generation,
    list_commits,
    release_snapshot,
    rollback,
    snapshot,
)
from lucene_ray.index.deletes import delete_docs
from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher


@pytest.fixture()
def docs_path(sf_dir):
    return os.path.join(sf_dir, "documents.parquet")


def test_commit_generations_and_rollback(tmp_path, docs_path, ray_session):
    idx = str(tmp_path / "idx")
    build_index(docs_path, idx, num_segments=2)
    assert latest_generation(idx) == 1
    base_docs, base_scores = Searcher(idx).search_all(Q.TermQuery("table"))
    n0 = Searcher(idx).count(Q.MatchAllDocsQuery())

    # keep-only-last pruning unless snapshotted
    g1 = snapshot(idx)
    assert g1 == 1

    import ray.data

    extra = ray.data.from_items(
        [{"doc_id": 10_000 + i, "text": "brand new table doc"} for i in range(6)]
    )
    add_documents(extra, idx, num_segments=1)
    commits = list_commits(idx)
    assert [c["generation"] for c in commits] == [1, 2]
    assert commits[0]["snapshotted"] and not commits[1]["snapshotted"]
    assert Searcher(idx).count(Q.MatchAllDocsQuery()) == n0 + 6

    delete_docs(idx, [int(base_docs[0])])
    assert latest_generation(idx) == 3
    # gen 2 was pruned at the gen-3 commit; the snapshot held gen 1
    assert [c["generation"] for c in list_commits(idx)] == [1, 3]
    d3, _ = Searcher(idx).search_all(Q.TermQuery("table"))
    assert int(base_docs[0]) not in d3.tolist()

    # point-in-time reader on the pinned commit: original corpus, the
    # later add and delete both invisible (DirectoryReader.open(commit))
    pit = Searcher(idx, commit=g1)
    assert pit.count(Q.MatchAllDocsQuery()) == n0
    d_pit, sc_pit = pit.search_all(Q.TermQuery("table"))
    np.testing.assert_array_equal(d_pit, base_docs)
    np.testing.assert_allclose(sc_pit, base_scores)
    with pytest.raises(ValueError):
        Searcher(idx, commit=77)

    # rewind to the snapshotted point: original corpus, no tombstones
    rollback(idx, g1)
    s = Searcher(idx)
    assert s.count(Q.MatchAllDocsQuery()) == n0
    d, sc = s.search_all(Q.TermQuery("table"))
    np.testing.assert_array_equal(d, base_docs)
    np.testing.assert_allclose(sc, base_scores)
    assert [c["generation"] for c in list_commits(idx)] == [1]

    # history continues from the restored line
    add_documents(extra, idx, num_segments=1)
    assert latest_generation(idx) == 2
    assert Searcher(idx).count(Q.MatchAllDocsQuery()) == n0 + 6

    # released snapshots are reclaimed at the next commit
    release_snapshot(idx, g1)
    delete_docs(idx, [int(base_docs[-1])])
    assert [c["generation"] for c in list_commits(idx)] == [3]

    with pytest.raises(ValueError):
        rollback(idx, 99)
    with pytest.raises(ValueError):
        release_snapshot(idx, 99)


def test_snapshot_refcounts(tmp_path, docs_path, ray_session):
    idx = str(tmp_path / "idx")
    build_index(docs_path, idx, num_segments=1)
    a, b = snapshot(idx), snapshot(idx)
    assert a == b == 1
    release_snapshot(idx, a)
    # still pinned by the second ref
    delete_docs(idx, [0])
    assert [c["generation"] for c in list_commits(idx)] == [1, 2]
    release_snapshot(idx, b)
    delete_docs(idx, [1])
    assert [c["generation"] for c in list_commits(idx)] == [3]


def test_two_phase_commit(tmp_path, docs_path, ray_session):
    """prepareCommit / commit / abort (index/IndexWriter.java:3509): a
    prepared point is durable but invisible until finished; aborting
    leaves the visible state untouched."""
    import json

    from lucene_ray.index.commits import (abort_commit, finish_commit,
                                          prepare_commit)

    idx = str(tmp_path / "idx")
    build_index(docs_path, idx, num_segments=1)
    with open(os.path.join(idx, "manifest.json")) as f:
        m = json.load(f)

    g = prepare_commit(idx, dict(m, doc_count=m["doc_count"]))
    assert g == 2
    # invisible: live pointer and commit list unchanged
    assert Searcher(idx).doc_count == m["doc_count"]
    assert [c["generation"] for c in list_commits(idx)] == [1]
    assert latest_generation(idx) == 1
    # a second prepare never reuses the pending number
    g2 = prepare_commit(idx, m)
    assert g2 == g + 1
    abort_commit(idx, g2)

    out = finish_commit(idx, g)
    assert out["generation"] == g
    assert [c["generation"] for c in list_commits(idx)] == [g]

    with pytest.raises(ValueError):
        finish_commit(idx, 99)


def test_string_dv_updates_overlay_and_check(tmp_path, ray_session, sf_dir):
    """Round-4 (IndexWriter.updateBinaryDocValue, IndexWriter.java:1940):
    string doc values index as sdv_<name> columns, update generations
    overlay later-wins at read, and check_index validates the files."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index
    from lucene_ray.index.check import check_index
    from lucene_ray.index.docvalues import update_string_doc_values
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "sdv")
    build_index(docs, idx, num_segments=2, string_values={"src": "source"})

    ids = pq.read_table(docs, columns=["doc_id"])["doc_id"].to_numpy()
    sel = ids[ids % 5 == 0]
    update_string_doc_values(idx, "src", sel, ["gen0"] * sel.shape[0])
    sel2 = ids[ids % 10 == 0]
    update_string_doc_values(idx, "src", sel2, ["gen1"] * sel2.shape[0])

    s = Searcher(idx)
    t = s.string_doc_values_counts(Q.MatchAllDocsQuery(), "src")
    got = dict(zip(t["value"].to_pylist(), t["count"].to_pylist()))
    n0 = int(((ids % 5 == 0) & (ids % 10 != 0)).sum())
    n1 = int((ids % 10 == 0).sum())
    assert got.get("gen0", 0) == n0  # gen1 overwrote the doubles
    assert got.get("gen1", 0) == n1
    assert sum(got.values()) == ids.shape[0]

    rep = check_index(idx)
    assert rep["dv_update_files"] == 2
