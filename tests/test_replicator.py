"""Index replication (index/replicator.py) — the nrt replicator roles
(replicator/nrt/PrimaryNode.java:52, ReplicaNode.java:63,
CopyState.java, ReplicaFileDeleter.java): full sync, idempotent no-op,
incremental delta copy after deletes, stale-file deletion after a
segment-set change, and searcher parity on every synced point."""

import os
import shutil

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.replicator import copy_state, replicate
from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def primary(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("repl") / "primary")
    build_index(SF, d, num_segments=4, with_positions=True)
    return d


def _hits(index_dir, term="table"):
    docs, scores = Searcher(index_dir, mode="f64").search_all(
        Q.TermQuery(term))
    order = np.argsort(docs)
    return docs[order], scores[order]


class TestCopyState:
    def test_enumerates_live_set(self, primary):
        st = copy_state(primary)
        assert "manifest.json" in st["files"]
        assert any(r.startswith("segments" + os.sep) for r in st["files"])
        assert st["generation"] >= 1
        assert not st["external"]


class TestReplicate:
    def test_full_sync_and_parity(self, primary, tmp_path):
        dst = str(tmp_path / "replica")
        r = replicate(primary, dst)
        assert not r["up_to_date"] and r["files_copied"] > 0
        d1, s1 = _hits(primary)
        d2, s2 = _hits(dst)
        assert np.array_equal(d1, d2)
        assert np.allclose(s1, s2)

    def test_idempotent_noop(self, primary, tmp_path):
        dst = str(tmp_path / "replica")
        replicate(primary, dst)
        r = replicate(primary, dst)
        assert r["up_to_date"] and r["files_copied"] == 0

    def test_incremental_after_delete(self, primary, tmp_path):
        # a second commit (tombstones) must copy ONLY the delta files
        work = str(tmp_path / "p2")
        shutil.copytree(primary, work)
        dst = str(tmp_path / "replica")
        full = replicate(work, dst)["files_copied"]

        from lucene_ray.index.deletes import delete_docs

        d1, _ = _hits(work)
        delete_docs(work, sorted(d1[:5].tolist()))
        r = replicate(work, dst)
        assert not r["up_to_date"]
        assert 0 < r["files_copied"] < full        # delta, not re-copy
        d2, _ = _hits(dst)
        assert d2.shape[0] == d1.shape[0] - 5
        assert np.array_equal(d2, _hits(work)[0])

    def test_stale_files_deleted(self, primary, tmp_path):
        dst = str(tmp_path / "replica")
        replicate(primary, dst)
        stale = os.path.join(dst, "segments", "seg-stale", "junk.bin")
        os.makedirs(os.path.dirname(stale))
        with open(stale, "wb") as f:
            f.write(b"x" * 16)
        # force a re-sync past the version fast-path
        os.remove(os.path.join(dst, "replica_state.json"))
        r = replicate(primary, dst)
        assert r["files_deleted"] >= 1
        assert not os.path.exists(stale)

    def test_merged_index_replicates(self, primary, tmp_path):
        from lucene_ray.index.merge import tiered_merge

        merged = str(tmp_path / "merged")
        tiered_merge(primary, merged, group_size=2)
        dst = str(tmp_path / "replica_m")
        replicate(merged, dst)
        d1, s1 = _hits(merged)
        d2, s2 = _hits(dst)
        assert np.array_equal(d1, d2) and np.allclose(s1, s2)

    def test_rejects_self_replication(self, primary):
        with pytest.raises(ValueError):
            replicate(primary, primary)
