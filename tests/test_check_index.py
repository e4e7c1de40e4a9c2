"""check_index validator (index/check.py — CheckIndex.java:113 role):
clean on freshly built / merged indexes, and catches single-byte
corruption, scrambled dictionaries, and stat drift."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.check import CheckIndexError, check_index


def test_clean_on_built_index(built_index):
    rep = check_index(built_index[0])
    assert rep["doc_count"] == 500
    assert rep["segments"] >= 1
    assert rep["postings"] > 0


def test_clean_on_merged_index(built_index, tmp_path):
    from lucene_ray.index.merge import force_merge

    out = str(tmp_path / "merged")
    force_merge(built_index[0], out)
    rep = check_index(out)
    assert rep["doc_count"] == 500


def test_catches_shared_positions_corruption(built_index, tmp_path):
    """force_merge shards share ONE positions dir; the index-level check
    must validate it against the group's summed ttf — dropping a file's
    rows has to surface even though no single shard owns the dir."""
    from lucene_ray.index.merge import force_merge

    out = str(tmp_path / "merged_posfix")
    force_merge(built_index[0], out)
    pos_dir = os.path.join(out, "positions")
    if not os.path.isdir(pos_dir):
        pytest.skip("index built without positions")
    check_index(out)  # clean before corruption
    files = sorted(
        os.path.join(pos_dir, f)
        for f in os.listdir(pos_dir) if f.endswith(".parquet")
    )
    t = pq.read_table(files[0])
    assert t.num_rows > 1
    pq.write_table(t.slice(0, t.num_rows - 1), files[0])
    with pytest.raises(CheckIndexError, match="shared positions"):
        check_index(out)


@pytest.fixture()
def corruptible(built_index, tmp_path):
    """A private COPY of the shared index — with the manifest's absolute
    segment paths remapped into the copy, so corrupting it can never
    touch the session-scoped built_index (a round-3 test bug corrupted
    the original through the copied manifest's absolute paths)."""
    idx = str(tmp_path / "idx")
    shutil.copytree(built_index[0], idx)
    mp = os.path.join(idx, "manifest.json")
    m = json.load(open(mp))
    for s in m["segments"]:
        s["path"] = os.path.join(idx, "segments", os.path.basename(s["path"]))
        assert os.path.isdir(s["path"])
    with open(mp, "w") as f:
        json.dump(m, f)
    return idx


def test_catches_flipped_postings_byte(corruptible):
    m = json.load(open(os.path.join(corruptible, "manifest.json")))
    pbin = os.path.join(m["segments"][0]["path"], "postings.bin")
    # flip a byte in the middle of the payload (past the first header)
    with open(pbin, "r+b") as f:
        f.seek(os.path.getsize(pbin) // 2)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(CheckIndexError):
        check_index(corruptible)


def test_catches_unsorted_dictionary(corruptible):
    m = json.load(open(os.path.join(corruptible, "manifest.json")))
    tpath = os.path.join(m["segments"][0]["path"], "terms.parquet")
    t = pq.read_table(tpath)
    n = t.num_rows
    assert n > 2
    order = np.arange(n)
    order[0], order[1] = 1, 0  # swap two dictionary rows
    pq.write_table(t.take(order), tpath)
    with pytest.raises(CheckIndexError, match="sorted|df|ttf|stats"):
        check_index(corruptible)


def test_catches_manifest_stat_drift(corruptible):
    mp = os.path.join(corruptible, "manifest.json")
    m = json.load(open(mp))
    m["doc_count"] += 7
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(CheckIndexError, match="doc_count"):
        check_index(corruptible)


def test_catches_norm_corruption(corruptible):
    m = json.load(open(os.path.join(corruptible, "manifest.json")))
    dpath = os.path.join(m["segments"][0]["path"], "docs.parquet")
    t = pq.read_table(dpath)
    norms = t["norm"].to_numpy().copy()
    norms[0] = (norms[0] + 1) % 256
    t = t.set_column(t.schema.get_field_index("norm"), "norm",
                     __import__("pyarrow").array(norms, type=t["norm"].type))
    pq.write_table(t, dpath)
    with pytest.raises(CheckIndexError, match="norm"):
        check_index(corruptible)


def test_check_vector_index_clean_and_corrupt(ray_session, tmp_path_factory):
    """check_vector_index (CheckIndex role for the vector families):
    clean on fresh pq/sq/ivfpq/hnsw indexes; a corrupted bucket_id or
    truncated codebook is caught."""
    import glob
    import json
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from lucene_ray.index.check import CheckIndexError, check_vector_index
    from lucene_ray.index.vector import (build_ivfpq_index, build_pq_index,
                                         build_sq_index, build_vector_index)

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    base = tmp_path_factory.mktemp("vcheck")
    pq_dir = str(base / "pq")
    build_pq_index(emb, pq_dir, m=16, nbits=8)
    sq_dir = str(base / "sq")
    build_sq_index(emb, sq_dir)
    ivfpq_dir = str(base / "ivfpq")
    build_ivfpq_index(emb, ivfpq_dir, n_centroids=4, m=16)
    h_dir = str(base / "hnsw")
    build_vector_index(emb, h_dir, n_shards=2, m=8, ef_construction=32)
    for d in (pq_dir, sq_dir, ivfpq_dir, h_dir):
        rep = check_vector_index(d)
        assert rep["n_vectors"] == 500, d

    # corrupt an ivfpq bucket_id -> caught
    bad = str(base / "ivfpq_bad")
    shutil.copytree(ivfpq_dir, bad)
    man = json.load(open(f"{bad}/ivfpq_manifest.json"))
    man["buckets_dir"] = f"{bad}/pq_buckets"
    json.dump(man, open(f"{bad}/ivfpq_manifest.json", "w"))
    f = sorted(glob.glob(f"{bad}/pq_buckets/bucket=0/*.parquet"))[0]
    t = pq.read_table(f)
    wrong = pa.array(np.full(t.num_rows, 99, dtype=np.int64))
    pq.write_table(t.set_column(t.schema.get_field_index("bucket_id"),
                                "bucket_id", wrong), f)
    with pytest.raises(CheckIndexError, match="bucket_id"):
        check_vector_index(bad)

    # truncate the pq codebooks -> caught
    bad2 = str(base / "pq_bad")
    shutil.copytree(pq_dir, bad2)
    man2 = json.load(open(f"{bad2}/pq_manifest.json"))
    man2["codes_dir"] = f"{bad2}/codes"
    json.dump(man2, open(f"{bad2}/pq_manifest.json", "w"))
    books = np.load(f"{bad2}/codebooks.npy")
    np.save(f"{bad2}/codebooks.npy", books[:4])
    with pytest.raises(CheckIndexError, match="codebooks"):
        check_vector_index(bad2)


def test_check_index_validates_dv_updates(ray_session, tmp_path_factory):
    """check_index covers numeric DV update overlays: clean when ids are
    in range, caught when an update points outside the doc space."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from lucene_ray.index.build import build_index
    from lucene_ray.index.check import CheckIndexError, check_index
    from lucene_ray.index.docvalues import update_doc_values

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b", "b c", "c d"]),
        "w": pa.array([1.0, 2.0, 3.0]),
    })
    idx = str(tmp_path_factory.mktemp("dvchk") / "index")
    build_index(ray.data.from_arrow(t), idx, num_segments=1,
                features={"w": "w"})
    update_doc_values(idx, "w", [1], [9.0])
    rep = check_index(idx)
    assert rep["dv_update_files"] == 1
    update_doc_values(idx, "w", [999], [1.0])  # outside the doc space
    with pytest.raises(CheckIndexError, match="dv_updates"):
        check_index(idx)


def test_exorcise_drops_corrupt_segment_and_serves_rest(corruptible):
    """CheckIndex -exorcise (CheckIndex.java:4079 exorciseIndex): corrupt
    one segment, exorcise, and the searcher serves the remainder from
    the new commit generation — good segments untouched, doc_count and
    global stats recomputed for the survivors."""
    import numpy as np

    from lucene_ray.index.check import exorcise_index
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    m = json.load(open(os.path.join(corruptible, "manifest.json")))
    victim = m["segments"][1]
    pbin = os.path.join(victim["path"], "postings.bin")
    with open(pbin, "r+b") as f:
        f.seek(os.path.getsize(pbin) // 2)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(CheckIndexError):
        check_index(corruptible)

    rep = exorcise_index(corruptible)
    assert rep["dropped"] == [victim["path"]]
    m2 = json.load(open(os.path.join(corruptible, "manifest.json")))
    assert len(m2["segments"]) == len(m["segments"]) - 1
    assert m2["doc_count"] == m["doc_count"] - victim["doc_count"]

    check_index(corruptible)  # clean again
    s = Searcher(corruptible)
    td = s.search("table", k=10)
    assert td.total_hits > 0
    # every surviving hit lies outside the dropped segment's doc range
    lo = victim["doc_base"]
    hi = victim["doc_base"] + victim["doc_count"]
    docs, _sc = s.search_all(Q.MatchAllDocsQuery())
    assert not np.any((docs >= lo) & (docs < hi))
    # idempotent: nothing else to drop
    rep2 = exorcise_index(corruptible)
    assert rep2["dropped"] == []


def test_exorcise_drops_whole_shard_group(built_index, tmp_path):
    """Term-sharded (force_merge) segments split the DICTIONARY, not the
    doc space — dropping one corrupt shard alone would silently lose
    terms. Exorcise must drop the whole shard group (segments sharing
    docs_path)."""
    from lucene_ray.index.check import exorcise_index
    from lucene_ray.index.merge import force_merge

    idx, _ = built_index
    fm = str(tmp_path / "forced")
    force_merge(idx, fm, hot_term_df=100, salt_buckets=3,
                terms_per_shard=64)
    m = json.load(open(os.path.join(fm, "manifest.json")))
    groups = {}
    for s in m["segments"]:
        groups.setdefault(s.get("docs_path") or s["path"], []).append(s)
    gk, members = max(groups.items(), key=lambda kv: len(kv[1]))
    assert len(members) >= 2, "fixture must produce a multi-shard group"

    victim = members[0]
    pbin = os.path.join(victim["path"], "postings.bin")
    with open(pbin, "r+b") as f:
        f.seek(os.path.getsize(pbin) // 2)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))

    rep = exorcise_index(fm)
    # every member of the victim's group dropped, nothing else
    assert set(rep["dropped"]) == {s["path"] for s in members}
    m2 = json.load(open(os.path.join(fm, "manifest.json")))
    assert len(m2["segments"]) == len(m["segments"]) - len(members)
    check_index(fm)  # clean again


def test_index_info_overview(built_index):
    """Luke Overview role: metadata-only summary, consistent with the
    manifest, no postings decode."""
    from lucene_ray.index.check import index_info

    idx, m = built_index
    info = index_info(idx)
    assert info["n_segments"] == len(m["segments"])
    assert info["doc_count"] == m["doc_count"] == info["live_docs"]
    assert info["deleted_docs"] == 0
    assert info["with_positions"] is True
    assert info["postings_bytes"] > 0 and info["n_terms"] > 0
    assert info["analyzer_non_default"] == {}  # default StandardAnalyzer
    assert info["commit_points"] == [1]
