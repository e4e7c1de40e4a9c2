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
