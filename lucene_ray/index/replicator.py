"""Index replication — the role of the reference's replicator module
(lucene/replicator/src/java/org/apache/lucene/replicator/nrt/
PrimaryNode.java:52, ReplicaNode.java:63, CopyState.java,
FileMetaData.java, CopyJob.java:37, CopyOneFile.java:30,
ReplicaFileDeleter.java).

Reference semantics: the primary publishes a *CopyState* — the exact
file set (name, length, checksum) of its latest searchable point —
and each replica diffs that against its own directory, copies only
the files it is missing (CopyJob / CopyOneFile), then atomically cuts
its searcher over to the new point; ReplicaFileDeleter drops files no
longer referenced by any point. Index files are immutable once
written, which is what makes skip-by-identity sound.

The analog over this engine's layout: a searchable point is
``manifest.json`` (always written last) referencing immutable segment
directories, a global-stats directory, optional ``tombstones.parquet``
/ ``dv_updates/`` overlays, and ``commits/`` generation files
(index/commits.py). :func:`copy_state` enumerates that live file set;
:func:`replicate` performs one ReplicaNode sync:

* **skip-copy** any replica file whose (relative path, size) already
  matches — segment payloads never change in place, so this is the
  FileMetaData identity check (JSON metadata files are always
  refreshed instead: they are tiny and the replica rewrites their
  embedded absolute paths);
* **copy** everything else file-by-file on a thread pool (file IO
  releases the GIL — the CopyJob role; each file lands tmp+rename so
  a torn sync never leaves a partial file under its final name);
* **activate** by rewriting the manifest's absolute paths to the
  replica root and writing ``manifest.json`` last (the searcher
  cut-over);
* **delete** stale replica files that the new point no longer
  references (the ReplicaFileDeleter role).

Scale story: the protocol is pull-based and idempotent — each replica
node (or Ray actor pool refreshing its serving directory) runs
``replicate()`` against shared storage on its own schedule; a failed
sync resumes by re-diffing, and the manifest-last activation means a
reader never observes a half-copied point.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from concurrent.futures import ThreadPoolExecutor

from lucene_ray.index.build import stats_path

_STATE_FILE = "replica_state.json"
_MANIFEST = "manifest.json"


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            out.append(os.path.join(dirpath, n))
    return out


def copy_state(index_dir: str) -> dict:
    """Enumerate the live file set of the index's current searchable
    point (the CopyState role): ``{"version", "generation", "files":
    {relpath: size}, "external": {abspath: size}}``. ``files`` are
    under the index root; ``external`` are segment payloads a merged
    manifest references outside it (shared ``docs_path`` /
    ``positions_path`` of term-sharded merges)."""
    index_dir = os.path.abspath(index_dir)
    mpath = os.path.join(index_dir, _MANIFEST)
    with open(mpath, "rb") as f:
        raw = f.read()
    manifest = json.loads(raw)

    from lucene_ray.index.commits import latest_generation

    files: dict[str, int] = {}
    external: dict[str, int] = {}

    def _add(path: str) -> None:
        path = os.path.abspath(path)
        size = os.path.getsize(path)
        if path.startswith(index_dir + os.sep):
            files[os.path.relpath(path, index_dir)] = size
        else:
            external[path] = size

    _add(mpath)
    for extra in ("tombstones.parquet",):
        p = os.path.join(index_dir, extra)
        if os.path.exists(p):
            _add(p)
    for d in ("commits", "dv_updates"):
        p = os.path.join(index_dir, d)
        if os.path.isdir(p):
            for f2 in _walk_files(p):
                _add(f2)
    sp = stats_path(index_dir, manifest)
    if os.path.isdir(sp):
        for f2 in _walk_files(sp):
            _add(f2)
    for seg in manifest.get("segments", []):
        if os.path.isdir(seg["path"]):
            for f2 in _walk_files(seg["path"]):
                _add(f2)
        for key in ("docs_path", "positions_path"):
            p = seg.get(key)
            if p and os.path.exists(p):
                _add(p)
    return {
        "version": hashlib.sha1(raw).hexdigest(),
        "generation": latest_generation(index_dir),
        "files": files,
        "external": external,
    }


def _rewrite_paths(obj, src: str, dst: str):
    """Recursively rewrite absolute source-root path prefixes in a JSON
    value to the replica root (the replica's manifest must reference
    ITS files — ReplicaNode keeps its own directory, not the
    primary's)."""
    if isinstance(obj, str):
        if obj.startswith(src + os.sep) or obj == src:
            return dst + obj[len(src):]
        return obj
    if isinstance(obj, list):
        return [_rewrite_paths(v, src, dst) for v in obj]
    if isinstance(obj, dict):
        return {k: _rewrite_paths(v, src, dst) for k, v in obj.items()}
    return obj


def _copy_one(src_file: str, dst_file: str) -> int:
    """CopyOneFile role: tmp + rename so a torn copy never occupies the
    final name."""
    os.makedirs(os.path.dirname(dst_file), exist_ok=True)
    tmp = f"{dst_file}.tmp-{uuid.uuid4().hex[:8]}"
    shutil.copyfile(src_file, tmp)
    os.replace(tmp, dst_file)
    return os.path.getsize(dst_file)


def replicate(source_dir: str, replica_dir: str, *, max_workers: int = 8,
              delete_stale: bool = True) -> dict:
    """One ReplicaNode sync session against the source's current
    searchable point. Idempotent: an up-to-date replica is a version
    check + no-op; a torn previous sync re-diffs and resumes. Returns
    ``{"generation", "version", "files_copied", "bytes_copied",
    "files_skipped", "files_deleted", "up_to_date"}``."""
    src = os.path.abspath(source_dir)
    dst = os.path.abspath(replica_dir)
    if src == dst:
        raise ValueError("replica_dir must differ from source_dir")
    state = copy_state(src)

    state_path = os.path.join(dst, _STATE_FILE)
    if os.path.exists(state_path) and os.path.exists(
            os.path.join(dst, _MANIFEST)):
        with open(state_path) as f:
            if json.load(f).get("version") == state["version"]:
                return {"generation": state["generation"],
                        "version": state["version"], "files_copied": 0,
                        "bytes_copied": 0,
                        "files_skipped": len(state["files"]),
                        "files_deleted": 0, "up_to_date": True}

    os.makedirs(dst, exist_ok=True)
    # external payloads mirror under external/<sha1(dir)>/<basename>
    ext_map: dict[str, str] = {}
    for p in state["external"]:
        tag = hashlib.sha1(os.path.dirname(p).encode()).hexdigest()[:12]
        ext_map[p] = os.path.join("external", tag, os.path.basename(p))

    jobs: list[tuple[str, str, bool]] = []   # (src_abs, rel, is_json)
    for rel, size in state["files"].items():
        if rel == _MANIFEST:
            continue                          # activation file: written last
        is_json = rel.endswith(".json")
        dfile = os.path.join(dst, rel)
        if not is_json and os.path.exists(dfile) \
                and os.path.getsize(dfile) == size:
            continue                          # FileMetaData identity match
        jobs.append((os.path.join(src, rel), rel, is_json))
    for p, rel in ext_map.items():
        dfile = os.path.join(dst, rel)
        if os.path.exists(dfile) and os.path.getsize(dfile) == state["external"][p]:
            continue
        jobs.append((p, rel, False))

    copied = bytes_copied = 0

    def _run(job) -> int:
        sfile, rel, is_json = job
        dfile = os.path.join(dst, rel)
        if is_json:
            # metadata: rewrite embedded absolute paths for the replica
            with open(sfile) as f:
                val = json.load(f)
            val = _rewrite_paths(val, src, dst)
            for p, erel in ext_map.items():
                val = _rewrite_paths(val, os.path.dirname(p),
                                     os.path.dirname(os.path.join(dst, erel)))
            os.makedirs(os.path.dirname(dfile), exist_ok=True)
            tmp = f"{dfile}.tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(val, f)
            os.replace(tmp, dfile)
            return os.path.getsize(dfile)
        return _copy_one(sfile, dfile)

    if jobs:
        with ThreadPoolExecutor(max_workers=max(1, max_workers)) as ex:
            for n in ex.map(_run, jobs):
                copied += 1
                bytes_copied += n

    # activate: manifest rewritten + written LAST (searcher cut-over)
    with open(os.path.join(src, _MANIFEST)) as f:
        manifest = json.load(f)
    manifest = _rewrite_paths(manifest, src, dst)
    for p, erel in ext_map.items():
        manifest = _rewrite_paths(manifest, os.path.dirname(p),
                                  os.path.dirname(os.path.join(dst, erel)))
    tmp = os.path.join(dst, f".{_MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(dst, _MANIFEST))

    # ReplicaFileDeleter: drop replica files the new point doesn't own
    deleted = 0
    keep = set(state["files"]) | set(ext_map.values()) \
        | {_STATE_FILE, _MANIFEST}
    if delete_stale:
        for f2 in _walk_files(dst):
            rel = os.path.relpath(f2, dst)
            if rel not in keep:
                os.remove(f2)
                deleted += 1
        for dirpath, _dirs, _names in os.walk(dst, topdown=False):
            if dirpath != dst:
                try:
                    os.rmdir(dirpath)          # only empties removable
                except OSError:
                    pass

    tmp = os.path.join(dst, f".{_STATE_FILE}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"version": state["version"],
                   "generation": state["generation"],
                   "source": src}, f)
    os.replace(tmp, state_path)

    return {"generation": state["generation"], "version": state["version"],
            "files_copied": copied, "bytes_copied": bytes_copied,
            "files_skipped": len(state["files"]) + len(ext_map) - copied - 1,
            "files_deleted": deleted, "up_to_date": False}
