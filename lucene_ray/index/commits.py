"""Commit points, snapshots, rollback — the segments_N generation model.

Reference semantics: every IndexWriter.commit writes a new segments_N
file (the commit point, index/SegmentInfos.java:123); the deletion
policy then prunes old generations — KeepOnlyLastCommitDeletionPolicy
by default, unless a SnapshotDeletionPolicy holds a generation alive
(index/SnapshotDeletionPolicy.java:43); DirectoryReader.listCommits
enumerates surviving points and an IndexWriter can rewind to one
(IndexWriterConfig.setIndexCommit / rollback).

The analog: ``manifest.json`` stays the live pointer the searchers
read (unchanged layout), while every commit ALSO writes
``commits/segments_<gen>.json`` plus a frozen copy of the tombstone
overlay (``commits/tombstones_<gen>.parquet`` — the liveDocs snapshot
the reference bakes into each commit). Segment data directories are
append-only (merges write NEW dirs; nothing rewrites a committed
segment in place), so an old manifest stays openable as long as its
commit point survives pruning — same invariant that makes the
reference's point-in-time commits work on an append-only Directory.

Pruning keeps the latest generation plus every snapshotted one.
``rollback`` restores manifest.json (and the tombstone overlay) from a
surviving point; later generations are dropped so the next commit
continues from the restored line.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from lucene_ray.index.deletes import TOMBSTONES

COMMITS_DIR = "commits"
_SEG_RE = re.compile(r"^segments_(\d+)\.json$")


def _commits_dir(index_dir: str) -> str:
    return os.path.join(index_dir, COMMITS_DIR)


def _snapshots_path(index_dir: str) -> str:
    return os.path.join(_commits_dir(index_dir), "snapshots.json")


def _load_snapshots(index_dir: str) -> dict:
    p = _snapshots_path(index_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {int(k): v for k, v in json.load(f).items()}

def _store_snapshots(index_dir: str, snaps: dict) -> None:
    d = _commits_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".snap-{uuid.uuid4().hex[:8]}.json")
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in sorted(snaps.items())}, f, indent=1)
    os.replace(tmp, _snapshots_path(index_dir))


def list_commits(index_dir: str) -> list[dict]:
    """Surviving commit points, oldest first — DirectoryReader.listCommits.
    Each row: generation, doc_count, n_segments, snapshotted."""
    d = _commits_dir(index_dir)
    if not os.path.isdir(d):
        return []
    snaps = _load_snapshots(index_dir)
    out = []
    for name in sorted(os.listdir(d)):
        m = _SEG_RE.match(name)
        if not m:
            continue
        gen = int(m.group(1))
        with open(os.path.join(d, name)) as f:
            man = json.load(f)
        out.append({
            "generation": gen,
            "doc_count": man.get("doc_count"),
            "n_segments": len(man.get("segments", [])),
            "snapshotted": gen in snaps,
        })
    return sorted(out, key=lambda r: r["generation"])


def latest_generation(index_dir: str) -> int:
    d = _commits_dir(index_dir)
    if not os.path.isdir(d):
        return 0
    gens = [int(m.group(1)) for m in map(_SEG_RE.match, os.listdir(d)) if m]
    return max(gens) if gens else 0


def prepare_commit(index_dir: str, manifest: dict) -> int:
    """Phase 1 of the two-phase commit — IndexWriter.prepareCommit
    (index/IndexWriter.java:3509): write the would-be commit point as
    ``pending_segments_<gen>.json`` plus the frozen tombstone overlay,
    fully durable but INVISIBLE (manifest.json untouched; searchers and
    ``list_commits`` ignore pendings). Finish with
    :func:`finish_commit` or abandon with :func:`abort_commit`.
    Returns the pending generation."""
    d = _commits_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    # allocate past committed AND pending generations, so two sequential
    # prepares never collide on a number
    pend = [int(m.group(1)) for m in (
        re.match(r"^pending_segments_(\d+)\.json$", n) for n in os.listdir(d)
    ) if m]
    gen = max([latest_generation(index_dir)] + pend) + 1
    manifest = dict(manifest)
    manifest["generation"] = gen
    blob = json.dumps(manifest, indent=1)

    tmp = os.path.join(d, f".seg-{uuid.uuid4().hex[:8]}.json")
    with open(tmp, "w") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(d, f"pending_segments_{gen}.json"))

    # freeze the delete overlay into the commit (the liveDocs the
    # reference writes per commit)
    tpath = os.path.join(index_dir, TOMBSTONES)
    if os.path.exists(tpath):
        ttmp = os.path.join(d, f".tomb-{uuid.uuid4().hex[:8]}")
        shutil.copyfile(tpath, ttmp)
        os.replace(ttmp, os.path.join(d, f"tombstones_{gen}.parquet"))
    return gen


def finish_commit(index_dir: str, gen: int) -> dict:
    """Phase 2 — IndexWriter.commit after prepareCommit: one atomic
    rename makes the pending point the real one, manifest.json swings to
    it, old unsnapshotted generations prune."""
    d = _commits_dir(index_dir)
    pending = os.path.join(d, f"pending_segments_{gen}.json")
    if not os.path.exists(pending):
        raise ValueError(f"no pending commit {gen} under {d!r}")
    with open(pending) as f:
        blob = f.read()
    os.replace(pending, os.path.join(d, f"segments_{gen}.json"))
    mtmp = os.path.join(index_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(mtmp, "w") as f:
        f.write(blob)
    os.replace(mtmp, os.path.join(index_dir, "manifest.json"))
    _prune(index_dir, keep=gen)
    return json.loads(blob)


def abort_commit(index_dir: str, gen: int) -> None:
    """Drop a prepared-but-unfinished commit (IndexWriter.rollback of a
    pending prepareCommit); the visible state never changed."""
    d = _commits_dir(index_dir)
    for name in (f"pending_segments_{gen}.json",
                 f"tombstones_{gen}.parquet"):
        try:
            os.remove(os.path.join(d, name))
        except FileNotFoundError:
            pass


def commit_manifest(index_dir: str, manifest: dict) -> dict:
    """Write the next commit point and swing manifest.json to it — the
    one-shot IndexWriter.commit (prepareCommit + finish in one call).
    Returns the manifest with its generation stamped. Prunes
    unsnapshotted older generations afterwards
    (KeepOnlyLastCommitDeletionPolicy + SnapshotDeletionPolicy)."""
    gen = prepare_commit(index_dir, manifest)
    return finish_commit(index_dir, gen)


def _prune(index_dir: str, keep: int) -> None:
    snaps = _load_snapshots(index_dir)
    d = _commits_dir(index_dir)
    for name in os.listdir(d):
        m = _SEG_RE.match(name) or re.match(r"^tombstones_(\d+)\.parquet$", name)
        if not m:
            continue
        gen = int(m.group(1))
        if gen != keep and gen not in snaps:
            try:
                os.remove(os.path.join(d, name))
            except FileNotFoundError:
                pass
    # versioned global-stats dirs referenced by no surviving commit are
    # unreferenced files — reclaim them (IndexFileDeleter's refcounting)
    live = set()
    for name in os.listdir(d):
        if _SEG_RE.match(name):
            try:
                with open(os.path.join(d, name)) as f:
                    live.add(json.load(f).get("stats_dir", "global_terms"))
            except (OSError, json.JSONDecodeError):
                live.add("global_terms")
    for name in os.listdir(index_dir):
        if name.startswith("global_terms-") and name not in live:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)


def snapshot(index_dir: str) -> int:
    """Pin the current generation — SnapshotDeletionPolicy.snapshot.
    Returns the pinned generation (survives later commits' pruning)."""
    gen = latest_generation(index_dir)
    if gen == 0:
        raise ValueError(f"no commit points under {index_dir!r} to snapshot")
    snaps = _load_snapshots(index_dir)
    snaps[gen] = {"refs": snaps.get(gen, {}).get("refs", 0) + 1}
    _store_snapshots(index_dir, snaps)
    return gen


def release_snapshot(index_dir: str, gen: int) -> None:
    """Drop a pin — SnapshotDeletionPolicy.release. The generation's
    files are reclaimed at the NEXT commit (same deferred deletion as
    the reference's deletion policy)."""
    snaps = _load_snapshots(index_dir)
    if gen not in snaps:
        raise ValueError(f"generation {gen} is not snapshotted")
    snaps[gen]["refs"] -= 1
    if snaps[gen]["refs"] <= 0:
        del snaps[gen]
    _store_snapshots(index_dir, snaps)


def rollback(index_dir: str, gen: int) -> dict:
    """Rewind the live index to commit point ``gen`` — the
    IndexWriterConfig.setIndexCommit(open-from-commit) + rollback path.
    Restores manifest.json and the tombstone overlay from the point;
    commit points NEWER than ``gen`` are dropped (their segment dirs
    stay on disk — unreferenced files, reclaimable by a later cleanup,
    exactly like unreferenced files after the reference's rollback)."""
    d = _commits_dir(index_dir)
    src = os.path.join(d, f"segments_{gen}.json")
    if not os.path.exists(src):
        raise ValueError(
            f"commit point {gen} not found under {d!r} "
            f"(surviving: {[c['generation'] for c in list_commits(index_dir)]})"
        )
    with open(src) as f:
        blob = f.read()
    mtmp = os.path.join(index_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(mtmp, "w") as f:
        f.write(blob)
    os.replace(mtmp, os.path.join(index_dir, "manifest.json"))

    tsrc = os.path.join(d, f"tombstones_{gen}.parquet")
    tdst = os.path.join(index_dir, TOMBSTONES)
    if os.path.exists(tsrc):
        ttmp = os.path.join(index_dir, f".tmp-tomb-{uuid.uuid4().hex[:8]}")
        shutil.copyfile(tsrc, ttmp)
        os.replace(ttmp, tdst)
    elif os.path.exists(tdst):
        os.remove(tdst)  # the commit predates every delete

    # newer UNSNAPSHOTTED points die with the rollback; a snapshotted one
    # stays pinned (and openable via Searcher(commit=...)) until released,
    # so generation numbering continues past it and never aliases
    snaps = _load_snapshots(index_dir)
    for c in list_commits(index_dir):
        g = c["generation"]
        if g > gen and g not in snaps:
            for name in (f"segments_{g}.json", f"tombstones_{g}.parquet"):
                try:
                    os.remove(os.path.join(d, name))
                except FileNotFoundError:
                    pass
    return json.loads(blob)
