"""Persistent vector indexes — the Lucene99HnswVectorsFormat /
Lucene99FlatVectorsFormat write-once/serve-many model
(codecs/lucene99/Lucene99HnswVectorsFormat.java:82,
util/hnsw/HnswGraphBuilder.java:48): graphs are built ONCE at index time
as segment artifacts and served by long-lived actors that load them once
(``QueryExecutor`` model, search/executor.py) — never rebuilt per query.

Two index families:

* **HNSW** (:func:`build_vector_index` / :class:`VectorSearcher`) — each
  vector shard builds its layered graph in one Ray task and persists
  (vectors.npy mmap + CSR adjacency npz + meta.json); serving actors each
  own a disjoint set of shard graphs, answer every query locally, and the
  driver merges per-shard top-k (the per-segment search + TopDocs.merge
  shape of the text path).
* **IVF** (:func:`build_ivf_index` / :func:`ivf_search`) — the corpus is
  written ONCE as bucket-partitioned Parquet (hive layout,
  ``bucket=<c>/``), so a probe reads ONLY the probed buckets' files: the
  read prunes IO, not just compute (round-2 verdict item 2). Full-probe
  (`nprobe = n_centroids`) remains exactly equal to brute force.

Commit protocol matches the text index: write into a tmp dir, fsync-free
os.replace rename, manifest written last.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lucene_ray.pipelines.ann import (_batch_matrix, _normalize,
                                      member_mask as _member_mask,
                                      train_centroids)
from lucene_ray.pipelines.hnsw import HnswGraph

VECTOR_MANIFEST = "vector_manifest.json"


def merge_topk_table(tbl: pa.Table, k: int) -> pa.Table:
    """Reduce per-shard (query_id, neighbor_id, cosine) partials to exact
    per-query top-k with (cosine desc, id asc) tie-break — TopDocs.merge
    (search/TopDocs.java:203-228). Vectorized: ONE lexsort over all rows,
    then a run scan keeps each query's first k."""
    qids = tbl["query_id"].to_numpy()
    nids = tbl["neighbor_id"].to_numpy()
    sims = tbl["cosine"].to_numpy()
    order = np.lexsort((nids, -sims, qids))
    qids, nids, sims = qids[order], nids[order], sims[order]
    n = qids.shape[0]
    if n == 0:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })
    start_flags = np.concatenate(([True], qids[1:] != qids[:-1]))
    starts = np.nonzero(start_flags)[0]
    run_id = np.cumsum(start_flags) - 1
    pos = np.arange(n) - starts[run_id]
    keep = pos < k
    return pa.table({
        "query_id": qids[keep].astype(np.int64),
        "rank": (pos[keep] + 1).astype(np.int64),
        "neighbor_id": nids[keep].astype(np.int64),
        "cosine": sims[keep].astype(np.float64),
    })


# --------------------------------------------------------------------------
# HNSW
# --------------------------------------------------------------------------

def build_vector_index(
    embeddings: "ray.data.Dataset | str",
    out_dir: str,
    n_shards: int = 4,
    m: int = 8,
    ef_construction: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build per-shard HNSW graphs as persisted index artifacts.

    One Ray task per shard: build the graph (deterministic levels from
    splitmix64(vec_id)), ``HnswGraph.save`` into a tmp dir, rename, emit
    a metadata row. The manifest commits last (crash-safe: a reader never
    sees a half-written index)."""
    ds = (
        ray.data.read_parquet(embeddings, columns=[id_col, vec_col])
        if isinstance(embeddings, str)
        else embeddings
    )
    os.makedirs(out_dir, exist_ok=True)

    def build_shard(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64())})
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _normalize(_batch_matrix(b[vec_col]))
        g = HnswGraph(m=m, ef_construction=ef_construction)
        g.build(vecs, ids)
        # deterministic shard name (resume-friendly): min id of the shard
        name = f"vshard-{int(ids.min()):012d}-{len(ids)}"
        final = os.path.join(out_dir, name)
        if not os.path.isdir(final):
            tmp = os.path.join(out_dir, f".tmp-{name}-{uuid.uuid4().hex[:8]}")
            g.save(tmp)
            try:
                os.replace(tmp, final)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
        return pa.table({"path": [final], "n": [b.num_rows],
                         "dim": [int(vecs.shape[1])]})

    metas = (
        ds.repartition(n_shards)
        .map_batches(build_shard, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    metas.sort(key=lambda r: r["path"])
    manifest = {
        "kind": "hnsw",
        "metric": "cosine",
        "m": m,
        "ef_construction": ef_construction,
        "id_col": id_col,
        "vec_col": vec_col,
        "dim": int(metas[0]["dim"]) if metas else 0,
        "n_vectors": int(sum(r["n"] for r in metas)),
        "shards": [{"path": r["path"], "n": int(r["n"])} for r in metas],
    }
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, VECTOR_MANIFEST))
    return manifest


def _pool_search(graphs: list, qm: np.ndarray, k: int, ef: int,
                 allowed_ids: "np.ndarray | None" = None,
                 blocked_ids: "np.ndarray | None" = None):
    """Search every graph of a pool for every query — shared by the actor
    and the in-process mode so the fan-out loop exists once.
    ``allowed_ids`` (sorted global vec ids) restricts results — the
    KnnFloatVectorQuery-with-filter role; ``blocked_ids`` (sorted)
    removes tombstoned vectors."""
    out_q, out_id, out_s = [], [], []
    for g in graphs:
        mask = None
        if allowed_ids is not None:
            mask = _member_mask(allowed_ids, g.ids)
        if blocked_ids is not None and blocked_ids.shape[0]:
            live = ~_member_mask(blocked_ids, g.ids)
            mask = live if mask is None else (mask & live)
        if mask is not None and not mask.any():
            continue
        for j in range(qm.shape[0]):
            loc, sims = g.search(qm[j], k, ef, allowed=mask)
            out_q.append(np.full(loc.shape[0], j, dtype=np.int64))
            out_id.append(g.ids[loc])
            out_s.append(sims)
    if not out_q:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64))
    return (np.concatenate(out_q), np.concatenate(out_id),
            np.concatenate(out_s))


def add_vectors(
    index_dir: str,
    embeddings: "ray.data.Dataset | str",
    n_shards: int = 1,
    id_col: "str | None" = None,
    vec_col: "str | None" = None,
) -> dict:
    """Incremental vector indexing: new vectors become NEW shard graphs
    (existing shards untouched), manifest rewritten last — the same
    add-as-new-segments NRT model as ``index.build.add_documents``. Ids
    must be disjoint from the existing index."""
    with open(os.path.join(index_dir, VECTOR_MANIFEST)) as f:
        m = json.load(f)
    # new shards build into their own subdir: the sub-build's manifest
    # stays there (harmless), the LIVE manifest is only replaced by the
    # merged one below (manifest-last commit)
    add_dir = os.path.join(index_dir, f"adds-{uuid.uuid4().hex[:8]}")
    sub = build_vector_index(
        embeddings,
        add_dir,
        n_shards=n_shards,
        m=m["m"],
        ef_construction=m["ef_construction"],
        id_col=id_col or m["id_col"],
        vec_col=vec_col or m["vec_col"],
    )
    merged = dict(m)
    merged["shards"] = m["shards"] + list(sub["shards"])
    merged["n_vectors"] = int(sum(s["n"] for s in merged["shards"]))
    tmpm = os.path.join(index_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(merged, f, indent=1)
    os.replace(tmpm, os.path.join(index_dir, VECTOR_MANIFEST))
    return merged


def delete_vectors(index_dir: str, ids) -> int:
    """Tombstone vectors by id — the soft-delete model (graphs are
    immutable write-once artifacts; deleted ids are masked at search
    until a rebuild compacts them, exactly like text-segment
    tombstones). Returns the total tombstone count."""
    path = os.path.join(index_dir, "vector_tombstones.npy")
    old = (
        np.load(path) if os.path.exists(path) else np.empty(0, np.int64)
    )
    merged = np.unique(np.concatenate([
        old, np.asarray(list(ids), dtype=np.int64)
    ]))
    tmp = os.path.join(
        index_dir, f".tmp-tombs-{uuid.uuid4().hex[:8]}.npy"
    )
    np.save(tmp, merged)
    os.replace(tmp, path)
    return int(merged.shape[0])


def compact_vectors(index_dir: str, out_dir: str,
                    n_shards: "int | None" = None) -> dict:
    """Rebuild the index from its shards' LIVE vectors — the merge that
    makes tombstones physical (the text path's force_merge analog). Reads
    shard artifacts directly (never the original source), drops
    tombstoned ids, builds fresh graphs into ``out_dir``."""
    with open(os.path.join(index_dir, VECTOR_MANIFEST)) as f:
        m = json.load(f)
    tombs = _load_vector_tombstones(index_dir)
    rows = []
    for s in m["shards"]:
        g_ids = np.load(os.path.join(s["path"], "graph.npz"))["ids"]
        vecs = np.load(os.path.join(s["path"], "vectors.npy"))
        if tombs.shape[0]:
            live = ~_member_mask(tombs, g_ids)
            g_ids, vecs = g_ids[live], vecs[live]
        if g_ids.shape[0]:
            rows.append(pa.table({
                m["id_col"]: g_ids,
                m["vec_col"]: pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.astype(np.float32).ravel(), pa.float32()),
                    vecs.shape[1],
                ),
            }))
    ds = ray.data.from_arrow(rows) if rows else ray.data.from_items([])
    return build_vector_index(
        ds, out_dir,
        n_shards=n_shards or max(1, len(m["shards"])),
        m=m["m"], ef_construction=m["ef_construction"],
        id_col=m["id_col"], vec_col=m["vec_col"],
    )


def _load_vector_tombstones(index_dir: str) -> np.ndarray:
    path = os.path.join(index_dir, "vector_tombstones.npy")
    return np.load(path) if os.path.exists(path) else np.empty(0, np.int64)


@ray.remote
class VectorExecutor:
    """Owns N shard graphs; mmap'd vectors + CSR adjacency load once in
    ``__init__`` (the stateful-stage rule) — search never builds."""

    def __init__(self, shard_paths: list):
        self.graphs = [HnswGraph.load(p) for p in shard_paths]

    def search(self, qm: np.ndarray, k: int, ef: int, allowed_ids=None,
               blocked_ids=None):
        return _pool_search(self.graphs, qm, k, ef, allowed_ids, blocked_ids)

    def ping(self) -> bool:
        return True


class VectorSearcher:
    """Serve kNN from a persisted HNSW index.

    ``num_executors`` > 0: long-lived actors each own a disjoint set of
    shard graphs (load once, answer many). ``num_executors=0``: graphs
    load in the calling process — the embeddable/test mode (lets a test
    assert that NO graph build happens on the query path by stubbing
    ``HnswGraph.build``)."""

    def __init__(self, index_dir: str, num_executors: int = 2):
        with open(os.path.join(index_dir, VECTOR_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.tombstones = _load_vector_tombstones(index_dir)
        paths = [s["path"] for s in self.manifest["shards"]]
        self.local_graphs = None
        self.executors = []
        if num_executors <= 0:
            self.local_graphs = [HnswGraph.load(p) for p in paths]
        else:
            n = min(num_executors, max(1, len(paths)))
            groups = [paths[i::n] for i in range(n)]
            self.executors = [
                VectorExecutor.remote(g) for g in groups if g
            ]
            ray.get([e.ping.remote() for e in self.executors])

    def search(self, queries: np.ndarray, k: int = 10, ef: int = 64,
               allowed_ids: "np.ndarray | None" = None) -> pa.Table:
        """(query_id, rank, neighbor_id, cosine) — exact per-shard merge,
        approximate per shard (recall governed by m/ef). ``allowed_ids``
        restricts neighbors to the given global ids (filtered kNN —
        search/KnnFloatVectorQuery.java filter argument; the beam walks
        the whole graph, only allowed nodes collect)."""
        qn = _normalize(np.asarray(queries, dtype=np.float64))
        if allowed_ids is not None:
            allowed_ids = np.sort(np.asarray(allowed_ids, dtype=np.int64))
        blocked = self.tombstones if self.tombstones.shape[0] else None
        if self.local_graphs is not None:
            parts = [_pool_search(self.local_graphs, qn, k, ef, allowed_ids,
                                  blocked)]
        else:
            parts = ray.get(
                [e.search.remote(qn, k, ef, allowed_ids, blocked)
                 for e in self.executors]
            )
        if not parts:  # zero shards (all vectors deleted + compacted)
            parts = [(np.empty(0, np.int64), np.empty(0, np.int64),
                      np.empty(0, np.float64))]
        tbl = pa.table({
            "query_id": np.concatenate([p[0] for p in parts]),
            "neighbor_id": np.concatenate([p[1] for p in parts]),
            "cosine": np.concatenate([p[2] for p in parts]),
        })
        return merge_topk_table(tbl, k)


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------

def build_ivf_index(
    embeddings: "ray.data.Dataset | str",
    out_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_sample: int = 10_000,
    seed: int = 42,
    kmeans: str = "sample",
) -> dict:
    """Write the corpus ONCE as bucket-partitioned Parquet.

    Centroids train on a sample (driver-side mini k-means, broadcast via
    ``ray.put``); one assign pass tags rows; ``write_parquet`` with
    ``partition_cols=["bucket"]`` lays out ``bucket=<c>/*.parquet`` so a
    probe later reads ONLY its buckets' files — IO pruning, not just a
    compute mask. The explicit ``bucket_id`` data column survives the
    hive-partition stripping of ``bucket``."""
    ds = (
        ray.data.read_parquet(embeddings, columns=[id_col, vec_col])
        if isinstance(embeddings, str)
        else embeddings
    )
    if kmeans == "distributed":
        from lucene_ray.pipelines.ann import train_centroids_distributed

        cent = train_centroids_distributed(
            ds, n_centroids, vec_col=vec_col, seed=seed, sample=kmeans_sample
        )
    else:
        cent = train_centroids(ds, n_centroids, sample=kmeans_sample,
                               vec_col=vec_col, seed=seed)
    cent_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_batch_matrix(b[vec_col]))
        a = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            vec_col: b[vec_col],
            "bucket": a,
            "bucket_id": a,
        })

    buckets_tmp = os.path.join(out_dir, f".tmp-buckets-{uuid.uuid4().hex[:8]}")
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        buckets_tmp, partition_cols=["bucket"]
    )
    buckets_dir = os.path.join(out_dir, "buckets")
    if os.path.isdir(buckets_dir):
        shutil.rmtree(buckets_dir)
    os.replace(buckets_tmp, buckets_dir)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    manifest = {
        "kind": "ivf",
        "metric": "cosine",
        "n_centroids": int(cent.shape[0]),
        "dim": int(cent.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
        "buckets_dir": buckets_dir,
    }
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, VECTOR_MANIFEST))
    return manifest


def _bucket_dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    verbose: bool = True,
    stats: "dict | None" = None,
) -> pa.Table:
    """Probe a persisted IVF index: read ONLY the ≤ union-of-probes bucket
    partitions (pruned at the filesystem level), scan them vectorized, and
    merge per-query top-k. Logs the fraction of index bytes actually read.

    ``nprobe >= n_centroids`` probes everything — exactly equal to brute
    force over the same corpus."""
    with open(os.path.join(index_dir, VECTOR_MANIFEST)) as f:
        m = json.load(f)
    assert m["kind"] == "ivf"
    id_col, vec_col = m["id_col"], m["vec_col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, cent.shape[0])
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probed = sorted({int(b) for row in q_probe for b in row})

    buckets_dir = m["buckets_dir"]
    if not os.path.isdir(buckets_dir):  # relocated index
        buckets_dir = os.path.join(index_dir, "buckets")
    dirs = [
        os.path.join(buckets_dir, f"bucket={b}")
        for b in probed
        if os.path.isdir(os.path.join(buckets_dir, f"bucket={b}"))
    ]
    read_bytes = sum(_bucket_dir_bytes(d) for d in dirs)
    total_bytes = _bucket_dir_bytes(buckets_dir)
    frac = read_bytes / total_bytes if total_bytes else 0.0
    if stats is not None:
        stats.update(read_bytes=read_bytes, total_bytes=total_bytes,
                     fraction=frac, buckets_probed=len(dirs),
                     n_buckets=m["n_centroids"])
    if verbose:
        print(
            f"[ivf_search] probing {len(dirs)}/{m['n_centroids']} buckets: "
            f"{read_bytes}/{total_bytes} bytes ({frac:.1%}) of the index read"
        )
    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    })
    if not dirs:
        return empty

    tombs = _load_vector_tombstones(index_dir)
    q_ref = ray.put(qn)
    # inverted probe map: bucket -> array of query rows probing it, built
    # ONCE on the driver (q × nprobe) and broadcast — workers do no
    # per-query set membership at all
    bucket_queries = {}
    for j, row in enumerate(q_probe):
        for bkt in row:
            bucket_queries.setdefault(int(bkt), []).append(j)
    bucket_queries = {bkt: np.asarray(js, dtype=np.int64)
                      for bkt, js in bucket_queries.items()}
    probe_ref = ray.put(bucket_queries)
    tombs_ref = ray.put(tombs) if tombs.shape[0] else None

    def partial(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        byb = ray.get(probe_ref)
        mm = _normalize(_batch_matrix(b[vec_col]))
        ids = b[id_col].to_numpy(zero_copy_only=False)
        bks = b["bucket_id"].to_numpy(zero_copy_only=False)
        if tombs_ref is not None:  # delete_vectors applies to IVF too
            live = ~_member_mask(ray.get(tombs_ref), ids)
            mm, ids, bks = mm[live], ids[live], bks[live]
        # rows grouped by bucket (hive layout makes batches bucket-runs
        # already; the argsort is a no-op permutation then), then ONE
        # matmul per bucket against EVERY query probing it — flips the
        # old per-query isin scan into a (rows, n_queries) GEMM
        order = np.argsort(bks, kind="stable")
        ub, grp_start = np.unique(bks[order], return_index=True)
        grp_end = np.append(grp_start[1:], bks.shape[0])
        out_q, out_id, out_s = [], [], []
        for bi in range(ub.shape[0]):
            js = byb.get(int(ub[bi]))
            if js is None:
                continue
            rows = order[grp_start[bi]:grp_end[bi]]
            S = mm[rows] @ q[js].T  # (n_rows, n_js)
            ii = ids[rows]
            kk = min(k, S.shape[0])
            if S.shape[0] > kk:
                idx = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, n_js)
            else:
                idx = np.tile(np.arange(S.shape[0])[:, None], (1, js.shape[0]))
            cols = np.broadcast_to(np.arange(js.shape[0]), idx.shape)
            out_q.append(np.broadcast_to(js, idx.shape).ravel())
            out_id.append(ii[idx.ravel()])
            out_s.append(S[idx.ravel(), cols.ravel()])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_id).astype(np.int64),
            "cosine": np.concatenate(out_s),
        })

    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    parts = ray.data.read_parquet(
        files, columns=[id_col, vec_col, "bucket_id"]
    ).map_batches(partial, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [empty.drop_columns(["rank"])]
        + list(parts.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    )
    return merge_topk_table(tbl, k)


# ---------------------------------------------------------------------------
# Product quantization (PQ)
# ---------------------------------------------------------------------------

PQ_MANIFEST = "pq_manifest.json"


def _kmeans_sub(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain Lloyd k-means on a (n, dsub) sample (euclidean — the PQ
    codebook objective). Deterministic given the rng."""
    k = min(k, x.shape[0])
    cent = x[rng.choice(x.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            sel = assign == c
            if sel.any():
                cent[c] = x[sel].mean(axis=0)
    return cent


def _encode_subspaces(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Shared PQ/IVFPQ encoder: nearest codebook entry per subspace
    (``||x-c||^2 = ||x||^2 - 2x.c + ||c||^2``, argmin over c). ``books``
    is (m, 2^nbits, dim/m); returns (n, m) uint8 codes."""
    m, _ksub, dsub = books.shape
    codes = np.empty((mat.shape[0], m), dtype=np.uint8)
    for s in range(m):
        sub = mat[:, s * dsub:(s + 1) * dsub]
        d2 = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def build_pq_index(
    embeddings: "ray.data.Dataset | str",
    out_dir: str,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 65_536,
    kmeans_iters: int = 12,
    seed: int = 7,
) -> dict:
    """Product-quantization index (Jégou, Douze & Schmid, TPAMI 2011
    "Product quantization for nearest neighbor search" — the compressed
    counterpart of the reference's quantized vector formats, e.g.
    codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java:41):

      * vectors L2-normalize (cosine == inner product), split into ``m``
        subspaces of dim/m dims;
      * each subspace trains a 2^nbits-entry codebook on a driver-side
        sample (PQ codebooks are sample-trained by design — training cost
        is bounded regardless of corpus size);
      * ONE encode pass over the corpus writes (vec_id, m uint8 codes) —
        a 4-32x size reduction the ADC scan reads instead of the floats.

    Artifacts under ``out_dir``: ``codebooks.npy`` (m, 2^nbits, dim/m),
    ``codes/`` parquet, ``pq_manifest.json`` (written last, tmp+rename;
    records the source path for the exact-refine pass).
    """
    if not 1 <= nbits <= 8:
        raise ValueError(f"nbits={nbits}: codes are stored as uint8, "
                         "so nbits must be in [1, 8]")
    src_path = embeddings if isinstance(embeddings, str) else None
    ds = (
        ray.data.read_parquet(embeddings, columns=[id_col, vec_col])
        if isinstance(embeddings, str)
        else embeddings
    )
    head = ds.limit(train_sample).to_pandas()
    x = np.stack(head[vec_col].to_numpy()).astype(np.float64)
    from lucene_ray.pipelines.ann import _normalize

    x = _normalize(x)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = 1 << nbits
    rng = np.random.default_rng(seed)
    books = np.stack([
        _kmeans_sub(np.ascontiguousarray(x[:, s * dsub:(s + 1) * dsub]),
                    ksub, kmeans_iters, rng)
        for s in range(m)
    ])  # (m, <=ksub, dsub) — ragged-safe only when sample >= ksub
    books_ref = ray.put(books)

    def encode(b: pa.Table) -> pa.Table:
        bk = ray.get(books_ref)
        mm = _normalize(_batch_matrix(b[vec_col]))
        codes = _encode_subspaces(mm, bk)
        return pa.table({
            id_col: b[id_col],
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), type=pa.uint8()), m),
        })

    codes_tmp = os.path.join(out_dir, f".tmp-codes-{uuid.uuid4().hex[:8]}")
    ds.map_batches(encode, batch_format="pyarrow").write_parquet(codes_tmp)
    codes_dir = os.path.join(out_dir, "codes")
    if os.path.isdir(codes_dir):
        shutil.rmtree(codes_dir)
    os.replace(codes_tmp, codes_dir)
    np.save(os.path.join(out_dir, "codebooks.npy"), books)
    manifest = {
        "kind": "pq",
        "metric": "cosine",
        "m": m,
        "nbits": nbits,
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        "codes_dir": codes_dir,
        "source": src_path,
    }
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, PQ_MANIFEST))
    return manifest


def pq_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    refine: int = 0,
) -> pa.Table:
    """ADC (asymmetric distance computation) top-k over the PQ codes:
    per query ONE (m, 2^nbits) lookup table of subspace inner products,
    then each code batch scores with m table-gathers + a sum — the scan
    never touches a float vector. ``refine > 0`` re-ranks the top
    ``refine`` ADC candidates per query EXACTLY against the full vectors
    (one pruned pass over the manifest's source; the standard PQ+refine
    pipeline). Returns (query_id, rank, neighbor_id, cosine) like the
    other kNN surfaces."""
    from lucene_ray.pipelines.ann import _normalize, member_mask

    with open(os.path.join(index_dir, PQ_MANIFEST)) as f:
        man = json.load(f)
    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    m, id_col = man["m"], man["id_col"]
    dsub = man["dim"] // m
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    nq = qn.shape[0]
    # LUT[j, s, c] = <q_j[s], codebook[s][c]>
    lut = np.einsum("jsd,scd->jsc", qn.reshape(nq, m, dsub), books)
    lut_ref = ray.put(lut)

    def scan(b: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        codes = np.asarray(
            b["code"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False)
        ).reshape(-1, m)
        n = codes.shape[0]
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            s = np.zeros(n, dtype=np.float64)
            for sub in range(m):
                s += lt[j, sub][codes[:, sub]]
            kk = min(k + refine, n)
            idx = (np.argpartition(-s, kk - 1)[:kk]
                   if n > kk else np.arange(n))
            out_q.append(np.full(idx.shape[0], j, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_id),
            "cosine": np.concatenate(out_s),
        })

    parts = pa.concat_tables(
        ray.data.read_parquet(man["codes_dir"])
        .map_batches(scan, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    if not refine:
        return merge_topk_table(parts, k)
    return _exact_refine(man, qn, k, merge_topk_table(parts, k + refine))


def _exact_refine(man: dict, qn: np.ndarray, k: int,
                  approx: pa.Table) -> pa.Table:
    """Shared PQ/IVFPQ refine tail: exact re-rank of the ADC candidates
    with one pruned pass over the manifest's source vectors."""
    if man.get("source") is None:
        raise ValueError("refine requires a path-built index "
                         "(manifest records no source)")
    cand = np.unique(approx["neighbor_id"].to_numpy())
    from lucene_ray.pipelines.ann import knn_brute_cosine

    return knn_brute_cosine(
        ray.data.read_parquet(man["source"]), qn, k=k,
        id_col=man["id_col"], vec_col=man["vec_col"], allowed_ids=cand,
    )


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC): coarse quantizer for IO pruning + PQ residual codes
# ---------------------------------------------------------------------------

IVFPQ_MANIFEST = "ivfpq_manifest.json"


def build_ivfpq_index(
    embeddings: "ray.data.Dataset | str",
    out_dir: str,
    n_centroids: int = 8,
    m: int = 16,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 65_536,
    kmeans_iters: int = 12,
    seed: int = 7,
) -> dict:
    """IVFADC (Jégou, Douze & Schmid, TPAMI 2011 §IV): a coarse k-means
    quantizer routes each vector to a bucket (the IO-pruned partitioned
    layout of :func:`build_ivf_index`), and product quantization encodes
    the RESIDUAL ``x - centroid`` in ``m`` uint8 codes. A probe therefore
    reads only ``nprobe`` buckets' worth of 16-32x-compressed codes —
    both the IO and the scan shrink, which is the 100-TB configuration.

    ADC trick kept simple by linearity: with normalized vectors,
    ``<q, x> = <q, c_bucket> + <q, residual>`` — ONE (m, 2^nbits) LUT per
    query works for every bucket; the per-bucket constant is a dot with
    the centroid.
    """
    if not 1 <= nbits <= 8:
        raise ValueError(f"nbits={nbits}: codes are stored as uint8, "
                         "so nbits must be in [1, 8]")
    src_path = embeddings if isinstance(embeddings, str) else None
    ds = (
        ray.data.read_parquet(embeddings, columns=[id_col, vec_col])
        if isinstance(embeddings, str)
        else embeddings
    )
    from lucene_ray.pipelines.ann import _normalize, spherical_kmeans

    # ONE sample materialization feeds both the coarse quantizer and the
    # residual codebooks (review fix: this used to read the sample twice)
    head = ds.limit(train_sample).to_pandas()
    x = _normalize(np.stack(head[vec_col].to_numpy()).astype(np.float64))
    cent = spherical_kmeans(x, n_centroids, iters=10, seed=seed)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = 1 << nbits
    res = x - cent[np.argmax(x @ cent.T, axis=1)]
    rng = np.random.default_rng(seed)
    books = np.stack([
        _kmeans_sub(np.ascontiguousarray(res[:, s * dsub:(s + 1) * dsub]),
                    ksub, kmeans_iters, rng)
        for s in range(m)
    ])
    cent_ref = ray.put(cent)
    books_ref = ray.put(books)

    def assign_encode(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        bk = ray.get(books_ref)
        mm = _normalize(_batch_matrix(b[vec_col]))
        a = np.argmax(mm @ c.T, axis=1).astype(np.int64)
        codes = _encode_subspaces(mm - c[a], bk)
        return pa.table({
            id_col: b[id_col],
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), type=pa.uint8()), m),
            "bucket": a,
            "bucket_id": a,
        })

    tmp = os.path.join(out_dir, f".tmp-ivfpq-{uuid.uuid4().hex[:8]}")
    ds.map_batches(assign_encode, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"])
    buckets_dir = os.path.join(out_dir, "pq_buckets")
    if os.path.isdir(buckets_dir):
        shutil.rmtree(buckets_dir)
    os.replace(tmp, buckets_dir)
    np.save(os.path.join(out_dir, "ivfpq_centroids.npy"), cent)
    np.save(os.path.join(out_dir, "ivfpq_codebooks.npy"), books)
    manifest = {
        "kind": "ivfpq",
        "metric": "cosine",
        "n_centroids": int(cent.shape[0]),
        "m": m,
        "nbits": nbits,
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        "buckets_dir": buckets_dir,
        "source": src_path,
    }
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, IVFPQ_MANIFEST))
    return manifest


def ivfpq_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 0,
    stats: "dict | None" = None,
) -> pa.Table:
    """Probe nprobe buckets (filesystem-pruned like :func:`ivf_search`),
    ADC-scan their residual codes, optionally exact-refine the top
    candidates against the full vectors. Returns the house
    (query_id, rank, neighbor_id, cosine) table."""
    from lucene_ray.pipelines.ann import _normalize

    with open(os.path.join(index_dir, IVFPQ_MANIFEST)) as f:
        man = json.load(f)
    cent = np.load(os.path.join(index_dir, "ivfpq_centroids.npy"))
    books = np.load(os.path.join(index_dir, "ivfpq_codebooks.npy"))
    m, id_col = man["m"], man["id_col"]
    dsub = man["dim"] // m
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    nq = qn.shape[0]
    nprobe = min(nprobe, cent.shape[0])
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    probed = sorted({int(b) for row in q_probe for b in row})

    buckets_dir = man["buckets_dir"]
    if not os.path.isdir(buckets_dir):
        buckets_dir = os.path.join(index_dir, "pq_buckets")
    dirs = [os.path.join(buckets_dir, f"bucket={b}") for b in probed
            if os.path.isdir(os.path.join(buckets_dir, f"bucket={b}"))]
    if stats is not None:
        rb = sum(_bucket_dir_bytes(d) for d in dirs)
        tb = _bucket_dir_bytes(buckets_dir)
        stats.update(read_bytes=rb, total_bytes=tb,
                     fraction=rb / tb if tb else 0.0,
                     buckets_probed=len(dirs), n_buckets=man["n_centroids"])
    if not dirs:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })

    lut = np.einsum("jsd,scd->jsc", qn.reshape(nq, m, dsub), books)
    qc = qn @ cent.T  # (nq, n_centroids) — per-bucket constants
    lut_ref, qc_ref = ray.put(lut), ray.put(qc)
    bucket_queries = {}
    for j, row in enumerate(q_probe):
        for bkt in row:
            bucket_queries.setdefault(int(bkt), []).append(j)
    probe_ref = ray.put({b: np.asarray(js, dtype=np.int64)
                         for b, js in bucket_queries.items()})

    def scan(b: pa.Table) -> pa.Table:
        lt, qcs, byb = ray.get(lut_ref), ray.get(qc_ref), ray.get(probe_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        bks = b["bucket_id"].to_numpy(zero_copy_only=False)
        codes = np.asarray(
            b["code"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False)).reshape(-1, m)
        out_q, out_id, out_s = [], [], []
        for bkt in np.unique(bks):
            js = byb.get(int(bkt))
            if js is None:
                continue
            sel = bks == bkt
            cds, bids = codes[sel], ids[sel]
            n = cds.shape[0]
            for j in js:
                s = np.full(n, qcs[j, bkt], dtype=np.float64)
                for sub in range(m):
                    s += lt[j, sub][cds[:, sub]]
                kk = min(k + refine, n)
                idx = (np.argpartition(-s, kk - 1)[:kk]
                       if n > kk else np.arange(n))
                out_q.append(np.full(idx.shape[0], j, dtype=np.int64))
                out_id.append(bids[idx])
                out_s.append(s[idx])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_id),
            "cosine": np.concatenate(out_s),
        })

    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    parts = pa.concat_tables(
        ray.data.read_parquet(files, columns=[id_col, "code", "bucket_id"])
        .map_batches(scan, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    if not refine:
        return merge_topk_table(parts, k)
    return _exact_refine(man, qn, k, merge_topk_table(parts, k + refine))


# ---------------------------------------------------------------------------
# Scalar quantization (int8) — the reference's quantized vector format
# ---------------------------------------------------------------------------

SQ_MANIFEST = "sq_manifest.json"


def build_sq_index(
    embeddings: "ray.data.Dataset | str",
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    confidence: float = 0.995,
    train_sample: int = 65_536,
) -> dict:
    """Scalar-quantized vector index — the role of
    codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java:41 /
    util/quantization/ScalarQuantizer.java:47: clip each (normalized)
    component to a confidence interval of the sampled distribution, then
    linearly quantize to uint8. 4x smaller storage than float32; the
    dequantized dot is ``lo*sum(q) + scale * <q, codes>`` — one constant
    plus one scaled integer-weight matmul per batch.

    Artifacts: ``sq_codes/`` parquet (vec_id, fixed-size uint8 list),
    ``sq_manifest.json`` with (lo, scale, dim, source) written last.
    """
    src_path = embeddings if isinstance(embeddings, str) else None
    ds = (
        ray.data.read_parquet(embeddings, columns=[id_col, vec_col])
        if isinstance(embeddings, str)
        else embeddings
    )
    from lucene_ray.pipelines.ann import _normalize

    head = ds.limit(train_sample).to_pandas()
    x = _normalize(np.stack(head[vec_col].to_numpy()).astype(np.float64))
    dim = x.shape[1]
    tail = (1.0 - confidence) / 2.0
    lo = float(np.quantile(x, tail))
    hi = float(np.quantile(x, 1.0 - tail))
    scale = (hi - lo) / 255.0 if hi > lo else 1.0

    def encode(b: pa.Table) -> pa.Table:
        # two floats: closure capture beats an object-store round trip
        mm = _normalize(_batch_matrix(b[vec_col]))
        codes = np.clip(np.rint((mm - lo) / scale), 0, 255).astype(np.uint8)
        return pa.table({
            id_col: b[id_col],
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), type=pa.uint8()), dim),
        })

    tmp = os.path.join(out_dir, f".tmp-sq-{uuid.uuid4().hex[:8]}")
    ds.map_batches(encode, batch_format="pyarrow").write_parquet(tmp)
    codes_dir = os.path.join(out_dir, "sq_codes")
    if os.path.isdir(codes_dir):
        shutil.rmtree(codes_dir)
    os.replace(tmp, codes_dir)
    manifest = {
        "kind": "sq",
        "metric": "cosine",
        "dim": dim,
        "lo": lo,
        "scale": scale,
        "id_col": id_col,
        "vec_col": vec_col,
        "codes_dir": codes_dir,
        "source": src_path,
    }
    tmpm = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex[:8]}.json")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpm, os.path.join(out_dir, SQ_MANIFEST))
    return manifest


def sq_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    refine: int = 0,
) -> pa.Table:
    """Approximate cosine top-k over the int8 codes:
    ``<q, dequant(c)> = lo * sum(q) + scale * (codes @ q)`` — one matmul
    over uint8 codes per batch. ``refine`` re-ranks exactly like the PQ
    path (shared `_exact_refine`)."""
    from lucene_ray.pipelines.ann import _normalize

    with open(os.path.join(index_dir, SQ_MANIFEST)) as f:
        man = json.load(f)
    id_col = man["id_col"]
    lo, scale = man["lo"], man["scale"]
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    nq = qn.shape[0]
    qsum = qn.sum(axis=1)  # per-query constant multiplier of lo
    q_ref = ray.put((qn, qsum))

    def scan(b: pa.Table) -> pa.Table:
        q, qs = ray.get(q_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        codes = np.asarray(
            b["code"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False)).reshape(-1, man["dim"])
        sims = lo * qs[None, :] + scale * (codes.astype(np.float64) @ q.T)
        n = codes.shape[0]
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            s = sims[:, j]
            kk = min(k + refine, n)
            idx = (np.argpartition(-s, kk - 1)[:kk]
                   if n > kk else np.arange(n))
            out_q.append(np.full(idx.shape[0], j, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_id),
            "cosine": np.concatenate(out_s),
        })

    parts = pa.concat_tables(
        ray.data.read_parquet(man["codes_dir"])
        .map_batches(scan, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    if not refine:
        return merge_topk_table(parts, k)
    return _exact_refine(man, qn, k, merge_topk_table(parts, k + refine))
