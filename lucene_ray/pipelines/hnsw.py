"""HNSW approximate nearest neighbor — the Lucene99HnswVectorsFormat role
(codecs/lucene99/Lucene99HnswVectorsFormat.java, util/hnsw/HnswGraph.java):
a layered navigable-small-world graph per vector shard.

Ray-Data topology: vectors repartition into shards; each shard builds its
OWN graph inside one task (the per-leaf graph model — Lucene builds one
HNSW per segment) and answers every query locally; per-shard top-k merge
on the driver (exactly the per-segment search + TopDocs.merge shape the
text path uses). Adding shards scales corpus size; each graph stays
RAM-local to its task/actor.

The graph math is numpy-vectorized per step (distance batches), with a
Python loop per inserted node — fine for segment-sized shards (10^5-10^6
vectors); the IVF pipeline remains the bulk-throughput alternative.
Determinism: node levels derive from splitmix64(vec_id), not an RNG, so
rebuilds are identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from lucene_ray.pipelines.ann import _batch_matrix, _normalize


class HnswGraph:
    """Layered NSW graph over unit vectors (cosine = dot).

    After ``build`` the adjacency finalizes to per-level CSR arrays
    (``indptr``/``indices``) — plain numpy, so a built graph persists as
    a segment artifact (``save``/``load``) exactly like a postings blob:
    the Lucene99HnswVectorsFormat write-once/mmap-many model
    (codecs/lucene99/Lucene99HnswVectorsFormat.java:82). ``load`` memory-
    maps the vector matrix; nothing is rebuilt at query time."""

    def __init__(self, m: int = 8, ef_construction: int = 48) -> None:
        self.m = m
        self.ef = ef_construction
        self.vecs: np.ndarray | None = None
        self.ids: np.ndarray | None = None
        self.levels: np.ndarray | None = None
        self.neighbors: list[list[np.ndarray]] = []  # build-time dynamic adj
        self.indptr: "list[np.ndarray] | None" = None  # per-level CSR
        self.indices: "list[np.ndarray] | None" = None
        self.entry = 0
        self.max_level = 0

    def _nbrs(self, c: int, level: int) -> np.ndarray:
        if self.indices is not None:
            ip = self.indptr[level]
            return self.indices[level][ip[c]:ip[c + 1]]
        return self.neighbors[c][level]

    def _to_csr(self) -> None:
        """Freeze the dynamic adjacency into per-level CSR (build-time
        only; the per-node loop here is amortized into the insert loop's
        cost and never runs on the query path)."""
        n = 0 if self.levels is None else self.levels.shape[0]
        self.indptr, self.indices = [], []
        for lev in range(self.max_level + 1):
            counts = np.zeros(n, dtype=np.int64)
            chunks = []
            for i in range(n):
                if self.levels[i] >= lev:
                    nb = self.neighbors[i][lev]
                    counts[i] = nb.shape[0]
                    chunks.append(nb)
            self.indptr.append(np.concatenate(([0], np.cumsum(counts))))
            self.indices.append(
                np.concatenate(chunks) if chunks else np.empty(0, np.int64)
            )
        self.neighbors = []

    def save(self, path: str) -> None:
        """Persist as a vector-segment artifact (tmp+rename per file pair;
        caller owns the directory-level atomic commit)."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "vectors.npy"),
                np.asarray(self.vecs, dtype=np.float32))
        np.savez(
            os.path.join(path, "graph.npz"),
            ids=np.asarray(self.ids, dtype=np.int64),
            levels=np.asarray(self.levels, dtype=np.int64),
            **{f"indptr_{l}": self.indptr[l] for l in range(len(self.indptr))},
            **{f"indices_{l}": self.indices[l] for l in range(len(self.indices))},
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"m": self.m, "ef_construction": self.ef,
                       "entry": int(self.entry), "max_level": int(self.max_level),
                       "n": int(0 if self.levels is None else self.levels.shape[0])}, f)

    @classmethod
    def load(cls, path: str) -> "HnswGraph":
        """mmap the vectors, load the CSR adjacency — no build."""
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        g = cls(m=meta["m"], ef_construction=meta["ef_construction"])
        g.entry = meta["entry"]
        g.max_level = meta["max_level"]
        g.vecs = np.load(os.path.join(path, "vectors.npy"), mmap_mode="r")
        z = np.load(os.path.join(path, "graph.npz"))
        g.ids = z["ids"]
        g.levels = z["levels"]
        g.indptr = [z[f"indptr_{l}"] for l in range(g.max_level + 1)]
        g.indices = [z[f"indices_{l}"] for l in range(g.max_level + 1)]
        return g

    @staticmethod
    def _level_of(ids: np.ndarray, m: int) -> np.ndarray:
        """Deterministic exponential levels: floor(-ln(u) * mL) with u from
        a splitmix64 of the vector id (HnswGraphBuilder's level draw)."""
        from lucene_ray.pipelines.dedup import _mix64

        # xor a golden-ratio constant first: splitmix64 has a fixed point at
        # 0, which would pin vec_id 0 at a degenerate ~17-level draw
        mixed = _mix64(ids.astype(np.uint64) ^ np.uint64(0x9E3779B97F4A7C15))
        u = (mixed >> np.uint64(11)).astype(np.float64)
        u = (u + 1.0) / float(1 << 53)  # (0, 1]
        ml = 1.0 / np.log(m)
        return np.floor(-np.log(u) * ml).astype(np.int64)

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int,
                      allowed: "np.ndarray | None" = None):
        """Beam search on one level -> (ids, sims) of the ef best found.

        ``allowed`` (bool mask over local nodes) filters the RESULT set
        only — the beam still explores disallowed nodes, the
        filtered-kNN traversal model (Lucene's KnnFloatVectorQuery with
        a filter walks the full graph and collects matching docs)."""
        visited = {entry}
        sims = {entry: float(self.vecs[entry] @ q)}
        cand = [entry]
        best = [entry] if allowed is None or allowed[entry] else []
        while cand:
            # expand the best unexpanded candidate
            c = max(cand, key=lambda i: sims[i])
            cand.remove(c)
            worst_best = min((sims[i] for i in best), default=-np.inf)
            if sims[c] < worst_best and len(best) >= ef:
                break
            nbrs = [n for n in self._nbrs(c, level) if n not in visited]
            if nbrs:
                visited.update(nbrs)
                s = self.vecs[np.asarray(nbrs)] @ q
                for n, sv in zip(nbrs, s):
                    sims[int(n)] = float(sv)
                    if len(best) < ef or sv > worst_best:
                        cand.append(int(n))
                        if allowed is None or allowed[int(n)]:
                            best.append(int(n))
                if len(best) > ef:
                    best.sort(key=lambda i: -sims[i])
                    del best[ef:]
        best.sort(key=lambda i: -sims[i])
        return best, [sims[i] for i in best]

    def build(self, vecs: np.ndarray, ids: np.ndarray) -> None:
        self.vecs = np.ascontiguousarray(vecs)
        self.ids = np.asarray(ids, dtype=np.int64)
        self.indptr = self.indices = None  # dynamic adjacency while building
        n = vecs.shape[0]
        if n == 0:
            self.levels = np.empty(0, np.int64)
            self.neighbors = []
            self._to_csr()
            return
        self.levels = self._level_of(ids, self.m)
        self.max_level = int(self.levels.max())
        self.neighbors = [
            [np.empty(0, np.int64) for _ in range(int(self.levels[i]) + 1)]
            for i in range(n)
        ]
        self.entry = int(np.argmax(self.levels))
        order = np.arange(n)
        for i in order:
            if i == self.entry:
                continue
            li = int(self.levels[i])
            ep = self.entry
            # descend from the top to li+1 greedily
            for lev in range(self.max_level, li, -1):
                if lev <= int(self.levels[ep]):
                    ep = self._search_layer(self.vecs[i], ep, 1, lev)[0][0]
            # insert on levels li..0
            for lev in range(min(li, int(self.levels[ep])), -1, -1):
                found, _s = self._search_layer(self.vecs[i], ep, self.ef, lev)
                sel = [f for f in found if int(self.levels[f]) >= lev][: self.m]
                self.neighbors[i][lev] = np.asarray(sel, dtype=np.int64)
                for f in sel:  # bidirectional with degree cap
                    cur = self.neighbors[f][lev]
                    if i not in cur:
                        cur = np.append(cur, i)
                        if cur.shape[0] > self.m:
                            s = self.vecs[cur] @ self.vecs[f]
                            cur = cur[np.argsort(-s)[: self.m]]
                        self.neighbors[f][lev] = cur
                ep = found[0]
        self._to_csr()

    def search(self, q: np.ndarray, k: int, ef: int = 64,
               allowed: "np.ndarray | None" = None):
        """Top-k local node ids; ``allowed`` restricts RESULTS to a bool
        mask over local nodes (beam still navigates the whole graph)."""
        if self.vecs is None or self.vecs.shape[0] == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = self.entry
        for lev in range(self.max_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lev)[0][0]
        ids, sims = self._search_layer(q, ep, max(ef, k), 0, allowed)
        return np.asarray(ids[:k], np.int64), np.asarray(sims[:k], np.float64)


def knn_hnsw_cosine(embeddings, queries: np.ndarray, k: int = 10,
                    n_shards: int = 4, m: int = 8, ef: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Per-shard HNSW graphs + fan-out/merge: each repartitioned shard
    builds its own graph and answers every query; driver merges per-query
    top-k (cosine desc, id asc). Approximate — recall governed by m/ef."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    empty_result = pa.table({
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    })

    def shard_search(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_result
        qm = ray.get(q_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _normalize(_batch_matrix(b[vec_col]))
        g = HnswGraph(m=m, ef_construction=ef)
        g.build(vecs, ids)
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            loc, sims = g.search(qm[j], k, ef)
            out_q.append(np.full(loc.shape[0], j, dtype=np.int64))
            out_id.append(ids[loc])
            out_s.append(sims)
        return pa.table({
            "query_id": np.concatenate(out_q) if out_q else np.empty(0, np.int64),
            "neighbor_id": np.concatenate(out_id) if out_id else np.empty(0, np.int64),
            "cosine": np.concatenate(out_s) if out_s else np.empty(0, np.float64),
        })

    parts = embeddings.repartition(n_shards).map_batches(
        shard_search, batch_size=None, batch_format="pyarrow"
    )
    tbl = pa.concat_tables(
        [empty_result]
        + list(parts.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    )
    qids = tbl["query_id"].to_numpy()
    nids = tbl["neighbor_id"].to_numpy()
    sims = tbl["cosine"].to_numpy()
    out = {"query_id": [], "rank": [], "neighbor_id": [], "cosine": []}
    for j in range(qn.shape[0]):
        sel = qids == j
        s, i = sims[sel], nids[sel]
        order = np.lexsort((i, -s))[:k]
        out["query_id"].append(np.full(order.shape[0], j, dtype=np.int64))
        out["rank"].append(np.arange(1, order.shape[0] + 1, dtype=np.int64))
        out["neighbor_id"].append(i[order])
        out["cosine"].append(s[order])
    return pa.table({kk: np.concatenate(v) for kk, v in out.items()})
