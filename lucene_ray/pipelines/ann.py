"""Similarity search over an embedding column (list<float>).

* :func:`knn_brute_cosine` — exact top-k cosine: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul against
  it, per-batch top-k partials merge on the driver (tiny). The baseline.
* :func:`knn_ivf_cosine` — IVF: k-means centroids trained on a sample,
  vectors bucketed by nearest centroid (one shuffle), queries probe the
  ``nprobe`` nearest buckets only — the scale path (probes touch a
  fraction of the corpus instead of all of it).

Both keep batches in Arrow/numpy; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _batch_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return values.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def member_mask(sorted_ids: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``probe`` ids appear in ``sorted_ids`` (sorted,
    unique). The shared sorted-membership kernel for filtered kNN and
    tombstone masking (one home — index/vector.py imports it too)."""
    if sorted_ids.shape[0] == 0:
        return np.zeros(probe.shape[0], dtype=bool)
    pos = np.clip(np.searchsorted(sorted_ids, probe), 0,
                  sorted_ids.shape[0] - 1)
    return sorted_ids[pos] == probe


def knn_brute_cosine(embeddings, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     allowed_ids: "np.ndarray | None" = None):
    """Exact cosine top-k of each query against the dataset.

    ``queries``: (q, d) matrix. Returns a pyarrow Table
    (query_id, neighbor_id, cosine) with per-query k rows, tie-broken by
    (cosine desc, neighbor_id asc). ``allowed_ids`` restricts candidate
    neighbors (filtered kNN, search/KnnFloatVectorQuery.java filter):
    the sorted id set broadcasts once and masks each batch."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    allow_ref = (
        ray.put(np.sort(np.asarray(allowed_ids, dtype=np.int64)))
        if allowed_ids is not None else None
    )
    nq = qn.shape[0]

    def partial(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _batch_matrix(b[vec_col])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if allow_ref is not None:
            keep = member_mask(ray.get(allow_ref), ids)
            m, ids = m[keep], ids[keep]
            if m.shape[0] == 0:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                })
        sims = _normalize(m) @ q.T  # (n, nq)
        kk = min(k, m.shape[0])
        # per-query top-kk rows of this batch
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            s = sims[:, j]
            idx = np.argpartition(-s, kk - 1)[:kk] if m.shape[0] > kk else np.arange(m.shape[0])
            out_q.append(np.full(idx.shape[0], j, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_id),
                "cosine": np.concatenate(out_s),
            }
        )

    partials = embeddings.map_batches(partial, batch_format="pyarrow")
    # tiny driver-side reduce: nq * k * n_batches rows
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    qids = tbl["query_id"].to_numpy()
    nids = tbl["neighbor_id"].to_numpy()
    sims = tbl["cosine"].to_numpy()
    out_q, out_id, out_s, out_r = [], [], [], []
    for j in range(nq):
        sel = qids == j
        s, i = sims[sel], nids[sel]
        order = np.lexsort((i, -s))[:k]
        out_q.append(np.full(order.shape[0], j, dtype=np.int64))
        out_id.append(i[order])
        out_s.append(s[order])
        out_r.append(np.arange(1, order.shape[0] + 1, dtype=np.int64))
    return pa.table(
        {
            "query_id": np.concatenate(out_q),
            "rank": np.concatenate(out_r),
            "neighbor_id": np.concatenate(out_id),
            "cosine": np.concatenate(out_s),
        }
    )


def _make_band_mapper(planes_ref, bands: int, rows_per_band: int,
                      id_col: str, vec_col: str):
    """Shared hyperplane-signature banding stage (sign-bit bands fused into
    int64 bucket keys) — used by both near-dup verify paths so the
    candidate sets can never diverge."""

    def to_bands(b: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(b[vec_col]))
        bits = (m @ p > 0).astype(np.uint64)
        keys, dids = [], []
        for band in range(bands):
            chunk = bits[:, band * rows_per_band : (band + 1) * rows_per_band]
            h = np.zeros(chunk.shape[0], dtype=np.uint64)
            for c in range(chunk.shape[1]):
                h = (h << np.uint64(1)) | chunk[:, c]
            keys.append((h * np.uint64(1000003) + np.uint64(band)).astype(np.int64))
            dids.append(ids)
        return pa.table({"key": np.concatenate(keys), "doc_id": np.concatenate(dids)})

    return to_bands


def embedding_near_dup(embeddings, threshold: float = 0.9, method: str = "exact",
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = 64, bands: int = 16,
                       verify: str = "auto", auto_join_rows: int = 2_000_000):
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    * ``method="exact"`` — the full normalized matrix is broadcast once
      (``ray.put``) and every batch does ONE matmul against it, emitting
      only its over-threshold pairs (upper triangle by id). Exact;
      viable while n x d fits the object store.
    * ``method="lsh"`` — random-hyperplane signatures, banded like
      MinHash-LSH: sign-bit bands bucket candidates (groupby shuffle of
      (band_hash, id) pairs only), then candidates verify exactly. The
      10^9+-vector scale path (no all-pairs); recall < 1 when a true pair
      shares no band. ``verify="broadcast"`` checks candidates against a
      broadcast matrix (fast while n x d fits the object store);
      ``verify="join"`` attaches both endpoint vectors via two distributed
      hash joins — nothing whole-corpus-resident anywhere.
      ``verify="auto"`` (default) counts the corpus and picks join past
      ``auto_join_rows`` — the same auto-switch shape as dedup_exact's
      ``strategy="auto"`` (round-2 verdict: broadcast must not be the
      silent default at scale).

    Returns a pyarrow Table (a, b, cosine) sorted by (a, b).
    """
    import pyarrow.compute as _pc

    if method == "lsh" and verify == "auto":
        verify = "join" if embeddings.count() > auto_join_rows else "broadcast"
    if method == "lsh" and verify == "join":
        return _near_dup_lsh_join(
            embeddings, threshold, id_col, vec_col, n_planes, bands, _pc
        )

    full = pa.concat_tables(
        embeddings.map_batches(
            lambda b: pa.table({id_col: b[id_col], vec_col: b[vec_col]}),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    all_ids = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_batch_matrix(full[vec_col]))
    order = np.argsort(all_ids)  # id-sorted for searchsorted lookups
    all_ids, mat = all_ids[order], mat[order]
    mat_ref = ray.put((all_ids, mat))

    if method == "exact":
        def pairs(b: pa.Table) -> pa.Table:
            ids_all, m_all = ray.get(mat_ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(b[vec_col]))
            sims = m @ m_all.T  # (batch, n)
            ii, jj = np.nonzero(sims >= threshold)
            a, bb = ids[ii], ids_all[jj]
            keep = a < bb  # upper triangle, no self pairs
            return pa.table({
                "a": a[keep], "b": bb[keep],
                "cosine": sims[ii, jj][keep],
            })

        t = pa.concat_tables(
            embeddings.map_batches(pairs, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.take(_pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")]))

    # ---- LSH path ----
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((mat.shape[1], n_planes))
    planes_ref = ray.put(planes)
    to_bands = _make_band_mapper(planes_ref, bands, n_planes // bands, id_col, vec_col)

    from lucene_ray.pipelines.dedup import bucket_pairs_dataset

    cand = (
        bucket_pairs_dataset(embeddings.map_batches(to_bands, batch_format="pyarrow"))
        .groupby(["a", "b"]).count()
    )

    def verify(b: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(mat_ref)
        a = b["a"].to_numpy()
        bb = b["b"].to_numpy()
        ia = np.searchsorted(ids_all, a)
        ib = np.searchsorted(ids_all, bb)
        cos = np.einsum("ij,ij->i", m_all[ia], m_all[ib])
        keep = cos >= threshold
        return pa.table({"a": a[keep], "b": bb[keep], "cosine": cos[keep]})

    t = pa.concat_tables(
        cand.map_batches(verify, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    return t.take(_pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")]))


def _near_dup_lsh_join(embeddings, threshold, id_col, vec_col, n_planes,
                       bands, _pc):
    """LSH candidates + join-based exact verify: endpoint vectors attach
    to candidate pairs via two Dataset.join hash joins, so no task ever
    holds the whole matrix (the 10^9+-vector verify)."""
    from lucene_ray.pipelines.dedup import _default_partitions, bucket_pairs_dataset

    rng = np.random.default_rng(1234)
    # plane count is d-dependent; build once from the first batch's dim
    first = embeddings.limit(1).to_pandas()
    d = len(first[vec_col].iloc[0])
    planes = rng.standard_normal((d, n_planes))
    planes_ref = ray.put(planes)
    to_bands = _make_band_mapper(planes_ref, bands, n_planes // bands, id_col, vec_col)

    cand = (
        bucket_pairs_dataset(embeddings.map_batches(to_bands, batch_format="pyarrow"))
        .groupby(["a", "b"]).count()
        .map_batches(lambda b: b.drop_columns(["count()"]), batch_format="pyarrow")
    )
    nparts = _default_partitions()

    # Arrow hash joins reject list<float> payloads: ship vectors as
    # fixed-size binary (d float32s packed per row), unpack after the join
    def _pack(b: pa.Table, key: str, out: str) -> pa.Table:
        m32 = _batch_matrix(b[vec_col]).astype(np.float32)
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m32.shape[1] * 4), m32.shape[0],
            [None, pa.py_buffer(np.ascontiguousarray(m32).tobytes())],
        )
        return pa.table({key: b[id_col], out: arr})

    vec_a = embeddings.map_batches(
        lambda b: _pack(b, "a", "_va"), batch_format="pyarrow"
    )
    vec_b = embeddings.map_batches(
        lambda b: _pack(b, "b", "_vb"), batch_format="pyarrow"
    )
    # Every join input is scrubbed of zero-row blocks
    # (lucene_ray/data/blocks.py): `cand` is a hash-aggregate output
    # (zero-row empty-schema blocks), and the first join's output carries
    # zero-row blocks that would lose the second join's schema broadcast.
    from lucene_ray.data.blocks import safe_inner_join

    id_t = pa.int64()
    try:
        from lucene_ray.data.blocks import _ray_schema_to_arrow
        es = _ray_schema_to_arrow(embeddings.schema(fetch_if_missing=True))
        if es is not None:
            id_t = es.field(id_col).type
    except Exception:
        pass
    vec_t = pa.binary(d * 4)
    joined = safe_inner_join(
        safe_inner_join(
            cand, vec_a, on=("a",), num_partitions=nparts,
            left_schema=pa.schema([("a", id_t), ("b", id_t)]),
            right_schema=pa.schema([("a", id_t), ("_va", vec_t)])),
        vec_b, on=("b",), num_partitions=nparts,
        right_schema=pa.schema([("b", id_t), ("_vb", vec_t)]))

    def _unpack(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        width = col.type.byte_width // 4
        raw = np.frombuffer(col.buffers()[1], dtype=np.float32)
        raw = raw[col.offset * width : (col.offset + len(col)) * width]
        return raw.reshape(len(col), width).astype(np.float64)

    def score(b: pa.Table) -> pa.Table:
        va = _normalize(_unpack(b["_va"]))
        vb = _normalize(_unpack(b["_vb"]))
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        return pa.table({
            "a": b["a"].to_numpy(zero_copy_only=False)[keep],
            "b": b["b"].to_numpy(zero_copy_only=False)[keep],
            "cosine": cos[keep],
        })

    t = pa.concat_tables(
        joined.map_batches(score, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    return t.take(_pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")]))


def train_centroids_distributed(embeddings, n_centroids: int = 16,
                                iters: int = 5, vec_col: str = "embedding",
                                seed: int = 42, sample: int = 10_000) -> np.ndarray:
    """Full-corpus spherical k-means: centroids broadcast via ray.put;
    each batch computes its (k x d) partial sums + counts in one matmul
    + scatter-add; the driver reduces the tiny (k x d) partials. One
    dataset pass per Lloyd iteration — nothing corpus-sized ever leaves
    the workers (the scale path; ``train_centroids`` stays the
    sample-on-driver fast path for small corpora)."""
    cent = train_centroids(embeddings, n_centroids, iters=3, sample=sample,
                           vec_col=vec_col, seed=seed)  # warm start
    for _ in range(iters):
        cent_ref = ray.put(cent)
        k, d = cent.shape

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mm = _normalize(_batch_matrix(b[vec_col]))
            assign = np.argmax(mm @ c.T, axis=1)
            sums = np.zeros((c.shape[0], mm.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mm)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table({
                "centroid": np.arange(c.shape[0], dtype=np.int64),
                "sum": [row.tobytes() for row in sums],
                "n": counts.astype(np.int64),
            })

        parts = pa.concat_tables(
            embeddings.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        cids = parts["centroid"].to_numpy()
        ns = parts["n"].to_numpy()
        sums = np.stack([
            np.frombuffer(bb, dtype=np.float64) for bb in parts["sum"].to_pylist()
        ])
        new = np.zeros((k, d), dtype=np.float64)
        np.add.at(new, cids, sums)
        tot = np.zeros(k, dtype=np.int64)
        np.add.at(tot, cids, ns)
        sel = tot > 0
        new[sel] /= np.linalg.norm(new[sel], axis=1, keepdims=True).clip(1e-12)
        cent = np.where(sel[:, None], new, cent)
    return cent


def spherical_kmeans(m: np.ndarray, n_centroids: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Spherical Lloyd k-means on an already-normalized (n, d) matrix —
    the shared kernel behind train_centroids and the IVF-PQ coarse
    quantizer (which feeds its own single sample materialization)."""
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(m.shape[0], size=min(n_centroids, m.shape[0]),
                        replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            sel = assign == c
            if sel.any():
                v = m[sel].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def train_centroids(embeddings, n_centroids: int = 16, iters: int = 10,
                    sample: int = 10_000, vec_col: str = "embedding",
                    seed: int = 42) -> np.ndarray:
    """Mini k-means on a driver-side sample (normalized -> spherical)."""
    head = embeddings.limit(sample).to_pandas()
    m = _normalize(np.stack(head[vec_col].to_numpy()).astype(np.float64))
    return spherical_kmeans(m, n_centroids, iters=iters, seed=seed)


def knn_ivf_cosine(embeddings, queries: np.ndarray, k: int = 10,
                   n_centroids: int = 16, nprobe: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF-flat cosine ANN: bucket by nearest centroid, probe top-nprobe
    buckets per query. Approximate (recall < 1 when the true neighbor lives
    in an unprobed bucket)."""
    cent = train_centroids(embeddings, n_centroids, vec_col=vec_col)
    cent_ref = ray.put(cent)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probe_sets = [set(row) for row in q_probe]
    q_ref = ray.put(qn)
    probe_ref = ray.put(probe_sets)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_batch_matrix(b[vec_col]))
        a = np.argmax(m @ c.T, axis=1)
        return b.append_column("bucket", pa.array(a.astype(np.int64)))

    bucketed = embeddings.map_batches(assign, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        probes = ray.get(probe_ref)
        m = _normalize(_batch_matrix(b[vec_col]))
        ids = b[id_col].to_numpy(zero_copy_only=False)
        buckets = b["bucket"].to_numpy()
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            sel = np.isin(buckets, list(probes[j]))
            if not sel.any():
                continue
            s = m[sel] @ q[j]
            ii = ids[sel]
            kk = min(k, s.shape[0])
            idx = np.argpartition(-s, kk - 1)[:kk] if s.shape[0] > kk else np.arange(s.shape[0])
            out_q.append(np.full(idx.shape[0], j, dtype=np.int64))
            out_id.append(ii[idx])
            out_s.append(s[idx])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_id),
                "cosine": np.concatenate(out_s),
            }
        )

    partials = bucketed.map_batches(partial, batch_format="pyarrow")
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
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
    return pa.table({k2: np.concatenate(v) for k2, v in out.items()})
