"""Deduplication pipelines over the web-page corpus.

* exact (url, latest wins)  — IndexWriter.updateDocument(Term, doc)
  semantics (index/IndexWriter.java:1553-1617): per unique key the newest
  version survives. Hash-partitioned ``groupby(url).map_groups`` keeping
  max (warc_ts, doc_id).
* content-hash exact dedup  — same, keyed by a vectorized text hash.
* n-gram Jaccard pairs      — exact all-pairs similarity >= threshold via a
  distributed shingle inverted index (explode shingles -> groupby ->
  pair counts), no driver-side O(n^2).
* MinHash + LSH             — the MinHashFilter model
  (analysis/common/minhash/MinHashFilter.java:48): shingle -> K minhashes ->
  band buckets -> groupby(band) candidates -> exact-Jaccard verify.
* SimHash                   — 64-bit fingerprints; near-dup candidates from
  banded fingerprint chunks.

All stages are vectorized ``map_batches`` + ``groupby`` — the shuffles move
(key, doc) pairs, never full documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 64-bit splitmix-style mixer: deterministic, vectorizable, seedable
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def hash_strings(arr: pa.Array, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit content hash of a string column (FNV over bytes
    chunks via numpy; stable across processes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.large_binary())
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    h = np.full(len(arr), np.uint64(0xCBF29CE484222325 ^ seed), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    # chunked FNV: process byte i of every string in lockstep (bounded by max len)
    lens = offsets[1:] - offsets[:-1]
    maxlen = int(lens.max()) if len(lens) else 0
    starts = offsets[:-1]
    for i in range(maxlen):
        sel = lens > i
        if not sel.any():
            break
        idx = starts[sel] + i
        h[sel] = (h[sel] ^ buf[idx].astype(np.uint64)) * prime
    return _mix64(h)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _default_partitions() -> int:
    """Join partition count sized to the cluster: too many aggregator
    actors starve a small CPU pool (deadlock on a laptop-sized cluster),
    too few underparallelize a big one."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(64, cpus))


def dedup_exact(pages, key: str = "url", strategy: str = "auto",
                broadcast_max: int = 2_000_000,
                num_partitions: int | None = None):
    """Latest-wins exact dedup: keep the row with max (warc_ts, doc_id) per
    key (IndexWriter.updateDocument semantics).

    Shape: fuse (warc_ts, doc_id) into one orderable int64, take the native
    ``groupby(key).max`` C-aggregate (no per-group Python — a map_groups
    UDF pays ~100us of pandas per group, ruinous at 10^9 keys), then keep
    exactly the rows whose fused rank is a winner. Winner ranks are unique
    per row, so a semi-join on the rank alone reproduces full winner rows.

    Two winner-filter strategies (``strategy``):
    * ``"broadcast"`` — sorted winner-rank array via ``ray.put``, each
      filter task does a searchsorted membership test. O(#unique keys)
      memory on every worker: the fast path while the winner set fits.
    * ``"join"``      — distributed hash semi-join (``Dataset.join`` on the
      fused rank): nothing driver-side, the scale path for 10^10+ keys.
    * ``"auto"``      — broadcast while winners <= ``broadcast_max`` rows.
    """
    import ray
    from ray.data.aggregate import Max

    def _fused(b: pa.Table) -> np.ndarray:
        ts = b["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        # ms resolution keeps (ts << 22) inside int64; doc_id < 2**22 in
        # every corpus here; fused stays monotone in (warc_ts, doc_id)
        return ((ts // 1000) << np.int64(22)) | ids.astype(np.int64)

    def local_winners(b: pa.Table) -> pa.Table:
        # block-local combiner: ONE (key, max rank) row per key leaves the
        # block, so the groupby shuffles keys + int64 ranks — never the
        # full rows (html/text stay put)
        fused = _fused(b)
        keys = b[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        t = pa.table({key: keys, "_rank": fused})
        return t.group_by(key).aggregate([("_rank", "max")]).rename_columns(
            [key, "_rank"]
        )

    winners = (
        pages.map_batches(local_winners, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Max("_rank", alias_name="_keep"))
    )

    if strategy == "auto":
        winners = winners.materialize()  # winner ranks only (key + int64)
        strategy = "broadcast" if winners.count() <= broadcast_max else "join"

    if strategy == "join":
        from lucene_ray.data.blocks import safe_inner_join

        num_partitions = num_partitions or _default_partitions()
        # distributed hash semi-join on the (globally unique) fused rank —
        # nothing accumulates on the driver or in worker heaps. Both join
        # inputs are scrubbed of zero-row blocks (data/blocks.py): the
        # keepers side is a hash-aggregate output (emits zero-row
        # empty-schema blocks), and the corpus side may carry zero-row
        # blocks from an upstream filter — either one can lose the join's
        # schema broadcast. The join is a barrier that pins its inputs in
        # aggregator partitions anyway, so the scrub adds a store pass,
        # not a new barrier.
        def add_rank(b: pa.Table) -> pa.Table:
            return b.append_column("_fused", pa.array(_fused(b)))

        keepers = winners.map_batches(
            lambda b: pa.table({"_fused": b["_keep"]}), batch_format="pyarrow"
        )
        joined = safe_inner_join(
            pages.map_batches(add_rank, batch_format="pyarrow"),
            keepers, on=("_fused",), num_partitions=num_partitions,
            right_schema=pa.schema([("_fused", pa.int64())]),
        )
        return joined.map_batches(
            lambda b: b.drop_columns(["_fused"]), batch_format="pyarrow"
        )

    keep = np.sort(
        pa.concat_tables(
            winners.select_columns(["_keep"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            )
        )["_keep"].to_numpy()
    )
    keep_ref = ray.put(keep)

    def filter_winners(b: pa.Table) -> pa.Table:
        k = ray.get(keep_ref)
        fused = _fused(b)
        pos = np.searchsorted(k, fused)
        pos_c = np.minimum(pos, k.shape[0] - 1)
        return b.filter(pa.array(k[pos_c] == fused))

    return pages.map_batches(filter_winners, batch_format="pyarrow")


def dedup_exact_content(pages, text_col: str = "text"):
    """Exact content dedup via 64-bit text hash, then latest-wins."""
    def add_hash(b: pa.Table) -> pa.Table:
        h = hash_strings(b[text_col])
        return b.append_column("content_hash", pa.array(h.astype(np.int64)))

    hashed = pages.map_batches(add_hash, batch_format="pyarrow")
    return dedup_exact(hashed, key="content_hash")


# ---------------------------------------------------------------------------
# shingles / minhash
# ---------------------------------------------------------------------------

def _shingle_hashes(texts: pa.Array, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, shingle_hash) for word n-grams of each doc (vectorized)."""
    from lucene_ray.analysis.batch import tokenize_column

    flat, doc_idx, _pos = tokenize_column(texts)
    th = hash_strings(flat)
    if th.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    # rolling combine of n consecutive token hashes within a doc
    out_h = th.copy()
    for k in range(1, n):
        shifted = np.roll(th, -k)
        out_h = _mix64(out_h ^ (shifted * np.uint64(k * 2 + 1)))
    # valid shingle start: next n-1 tokens in same doc
    valid = np.ones(th.shape[0], dtype=bool)
    for k in range(1, n):
        same = np.roll(doc_idx, -k) == doc_idx
        same[-k:] = False
        valid &= same
    return doc_idx[valid], out_h[valid]



def _run_pairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    run = np.sort(ids)
    ii, jj = np.triu_indices(run.shape[0], k=1)
    return run[ii], run[jj]


def bucket_pairs_dataset(kv, max_bucket: int | None = None):
    """All within-bucket doc pairs of a (key:int64, doc_id:int64) Dataset,
    WITHOUT per-group UDFs: a groupby().map_groups pays Python per bucket
    and most buckets are singletons (ruinous at scale). Instead: one global
    sort on the key, then a vectorized per-block run scan — only multi-doc
    runs (rare) loop in Python; runs touching a block edge are deferred to
    a tiny second pass since they may continue in the neighbouring block.
    ``max_bucket`` skips buckets larger than the cap (stopword-grade keys).
    Each bucket emits its pairs exactly once (multiplicity = #buckets the
    pair shares — dedup downstream if needed)."""

    def detect(b: pa.Table) -> pa.Table:
        keys = b["key"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = keys.shape[0]
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64())})
        starts = np.nonzero(np.diff(keys, prepend=keys[0] - 1))[0]
        ends = np.append(starts[1:], n)
        lens = ends - starts
        a_parts, b_parts, k_parts = [], [], []
        # boundary runs (first + last of the block): defer raw rows
        edge = {0, lens.shape[0] - 1}
        for r in edge:
            s, e = starts[r], ends[r]
            a_parts.append(ids[s:e])
            b_parts.append(np.full(e - s, -1, dtype=np.int64))
            k_parts.append(keys[s:e])
        # interior multi-doc runs: vectorized pair expansion (rare)
        for r in np.nonzero(lens >= 2)[0]:
            if r in edge:
                continue
            if max_bucket is not None and lens[r] > max_bucket:
                continue
            aa, bb = _run_pairs(ids[starts[r]:ends[r]])
            a_parts.append(aa)
            b_parts.append(bb)
            k_parts.append(np.zeros(aa.shape[0], dtype=np.int64))
        return pa.table(
            {
                "a": np.concatenate(a_parts).astype(np.int64),
                "b": np.concatenate(b_parts),
                "key": np.concatenate(k_parts),
            }
        )

    def boundary_pairs(b: pa.Table) -> pa.Table:
        # all deferred rows of the whole dataset in one tiny block
        keys = b["key"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if keys.shape[0] == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        a_parts, b_parts = [], []
        es = np.nonzero(np.diff(keys, prepend=keys[0] - 1))[0]
        ee = np.append(es[1:], keys.shape[0])
        for s, e in zip(es, ee):
            if e - s >= 2 and (max_bucket is None or e - s <= max_bucket):
                aa, bb = _run_pairs(ids[s:e])
                a_parts.append(aa)
                b_parts.append(bb)
        if not a_parts:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table(
            {
                "a": np.concatenate(a_parts).astype(np.int64),
                "b": np.concatenate(b_parts).astype(np.int64),
            }
        )

    mixed = kv.sort("key").map_batches(detect, batch_format="pyarrow").materialize()
    inner = mixed.map_batches(
        lambda b: b.filter(pc.greater_equal(b["b"], 0)).drop_columns(["key"]),
        batch_format="pyarrow",
    )
    deferred = (
        mixed.map_batches(
            lambda b: pa.table(
                {
                    "key": b.filter(pc.equal(b["b"], -1))["key"],
                    "doc_id": b.filter(pc.equal(b["b"], -1))["a"],
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(boundary_pairs, batch_size=None, batch_format="pyarrow")
    )
    return inner.union(deferred)


def minhash_signatures(texts: pa.Array, num_hashes: int = 64, shingle_n: int = 3) -> np.ndarray:
    """(n_docs, num_hashes) MinHash matrix (universal-hash permutations)."""
    doc_idx, sh = _shingle_hashes(texts, shingle_n)
    n_docs = len(texts)
    sig = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    if sh.shape[0] == 0:
        return sig
    for j in range(num_hashes):
        hj = _mix64(sh ^ np.uint64((0x9E3779B97F4A7C15 * (j + 1)) & 0xFFFFFFFFFFFFFFFF))
        np.minimum.at(sig[:, j], doc_idx, hj)
    return sig


def minhash_lsh_candidates(pages, text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_n: int = 3):
    """Candidate near-dup pairs via banded MinHash (SURVEY §2.8):
    signature -> (band_id, band_hash, doc_id) rows -> groupby(band) ->
    within-bucket pairs. Returns a Dataset of (a, b) doc_id pairs."""
    rows_per_band = num_hashes // bands

    def to_bands(b: pa.Table) -> pa.Table:
        sig = minhash_signatures(b[text_col].combine_chunks()
                                 if isinstance(b[text_col], pa.ChunkedArray)
                                 else b[text_col], num_hashes, shingle_n)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        band_ids, band_hashes, doc_ids = [], [], []
        for band in range(bands):
            chunk = sig[:, band * rows_per_band : (band + 1) * rows_per_band]
            h = np.zeros(chunk.shape[0], dtype=np.uint64)
            for c in range(chunk.shape[1]):
                h = _mix64(h ^ chunk[:, c])
            band_ids.append(np.full(h.shape[0], band, dtype=np.int32))
            band_hashes.append(h.astype(np.int64))
            doc_ids.append(ids)
        return pa.table(
            {
                "band": np.concatenate(band_ids),
                "band_hash": np.concatenate(band_hashes),
                "doc_id": np.concatenate(doc_ids),
            }
        )

    # pair expansion via the shared sorted-run scanner (no per-group UDFs)
    def fuse_key(b: pa.Table) -> pa.Table:
        k = _mix64(
            b["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
            ^ (b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
               * np.uint64(0x9E3779B97F4A7C15))
        ).astype(np.int64)
        return pa.table({"key": k, "doc_id": b["doc_id"]})

    cand = bucket_pairs_dataset(
        pages.map_batches(to_bands, batch_format="pyarrow").map_batches(
            fuse_key, batch_format="pyarrow"
        )
    )
    # distinct pairs (a doc pair can collide in several bands): native
    # count aggregate (C-vectorized), then drop the count
    return (
        cand.groupby(["a", "b"])
        .count()
        .map_batches(lambda b: b.drop_columns(["count()"]), batch_format="pyarrow")
    )


def shared_window_pairs(pages, k: int = 6, text_col: str = "text",
                        max_bucket: int = 64):
    """Exact-substring duplicate pairs: docs sharing >= 1 exact run of
    ``k`` consecutive tokens (the k-token-window-hash variant of
    suffix-array exact-substring dedup from Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — the windowed
    hash form trades the suffix array for one shuffle).

    Pipeline (all vectorized, nothing driver-resident):
      1. per batch: rolling k-window hashes (`_shingle_hashes`, one
         splitmix chain over token hashes), reduced to DISTINCT
         (window_hash, doc_id) rows;
      2. the house sorted-run pair scan (`bucket_pairs_dataset`) expands
         within-hash pairs — one global sort, no per-group UDFs;
         ``max_bucket`` skips boilerplate-grade windows shared by more
         than that many docs;
      3. a native groupby count makes the pair multiplicity the number of
         distinct shared windows (64-bit hashes: collision odds ~2^-64).

    Returns a Dataset of (a, b, n_windows) with a < b.
    """

    def to_windows(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, wh = _shingle_hashes(texts, n=k)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
        key = wh.astype(np.int64)
        # DISTINCT (hash, doc) within the batch: a window repeated inside
        # one doc must count once
        order = np.lexsort((key, ids))
        ids, key = ids[order], key[order]
        keep = np.ones(ids.shape[0], dtype=bool)
        keep[1:] = (ids[1:] != ids[:-1]) | (key[1:] != key[:-1])
        return pa.table({"key": key[keep], "doc_id": ids[keep].astype(np.int64)})

    kv = pages.map_batches(to_windows, batch_format="pyarrow")
    pairs = bucket_pairs_dataset(kv, max_bucket=max_bucket)
    return (
        pairs.groupby(["a", "b"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {"a": b["a"], "b": b["b"], "n_windows": b["count()"]}),
            batch_format="pyarrow",
        )
    )


def jaccard_pairs(pages, text_col: str = "text", shingle_n: int = 2,
                  threshold: float = 0.5, max_shingle_df: int | None = None,
                  strategy: str = "auto", broadcast_max: int = 2_000_000,
                  num_partitions: int | None = None):
    """EXACT all-pairs shingle-Jaccard >= threshold, fully distributed:
    explode (shingle_hash, doc_id) -> groupby(shingle) emits co-occurrence
    pairs -> groupby(pair) counts intersections -> |A∪B| from per-doc
    shingle counts -> filter. The oracle-checkable ground truth for the
    MinHash pipeline.

    Per-doc set sizes attach by ``strategy``: ``"broadcast"`` ships one
    dict to every task (fast while docs <= ``broadcast_max``); ``"join"``
    runs two distributed hash joins (sizes onto a, then b) with nothing
    driver-side — the 10^10+-doc path; ``"auto"`` picks by count."""
    import ray

    def to_shingles(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, sh = _shingle_hashes(texts, shingle_n)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        # distinct shingles per doc (sets, not bags)
        key = np.stack([doc_idx, sh.astype(np.int64)], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {"doc_id": ids[uniq[:, 0]], "shingle": uniq[:, 1]}
        )

    shingles = pages.map_batches(to_shingles, batch_format="pyarrow")
    sizes_ds = shingles.groupby("doc_id").count()

    # max_shingle_df caps stopword-grade shingles at scale (documented
    # approximation; None = exact, required for the oracle check)
    pairs = bucket_pairs_dataset(
        shingles.map_batches(
            lambda b: pa.table({"key": b["shingle"], "doc_id": b["doc_id"]}),
            batch_format="pyarrow",
        ),
        max_bucket=max_shingle_df,
    )
    inter = pairs.groupby(["a", "b"]).count()

    if strategy == "auto":
        sizes_ds = sizes_ds.materialize()  # (doc_id, count) rows only
        strategy = "broadcast" if sizes_ds.count() <= broadcast_max else "join"

    if strategy == "join":
        from lucene_ray.data.blocks import safe_inner_join

        num_partitions = num_partitions or _default_partitions()
        # sizes attach via two distributed hash joins — O(1) driver memory.
        # Every join input is scrubbed of zero-row blocks (data/blocks.py):
        # `inter` and `sizes_ds` are hash-aggregate outputs, and the first
        # join's output carries zero-row (schema-full) blocks that would
        # lose the second join's schema broadcast.
        sz_a = sizes_ds.map_batches(
            lambda b: pa.table({"a": b["doc_id"], "_sz_a": b["count()"]}),
            batch_format="pyarrow",
        )
        sz_b = sizes_ds.map_batches(
            lambda b: pa.table({"b": b["doc_id"], "_sz_b": b["count()"]}),
            batch_format="pyarrow",
        )
        pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                 ("count()", pa.int64())])
        sz_schema = lambda k, c: pa.schema([(k, pa.int64()), (c, pa.int64())])
        joined = safe_inner_join(
            safe_inner_join(inter, sz_a, on=("a",),
                            num_partitions=num_partitions,
                            left_schema=pair_schema,
                            right_schema=sz_schema("a", "_sz_a")),
            sz_b, on=("b",), num_partitions=num_partitions,
            right_schema=sz_schema("b", "_sz_b"))

        def finish_joined(b: pa.Table) -> pa.Table:
            a = b["a"].to_numpy()
            bb = b["b"].to_numpy()
            c = b["count()"].to_numpy().astype(np.float64)
            sa = b["_sz_a"].to_numpy().astype(np.float64)
            sb = b["_sz_b"].to_numpy().astype(np.float64)
            jac = c / (sa + sb - c)
            keep = jac >= threshold
            return pa.table({"a": a[keep], "b": bb[keep], "jaccard": jac[keep]})

        return joined.map_batches(finish_joined, batch_format="pyarrow")

    sizes_df = sizes_ds.to_pandas()
    sizes = dict(zip(sizes_df["doc_id"], sizes_df["count()"]))
    sizes_ref = ray.put(sizes)

    def finish(b: pa.Table) -> pa.Table:
        s = ray.get(sizes_ref)
        a = b["a"].to_numpy()
        bb = b["b"].to_numpy()
        c = b["count()"].to_numpy().astype(np.float64)
        sa = np.array([s[x] for x in a], dtype=np.float64)
        sb = np.array([s[x] for x in bb], dtype=np.float64)
        jac = c / (sa + sb - c)
        keep = jac >= threshold
        return pa.table(
            {
                "a": a[keep],
                "b": bb[keep],
                "jaccard": jac[keep],
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_fingerprints(pages, text_col: str = "text"):
    """64-bit SimHash per doc: sign of the sum of token-hash bit vectors."""
    def fp(b: pa.Table) -> pa.Table:
        from lucene_ray.analysis.batch import tokenize_column

        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, doc_idx, _ = tokenize_column(texts)
        th = hash_strings(flat)
        n = b.num_rows
        acc = np.zeros((n, 64), dtype=np.int64)
        if th.shape[0]:
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            contrib = bits * 2 - 1
            np.add.at(acc, doc_idx, contrib)
        fps = (acc > 0).astype(np.uint64)
        out = np.zeros(n, dtype=np.uint64)
        for j in range(64):
            out |= fps[:, j] << np.uint64(j)
        return pa.table({"doc_id": b["doc_id"], "simhash": out.astype(np.int64)})

    return pages.map_batches(fp, batch_format="pyarrow")


def decontaminate(corpus, benchmark_texts, shingle_n: int = 3,
                  min_hits: int = 1, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Benchmark decontamination — flag corpus docs sharing word
    ``shingle_n``-grams with a held-out benchmark set (the n-gram-overlap
    contamination check standard in LLM training-data pipelines; same
    shingle machinery as the dedup family, beyond the reference's own
    operator set).

    The benchmark is the SMALL side: its distinct shingle hashes build
    once on the driver and broadcast via ``ray.put`` (read per actor,
    never re-shipped per batch); each corpus batch then counts its docs'
    DISTINCT overlapping shingles with one sorted-array ``searchsorted``
    — no shuffle at all, the corpus streams through untouched. Returns a
    Dataset of (id, n_hits) rows with ``n_hits >= min_hits`` distinct
    shared shingles.
    """
    import ray

    if isinstance(benchmark_texts, pa.Table):
        bench = benchmark_texts[text_col]
    else:
        bench = pa.array(list(benchmark_texts), pa.string())
    if isinstance(bench, pa.ChunkedArray):
        bench = bench.combine_chunks()
    _bi, bh = _shingle_hashes(bench, shingle_n)
    bench_ref = ray.put(np.unique(bh))

    def scan(b: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        doc_idx, sh = _shingle_hashes(b[text_col], shingle_n)
        n = b.num_rows
        hits = np.zeros(n, dtype=np.int64)
        if sh.shape[0] and bset.shape[0]:
            # distinct (doc, shingle) pairs, then membership in the set
            key = np.stack([doc_idx.astype(np.uint64), sh], axis=1)
            uniq = np.unique(key, axis=0)
            pos = np.searchsorted(bset, uniq[:, 1])
            pos = np.clip(pos, 0, bset.shape[0] - 1)
            m = bset[pos] == uniq[:, 1]
            np.add.at(hits, uniq[:, 0][m].astype(np.int64), 1)
        keep = hits >= min_hits
        return pa.table({
            id_col: pa.array(
                b[id_col].to_numpy(zero_copy_only=False)[keep]),
            "n_hits": pa.array(hits[keep], pa.int64()),
        })

    return corpus.map_batches(scan, batch_format="pyarrow")


def dedup_clusters(pairs, max_iters: int = 50):
    """Connected components over near-dup pairs — the clustering step a
    production dedup pipeline runs after candidate generation (MinHash
    banding / shared-window pairs emit EDGES; keeping one doc per
    CLUSTER needs the transitive closure — the alternating label
    propagation of Kiveris et al., "Connected components in MapReduce
    and beyond", SoCC 2014, simplified to min-label propagation).

    ``pairs``: Dataset of (a, b) doc-id edges. Returns a Dataset of
    (doc_id, cluster) where cluster = the component's minimum doc id
    (its canonical representative — "keep cluster min" is the usual
    survivor rule).

    Distributed shape: labels live as a (doc_id, cluster) Dataset; each
    iteration propagates the min label across edges with ONE groupby-min
    over (edge-neighbor ∪ self) candidate labels, so an iteration is one
    shuffle and the loop runs O(component diameter) times (near-dup
    components are shallow in practice; ``max_iters`` bounds pathology).
    Convergence = a tiny aggregate (sum of labels) reaching a fixpoint —
    no driver-side materialization of the label table.

    Robustness notes (the round-3/4 failure modes): ``edges`` is
    materialized ONCE before the loop — otherwise the whole upstream
    pair-generation pipeline (shingle → window-hash → sort → pair scan)
    re-executes every iteration. And every join input is scrubbed of
    zero-row blocks (``lucene_ray.data.blocks``): Ray's hash aggregates
    emit zero-row empty-schema blocks, map_batches forwards them without
    invoking the UDF, and a zero-row FIRST block loses the join's schema
    broadcast — so any aggregator partition that receives no real rows
    dies in acero with an unresolvable key. Block-level scrubbing is the
    only guard that can actually fire.
    """
    from ray.data.aggregate import Min, Sum

    from lucene_ray.data.blocks import safe_inner_join, scrub_empty_blocks

    label_schema = pa.schema([("doc_id", pa.int64()),
                              ("cluster", pa.int64())])
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    src_lab_schema = pa.schema([("src", pa.int64()), ("lab", pa.int64())])

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy()
        bb = b["b"].to_numpy()
        return pa.table({
            "src": pa.array(np.concatenate([a, bb]).astype(np.int64)),
            "dst": pa.array(np.concatenate([bb, a]).astype(np.int64)),
        })

    # ONE execution of the candidate-pair pipeline; the loop below
    # re-reads the scrubbed, pinned blocks only.
    edges = scrub_empty_blocks(
        pairs.map_batches(both_dirs, batch_format="pyarrow"),
        schema=edge_schema,
    )
    if edges.count() == 0:
        import ray.data
        return ray.data.from_arrow(label_schema.empty_table())

    def norm_labels(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"].cast(pa.int64()),
                         "cluster": b["cluster"].cast(pa.int64())})

    def relabel(ds):
        """groupby-min over candidate labels; the aggregate output is
        scrubbed so the next iteration's join never sees zero-row
        blocks (this doubles as the per-iteration materialize that the
        convergence checksum needs)."""
        agg = (
            ds.groupby("doc_id")
            .aggregate(Min("cluster", alias_name="cluster"))
            .map_batches(norm_labels, batch_format="pyarrow")
        )
        return scrub_empty_blocks(agg, schema=label_schema)

    # initial labels: every endpoint labels itself
    labels = relabel(
        edges.map_batches(
            lambda b: pa.table({"doc_id": b["src"], "cluster": b["src"]}),
            batch_format="pyarrow",
        )
    )

    def checksum(lb) -> int:
        t = lb.aggregate(Sum("cluster", alias_name="s"))
        v = t["s"]
        return int(v) if v is not None else 0

    prev = checksum(labels)
    for _ in range(max_iters):
        # neighbor labels flow along edges: join labels onto edge sources,
        # retarget to the destination, keep own label via union, min-reduce
        neigh = safe_inner_join(
            edges,
            labels.map_batches(
                lambda b: pa.table({"src": b["doc_id"],
                                    "lab": b["cluster"]}),
                batch_format="pyarrow",
            ),
            on=("src",), num_partitions=_default_partitions(),
            # edges is already scrubbed and pinned; labels comes out of
            # relabel() scrubbed but its map_batches projection runs
            # lazily, so scrub the projected side again (cheap: label
            # table only)
            scrub_left=False, right_schema=src_lab_schema,
        )
        cand = neigh.map_batches(
            lambda b: pa.table({"doc_id": b["dst"], "cluster": b["lab"]}),
            batch_format="pyarrow",
        ).union(labels)
        labels = relabel(cand)
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def token_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                       separator: str = " ", max_output_size: int = 1024,
                       analyzer=None):
    """FingerprintFilter (miscellaneous/FingerprintFilter.java:44) over a
    document column: each doc collapses to ONE fingerprint string — its
    sorted, de-duplicated analyzed terms joined by ``separator``. A doc
    whose fingerprint would exceed ``max_output_size`` chars yields NULL
    (the reference filter emits no token past maxOutputTokenSize); a
    token-less doc yields the empty string.

    Vectorized per batch: one tokenize_column pass, lexsort on
    (doc, term), run-edge de-duplication, ListArray rebuild and
    ``binary_join`` — no per-row Python.
    """
    import pyarrow.compute as pc

    from lucene_ray.analysis.analyzers import StandardAnalyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = analyzer or StandardAnalyzer

    def fp(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = b[id_col]
        flat, doc_idx, _pos = tokenize_column(b[text_col], an)
        if len(flat) == 0:
            return pa.table({id_col: ids,
                             "fingerprint": pa.array([""] * n,
                                                     type=pa.string())})
        terms = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, doc_idx))
        d_s, t_s = doc_idx[order], terms[order]
        keep = np.ones(d_s.size, dtype=bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        d_k, t_k = d_s[keep], t_s[keep]
        counts = np.bincount(d_k, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        lst = pa.ListArray.from_arrays(pa.array(offsets),
                                       pa.array(t_k, type=pa.string()))
        out = pc.binary_join(lst, separator)
        too_big = pc.greater(pc.utf8_length(out), max_output_size)
        out = pc.if_else(too_big, pa.nulls(n, pa.string()), out)
        return pa.table({id_col: ids, "fingerprint": out})

    return ds.map_batches(fp, batch_format="pyarrow")


def fingerprint_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                      separator: str = " ", max_output_size: int = 1024,
                      analyzer=None, min_group: int = 2):
    """Token-set duplicate groups via FingerprintFilter keys — the
    clustering/linking use the reference filter documents
    (FingerprintFilter.java:27): docs whose analyzed token SETS are
    equal (any order, any repetition) share a fingerprint. Returns
    (fingerprint, n_docs, keeper=min doc id) for groups of
    ``min_group``+ docs.

    Scale shape: the per-batch fingerprint map keeps full rows on their
    blocks; only (fingerprint, id) pairs enter the one
    ``groupby(fingerprint)`` exchange — the dedup_exact key-only shuffle
    story."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    fps = token_fingerprints(ds, text_col=text_col, id_col=id_col,
                             separator=separator,
                             max_output_size=max_output_size,
                             analyzer=analyzer)
    agg = (fps.map_batches(
               lambda b: b.filter(pc.is_valid(b["fingerprint"])),
               batch_format="pyarrow")
           .groupby("fingerprint")
           .aggregate(Count(), Min(id_col)))

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({
            "fingerprint": b["fingerprint"],
            "n_docs": b["count()"].cast(pa.int64()),
            "keeper": b[f"min({id_col})"],
        })
        return t.filter(pc.greater_equal(t["n_docs"], min_group))

    return agg.map_batches(finish, batch_format="pyarrow")
