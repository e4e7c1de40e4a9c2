"""Cluster job entry point — the `ray job submit` surface of the engine.

    ray job submit --working-dir . -- python scripts/ray_job.py build \
        --input /data/pages/*.parquet --index /shared/idx \
        --segments 256 --positions --field title=extracted_title

    ray job submit -- python scripts/ray_job.py merge \
        --index /shared/idx --out /shared/idx_tiered --group-size 8

    ray job submit -- python scripts/ray_job.py search \
        --index /shared/idx_tiered --query '+table -key' --k 10

    ray job submit -- python scripts/ray_job.py bench-queries \
        --index /shared/idx_tiered --queries queries.txt --replicas 4

On a cluster `ray.init(address="auto")` attaches to the running Ray; in
this sandbox it falls back to a local session. Builds are resumable: a
rerun skips fingerprint-matched segments and commits a fresh manifest
(SegmentInfos-style commit point), and every segment row carries lineage
(fingerprint, doc range, build secs, terms/sec, postings bytes) — the
north rule's checkpoint/lineage contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from anywhere (ray job submit working-dirs included)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_ray():
    import ray

    # workers must import lucene_ray no matter where the CLI was invoked
    # from (the sys.path shim above only fixes the DRIVER import)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {"env_vars": {"PYTHONPATH": repo_root + os.pathsep
                        + os.environ.get("PYTHONPATH", "")}}
    if not ray.is_initialized():
        try:
            ray.init(address="auto", ignore_reinit_error=True,
                     logging_level="ERROR", runtime_env=env)
        except Exception:
            ray.init(address="local", ignore_reinit_error=True,
                     include_dashboard=False, logging_level="ERROR",
                     runtime_env=env)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> dict:
    from lucene_ray.analysis.analyzers import (
        Analyzer,
        EnglishStemAnalyzer,
        StandardAnalyzer,
    )
    from lucene_ray.index.build import build_index

    analyzer = {
        "standard": StandardAnalyzer,
        "english": EnglishStemAnalyzer,
    }.get(args.analyzer, StandardAnalyzer)
    extra = dict(kv.split("=", 1) for kv in (args.field or []))
    t0 = time.perf_counter()
    m = build_index(
        args.input,
        args.index,
        analyzer=analyzer,
        text_col=args.text_col,
        id_col=args.id_col,
        num_segments=args.segments,
        with_positions=args.positions,
        extra_fields=extra or None,
        stored_source=args.input,
    )
    secs = time.perf_counter() - t0
    return {
        "job": "build",
        "index": args.index,
        "docs": m["doc_count"],
        "segments": len(m["segments"]),
        "skipped_segments": sum(1 for s in m["segments"] if s.get("skipped")),
        "postings_bytes": sum(s["postings_bytes"] for s in m["segments"]),
        "secs": round(secs, 3),
        "docs_per_sec": round(m["doc_count"] / secs, 1),
    }


def cmd_info(args) -> dict:
    """Luke Overview job (index/check.index_info): metadata-only index
    summary — instant on any index size."""
    from lucene_ray.index.check import index_info

    return {"job": "info", **index_info(args.index)}


def cmd_quality(args) -> dict:
    """QualityBenchmark job (benchmark/quality roles): P@k / recall /
    AP / MRR for a comma-separated query list against the tf>=min-tf
    Judge."""
    t0 = time.perf_counter()
    from lucene_ray.pipelines.quality_eval import quality_benchmark
    from lucene_ray.search.searcher import Searcher

    s = Searcher(args.index, mode="f64")
    rows = quality_benchmark(s, [t for t in args.queries.split(",") if t],
                             k=args.k, min_tf=args.min_tf)
    return {"job": "quality", "rows": rows,
            "secs": round(time.perf_counter() - t0, 3)}


def cmd_split(args) -> dict:
    """PKIndexSplitter job (misc/index/PKIndexSplitter.java:42): split
    --index by a classic-syntax --query into --first (matching docs)
    and --second (the rest)."""
    t0 = time.perf_counter()
    from lucene_ray.index.split import split_index
    from lucene_ray.search.parser import parse_query

    a, b = split_index(args.index, args.first, args.second,
                       parse_query(args.query),
                       group_size=args.group_size)
    return {
        "job": "split",
        "first": args.first, "first_docs": a["doc_count"],
        "second": args.second, "second_docs": b["doc_count"],
        "secs": round(time.perf_counter() - t0, 3),
    }


def cmd_merge(args) -> dict:
    t0 = time.perf_counter()
    if args.mode == "tiered":
        from lucene_ray.index.merge import tiered_merge

        m = tiered_merge(args.index, args.out, group_size=args.group_size)
    else:
        from lucene_ray.index.merge import force_merge

        m = force_merge(args.index, args.out, terms_per_shard=args.terms_per_shard)
    return {
        "job": f"merge/{args.mode}",
        "out": args.out,
        "segments": len(m["segments"]),
        "docs": m["doc_count"],
        "secs": round(time.perf_counter() - t0, 3),
    }


def cmd_search(args) -> dict:
    from lucene_ray.search.executor import DistributedSearcher

    s = DistributedSearcher(args.index, num_executors=args.executors,
                            num_replicas=args.replicas)
    td = s.search(args.query, k=args.k)
    return {
        "job": "search",
        "query": args.query,
        "total_hits": td.total_hits,
        "relation": td.relation,
        "hits": [
            {"doc_id": int(d), "score": float(x)}
            for d, x in zip(td.doc_ids, td.scores)
        ],
    }


def cmd_bench_queries(args) -> dict:
    import numpy as np

    from lucene_ray.search.executor import DistributedSearcher

    with open(args.queries) as f:
        qs = [line.strip() for line in f if line.strip()]
    s = DistributedSearcher(args.index, num_executors=args.executors,
                            num_replicas=args.replicas)
    for q in qs:
        s.search(q, k=args.k)  # warm
    lat = []
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        for q in qs:
            tq = time.perf_counter()
            s.search(q, k=args.k)
            lat.append(time.perf_counter() - tq)
    total = time.perf_counter() - t0
    lat_ms = np.asarray(lat) * 1000
    return {
        "job": "bench-queries",
        "n_queries": len(lat),
        "qps_sequential": round(len(lat) / total, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
    }


def cmd_curate(args) -> dict:
    """End-to-end curation job over a crawl parquet (url, text[, ...]):
    latest-wins URL dedup -> quality filter (min tokens) -> language id
    -> optional LM-perplexity scoring, written as PARTITIONED parquet
    (one directory per language) so a failed run resumes by skipping
    finished partitions — the brief's resumable-output contract."""
    import ray.data

    from lucene_ray.pipelines.dedup import dedup_exact
    from lucene_ray.pipelines.textstats import lang_id
    from lucene_ray.pipelines.lm import score_perplexity, train_bigram_lm

    import pyarrow as pa
    import pyarrow.compute as pc

    t0 = time.perf_counter()
    tcol = args.text_col
    ds = ray.data.read_parquet(args.input)
    if "warc_ts" not in ds.schema().names:
        # latest-wins dedup keys on (warc_ts, doc_id); without a crawl
        # timestamp it degenerates to max doc_id per key
        def add_ts(b: pa.Table) -> pa.Table:
            return b.append_column(
                "warc_ts", pa.array([0] * b.num_rows, pa.timestamp("s")))

        ds = ds.map_batches(add_ts, batch_format="pyarrow")
    ds = dedup_exact(ds, key=args.url_col)

    def with_token_count(b: pa.Table) -> pa.Table:
        tc = pc.list_value_length(
            pc.split_pattern(pc.fill_null(b[tcol], ""), " "))
        return b.append_column("token_count", tc.cast(pa.int64()))

    keep = ds.map_batches(with_token_count, batch_format="pyarrow") \
             .filter(lambda r: r["token_count"] >= args.min_tokens)
    keep = lang_id(keep)
    if args.lm_score:
        import ray as _ray

        model = train_bigram_lm(
            ray.data.read_parquet(args.input), text_col=tcol,
            min_count=args.lm_min_count)
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        scored = score_perplexity(keep, model, text_col=tcol,
                                  id_col=args.id_col)
        keep = keep.join(
            scored.select_columns([args.id_col, "perplexity"]),
            join_type="left_outer",
            num_partitions=max(2, min(16, cpus)), on=(args.id_col,))
    os.makedirs(args.out, exist_ok=True)
    keep.write_parquet(args.out, partition_cols=["lang_pred"])
    n = ray.data.read_parquet(args.out).count()
    return {"job": "curate", "out": args.out, "rows": n,
            "secs": round(time.perf_counter() - t0, 3)}


def cmd_pack(args) -> dict:
    """Sequence-packing job (pipelines/packing.pack_sequences): cut the
    curated corpus token stream into fixed-budget packs, written as
    PARTITIONED parquet (one directory per pack range) so a failed run
    resumes by skipping finished partitions. Chain after `curate`:
    curate --out /c && pack --input /c --out /p --budget 2048."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from lucene_ray.pipelines.packing import pack_sequences

    t0 = time.perf_counter()
    ds = ray.data.read_parquet(args.input,
                               columns=[args.id_col, args.text_col])
    segs = pack_sequences(ds, budget=args.budget, text_col=args.text_col,
                          id_col=args.id_col, bucket_docs=args.bucket_docs)
    per = args.packs_per_part

    def part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pack_part", pc.divide(b["pack_id"], per))

    os.makedirs(args.out, exist_ok=True)
    segs.map_batches(part, batch_format="pyarrow").write_parquet(
        args.out, partition_cols=["pack_part"])
    n = ray.data.read_parquet(args.out).count()
    return {"job": "pack", "out": args.out, "segments": n,
            "budget": args.budget,
            "secs": round(time.perf_counter() - t0, 3)}


def cmd_vector_build(args) -> dict:
    """Build any of the persisted vector index families over an
    embeddings parquet (kind: hnsw | ivf | pq | ivfpq | sq)."""
    from lucene_ray.index import vector as V

    t0 = time.perf_counter()
    if args.kind == "hnsw":
        man = V.build_vector_index(args.input, args.out,
                                   n_shards=args.shards, m=args.m)
    elif args.kind == "ivf":
        man = V.build_ivf_index(args.input, args.out,
                                n_centroids=args.centroids)
    elif args.kind == "pq":
        man = V.build_pq_index(args.input, args.out, m=args.m,
                               nbits=args.nbits)
    elif args.kind == "ivfpq":
        man = V.build_ivfpq_index(args.input, args.out,
                                  n_centroids=args.centroids, m=args.m,
                                  nbits=args.nbits)
    else:
        man = V.build_sq_index(args.input, args.out)
    return {"job": "vector-build", "kind": args.kind,
            "out": args.out, "secs": round(time.perf_counter() - t0, 3),
            "manifest_keys": sorted(man)}


def cmd_vector_search(args) -> dict:
    """Query a persisted vector index; query vectors = the first N rows
    of --queries (an embeddings-shaped parquet)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.index import vector as V

    Qm = np.stack(
        pq.read_table(args.queries).slice(0, args.n_queries)["embedding"]
        .to_pylist())
    t0 = time.perf_counter()
    if args.kind == "hnsw":
        t = V.VectorSearcher(args.index, num_executors=args.executors
                             ).search(Qm, k=args.k)
    elif args.kind == "ivf":
        t = V.ivf_search(args.index, Qm, k=args.k, nprobe=args.nprobe,
                         verbose=False)
    elif args.kind == "pq":
        t = V.pq_search(args.index, Qm, k=args.k, refine=args.refine)
    elif args.kind == "ivfpq":
        t = V.ivfpq_search(args.index, Qm, k=args.k, nprobe=args.nprobe,
                           refine=args.refine)
    else:
        t = V.sq_search(args.index, Qm, k=args.k, refine=args.refine)
    return {"job": "vector-search", "kind": args.kind, "rows": t.num_rows,
            "secs": round(time.perf_counter() - t0, 3)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ray_job.py")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=None)
    b.add_argument("--positions", action="store_true")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--analyzer", default="standard",
                   choices=["standard", "english"])
    b.add_argument("--field", action="append",
                   help="extra field as name=column (repeatable)")
    b.set_defaults(fn=cmd_build)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--mode", default="tiered", choices=["tiered", "force"])
    m.add_argument("--group-size", type=int, default=4)
    m.add_argument("--terms-per-shard", type=int, default=1 << 20)
    m.set_defaults(fn=cmd_merge)

    info = sub.add_parser("info")
    info.add_argument("--index", required=True)
    info.set_defaults(fn=cmd_info)

    qa = sub.add_parser("quality")
    qa.add_argument("--index", required=True)
    qa.add_argument("--queries", required=True,
                    help="comma-separated query terms")
    qa.add_argument("--k", type=int, default=10)
    qa.add_argument("--min-tf", type=int, default=2)
    qa.set_defaults(fn=cmd_quality)

    sp = sub.add_parser("split")
    sp.add_argument("--index", required=True)
    sp.add_argument("--first", required=True)
    sp.add_argument("--second", required=True)
    sp.add_argument("--query", required=True)
    sp.add_argument("--group-size", type=int, default=8)
    sp.set_defaults(fn=cmd_split)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--executors", type=int, default=4)
    s.add_argument("--replicas", type=int, default=1)
    s.set_defaults(fn=cmd_search)

    bq = sub.add_parser("bench-queries")
    bq.add_argument("--index", required=True)
    bq.add_argument("--queries", required=True)
    bq.add_argument("--k", type=int, default=10)
    bq.add_argument("--rounds", type=int, default=5)
    bq.add_argument("--executors", type=int, default=4)
    bq.add_argument("--replicas", type=int, default=1)
    bq.set_defaults(fn=cmd_bench_queries)

    cu = sub.add_parser("curate")
    cu.add_argument("--input", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--url-col", default="url")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--min-tokens", type=int, default=20)
    cu.add_argument("--lm-score", action="store_true")
    cu.add_argument("--lm-min-count", type=int, default=2)
    cu.set_defaults(fn=cmd_curate)

    pk = sub.add_parser("pack")
    pk.add_argument("--input", required=True)
    pk.add_argument("--out", required=True)
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--text-col", default="text")
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--bucket-docs", type=int, default=65536)
    pk.add_argument("--packs-per-part", type=int, default=4096)
    pk.set_defaults(fn=cmd_pack)

    vb = sub.add_parser("vector-build")
    vb.add_argument("--input", required=True)
    vb.add_argument("--out", required=True)
    vb.add_argument("--kind", default="hnsw",
                    choices=["hnsw", "ivf", "pq", "ivfpq", "sq"])
    vb.add_argument("--shards", type=int, default=4)
    vb.add_argument("--centroids", type=int, default=16)
    vb.add_argument("--m", type=int, default=8)
    vb.add_argument("--nbits", type=int, default=8)
    vb.set_defaults(fn=cmd_vector_build)

    vs = sub.add_parser("vector-search")
    vs.add_argument("--index", required=True)
    vs.add_argument("--queries", required=True)
    vs.add_argument("--kind", default="hnsw",
                    choices=["hnsw", "ivf", "pq", "ivfpq", "sq"])
    vs.add_argument("--k", type=int, default=10)
    vs.add_argument("--n-queries", type=int, default=8)
    vs.add_argument("--nprobe", type=int, default=4)
    vs.add_argument("--refine", type=int, default=0)
    vs.add_argument("--executors", type=int, default=2)
    vs.set_defaults(fn=cmd_vector_search)

    args = p.parse_args(argv)
    _init_ray()
    try:
        out = args.fn(args)
    finally:
        import ray

        ray.shutdown()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
