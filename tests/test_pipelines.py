"""Training-data pipeline guarantees that the SQL oracle can't express:
ANN recall under partial probing, LSH candidate recall vs exact Jaccard,
fingerprint determinism, media plumbing."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_ivf_recall_vs_brute(emb_ds, sf_dir):
    """Partial probing (6 of 8 buckets) must keep mean recall@10 >= 0.9 vs
    brute cosine; nprobe=n_centroids exactness is oracle-checked by the
    knn_ivf_full_probe driver entry."""
    from lucene_ray.pipelines.ann import knn_brute_cosine, knn_ivf_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    Qm = np.stack(pq.read_table(emb_path).slice(0, 5)["embedding"].to_pylist())
    brute = knn_brute_cosine(emb_ds, Qm, k=10)
    ivf = knn_ivf_cosine(emb_ds, Qm, k=10, n_centroids=8, nprobe=6)
    bq = brute["query_id"].to_numpy()
    bn = brute["neighbor_id"].to_numpy()
    iq = ivf["query_id"].to_numpy()
    inb = ivf["neighbor_id"].to_numpy()
    recalls = []
    for j in range(Qm.shape[0]):
        want = set(bn[bq == j].tolist())
        got = set(inb[iq == j].tolist())
        recalls.append(len(want & got) / max(1, len(want)))
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_candidates_superset_of_high_jaccard(ray_session, sf_dir):
    """MinHash+LSH banding must surface every exact-Jaccard >= 0.9 pair as
    a candidate (the standard LSH recall guarantee at our band shape)."""
    from lucene_ray.data.webpages import webpages_dataset
    from lucene_ray.pipelines.dedup import jaccard_pairs, minhash_lsh_candidates

    pages = webpages_dataset(sf_dir)
    exact = pa.concat_tables(
        jaccard_pairs(pages, shingle_n=2, threshold=0.9)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    cand = pa.concat_tables(
        minhash_lsh_candidates(webpages_dataset(sf_dir))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    cand_pairs = set(zip(cand["a"].to_pylist(), cand["b"].to_pylist()))
    assert exact_pairs, "fixture corpus should contain near-dup pairs"
    missed = exact_pairs - cand_pairs
    assert not missed, f"LSH missed {len(missed)} of {len(exact_pairs)} pairs"


def test_fingerprints_deterministic_and_order_sensitive(ray_session, sf_dir):
    from lucene_ray.data.webpages import webpages_dataset
    from lucene_ray.pipelines.dedup import simhash_fingerprints
    from lucene_ray.pipelines.textstats import doc_fingerprints

    a = pa.concat_tables(
        doc_fingerprints(webpages_dataset(sf_dir))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by("doc_id")
    b = pa.concat_tables(
        doc_fingerprints(webpages_dataset(sf_dir))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by("doc_id")
    assert a["fingerprint"].to_pylist() == b["fingerprint"].to_pylist()

    s = pa.concat_tables(
        simhash_fingerprints(webpages_dataset(sf_dir))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by("doc_id")
    # identical texts (dup re-crawls share text) -> identical simhash
    import ray.data

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id"])
    ids = s["doc_id"].to_numpy()
    fps = s["simhash"].to_numpy() if "simhash" in s.column_names else s[s.column_names[1]].to_numpy()
    by_id = dict(zip(ids.tolist(), fps.tolist()))
    dup_base = [d for d in docs["doc_id"].to_pylist() if d % 10 == 0]
    assert dup_base
    for d in dup_base[:20]:
        assert by_id[d] == by_id[d + 1_000_000]  # re-crawl has same text


def test_media_decode_plumbing(ray_session):
    import ray.data

    from lucene_ray.pipelines.multimodal import (
        DecodeImageStub,
        decode_features,
        resize_metadata,
        synth_media_table,
    )

    media = synth_media_table(64)
    out = pa.concat_tables(
        decode_features(ray.data.from_arrow(media), concurrency=2, batch_size=16)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by("media_id")
    assert out.num_rows == 64
    feats = out["feature"]
    assert len(feats[0].as_py()) == DecodeImageStub.FEATURE_DIM
    # deterministic across runs
    out2 = pa.concat_tables(
        decode_features(ray.data.from_arrow(media), concurrency=2, batch_size=16)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by("media_id")
    assert out["feature"].to_pylist() == out2["feature"].to_pylist()
    # strict mode is the honest stub
    with pytest.raises(Exception):
        pa.concat_tables(
            decode_features(ray.data.from_arrow(media), strict=True)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
    rm = pa.concat_tables(
        resize_metadata(ray.data.from_arrow(media), max_side=256)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    assert (np.maximum(rm["out_width"].to_numpy(), rm["out_height"].to_numpy()) <= 256).all()


def test_dedup_join_strategy_matches_broadcast(ray_session, sf_dir):
    """The distributed hash-semi-join winner filter (10^10+-key path) must
    produce exactly the broadcast path's rows."""
    import pyarrow.compute as pc

    from lucene_ray.data.webpages import webpages_dataset
    from lucene_ray.pipelines.dedup import dedup_exact

    def rows(strategy):
        t = pa.concat_tables(
            dedup_exact(webpages_dataset(sf_dir), strategy=strategy)
            .select_columns(["doc_id", "url"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("doc_id")

    a, b = rows("broadcast"), rows("join")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["url"].to_pylist() == b["url"].to_pylist()


def test_jaccard_join_strategy_matches_broadcast(ray_session, sf_dir):
    from lucene_ray.data.webpages import webpages_dataset
    from lucene_ray.pipelines.dedup import jaccard_pairs

    def rows(strategy):
        t = pa.concat_tables(
            jaccard_pairs(webpages_dataset(sf_dir), shingle_n=2, threshold=0.8,
                          strategy=strategy)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by([("a", "ascending"), ("b", "ascending")])

    a, b = rows("broadcast"), rows("join")
    assert a["a"].to_pylist() == b["a"].to_pylist()
    assert a["b"].to_pylist() == b["b"].to_pylist()
    assert np.allclose(a["jaccard"].to_numpy(), b["jaccard"].to_numpy())


def test_embedding_near_dup_lsh_recall(emb_ds):
    """The hyperplane-LSH scale path must recover most exact pairs (and
    report only true pairs — candidates verify exactly)."""
    from lucene_ray.pipelines.ann import embedding_near_dup

    exact = embedding_near_dup(emb_ds, threshold=0.42, method="exact")
    lsh = embedding_near_dup(emb_ds, threshold=0.42, method="lsh")
    ep = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    lp = set(zip(lsh["a"].to_pylist(), lsh["b"].to_pylist()))
    assert ep, "threshold should yield pairs on the fixture embeddings"
    assert lp <= ep  # precision 1.0 (exact verify)
    assert len(lp & ep) / len(ep) >= 0.6  # banded recall at 0.42 cosine


def test_embedding_near_dup_join_verify_matches_broadcast(emb_ds):
    """The join-based verify (10^9+-vector path) must produce the same
    pairs/cosines as the broadcast verify for the same LSH candidates."""
    from lucene_ray.pipelines.ann import embedding_near_dup

    a = embedding_near_dup(emb_ds, threshold=0.42, method="lsh",
                           verify="broadcast")
    b = embedding_near_dup(emb_ds, threshold=0.42, method="lsh",
                           verify="join")
    assert a["a"].to_pylist() == b["a"].to_pylist()
    assert a["b"].to_pylist() == b["b"].to_pylist()
    assert np.allclose(a["cosine"].to_numpy(), b["cosine"].to_numpy())


def test_sessionize_boundary_merging(ray_session):
    """Sessions spanning block boundaries must merge exactly once — build a
    corpus where one user's session crosses every block edge."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.events import sessionize

    # user 1: events every 60s for 300 events (ONE long session); user 2:
    # isolated events 2h apart (one session each); shuffled into 8 blocks
    ts1 = np.arange(300) * 60
    ts2 = np.arange(20) * 7200 + 7
    u = np.concatenate([np.ones(300, np.int64), np.full(20, 2, np.int64)])
    t = np.concatenate([ts1, ts2]) * 1_000_000
    rng = np.random.default_rng(0)
    order = rng.permutation(u.shape[0])
    tbl = pa.table({
        "user_id": u[order],
        "ts": pa.array(t[order]).cast(pa.timestamp("us")),
        "value": np.ones(u.shape[0]),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = pa.concat_tables(
        sessionize(ds, gap_s=1800)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by([("user_id", "ascending"), ("session_start", "ascending")])
    u_out = out["user_id"].to_pylist()
    n_out = out["n_events"].to_pylist()
    assert u_out.count(1) == 1 and n_out[u_out.index(1)] == 300
    assert u_out.count(2) == 20


def test_monitor_percolation_matches_searcher(built_index, sf_dir):
    """Percolator matches over the doc stream must equal the inverted
    index's hit sets for the same queries (Monitor/MemoryIndex role)."""
    import ray.data

    from lucene_ray.pipelines.monitor import monitor_matches
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    queries = ["table", "+key -value", '"key value"', "sp*"]
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    t = pa.concat_tables(
        monitor_matches(ds, queries, concurrency=2)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    qid = t["query_id"].to_numpy()
    did = t["doc_id"].to_numpy()
    for i, q in enumerate(queries):
        want, _sc = s.search_all(q)
        assert set(did[qid == i].tolist()) == set(want.tolist()), q


def test_hnsw_recall_and_determinism(emb_ds, sf_dir):
    """Shard-local HNSW graphs (Lucene99HnswVectorsFormat role): mean
    recall@10 >= 0.9 vs brute cosine, and identical output across rebuilds
    (levels derive from vec ids, not an RNG)."""
    import ray.data

    from lucene_ray.pipelines.ann import knn_brute_cosine
    from lucene_ray.pipelines.hnsw import knn_hnsw_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    Qm = np.stack(pq.read_table(emb_path).slice(0, 5)["embedding"].to_pylist())
    brute = knn_brute_cosine(emb_ds, Qm, k=10)
    h1 = knn_hnsw_cosine(ray.data.read_parquet(emb_path), Qm, k=10,
                         n_shards=2, m=8, ef=64)
    h2 = knn_hnsw_cosine(ray.data.read_parquet(emb_path), Qm, k=10,
                         n_shards=2, m=8, ef=64)
    assert h1.equals(h2)
    bq = brute["query_id"].to_numpy()
    bn = brute["neighbor_id"].to_numpy()
    hq = h1["query_id"].to_numpy()
    hn = h1["neighbor_id"].to_numpy()
    recalls = [
        len(set(bn[bq == j]) & set(hn[hq == j])) / 10 for j in range(5)
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_drill_sideways_null_dim_values(ray_session):
    """A null in a selected dim column must count as non-matching, not
    crash the mask combination (review finding: object-dtype mask)."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.facets import drill_sideways_counts

    tbl = pa.table({
        "lang": pa.array(["de", None, "en", "de"]),
        "source": pa.array(["a", "a", None, "b"]),
    })
    t = drill_sideways_counts(ray.data.from_arrow(tbl),
                              {"lang": "de", "source": "a"})
    rows = {(r["dim"], r["value"]): r["count()"] for r in t.take_all()}
    # sideways for lang: rows with source=='a' (null source excluded)
    assert rows.get(("lang", "de")) == 1
    # sideways for source: rows with lang=='de'
    assert rows == {("lang", "de"): 1, ("source", "a"): 1, ("source", "b"): 1}


def test_free_text_suggest_backoff_and_boundaries(ray_session):
    """FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java:120):
    bigram conditional beats unigram backoff; pairs never cross document
    boundaries; alpha scales the backoff branch."""
    import numpy as np
    import ray.data

    from lucene_ray.pipelines.suggest import free_text_suggest

    docs = [
        {"text": "go west young man"},          # 'go west'
        {"text": "go west go"},                 # 'go west' again; trailing 'go'
        {"text": "west wind"},                  # boundary: prior 'go' must not pair
        {"text": "go home now"},                # 'go home'
        {"text": "wild walk"},                  # unigram-only candidates
    ]
    ds = ray.data.from_items(docs)
    t = free_text_suggest(ds, "go", "w", k=10, alpha=0.4)
    terms = t["term"].to_pylist()
    scores = dict(zip(terms, t["score"].to_pylist()))
    # counts: tokens N=14, count(go)=4; bigrams after 'go': west x2
    # (boundary blocks the third 'west', trailing 'go' pairs nothing)
    assert scores["west"] == round(2 / 4, 6)
    # backoff candidates: wind/wild/walk get 0.4 * 1/14
    exp_backoff = round(0.4 * 1 / 14, 6)
    for w in ("wind", "wild", "walk"):
        assert scores[w] == exp_backoff
    assert terms[0] == "west"  # conditional outranks backoff
    np.testing.assert_array_equal(
        t["rank"].to_numpy(), np.arange(1, len(terms) + 1))


def test_monitor_multiterm_not_poisoned_by_query_cache(ray_session):
    """Regression (round-3 review): BatchMemoryReader shares one
    '<memory>' identity across streamed batches, so the default-on
    LRUQueryCache must bypass it — a registered wildcard query over many
    batches has to match per-batch, never replay another batch's docs."""
    import pyarrow as pa

    from lucene_ray.pipelines.monitor import QueryMonitor
    from lucene_ray.search.querycache import get_query_cache

    mon = QueryMonitor(["wi*"])
    batches = [
        pa.table({"doc_id": [10], "text": ["wind blows"]}),
        pa.table({"doc_id": [20, 21], "text": ["nothing here", "wild walk"]}),
        pa.table({"doc_id": [30], "text": ["no match at all"]}),
        pa.table({"doc_id": [40, 41, 42],
                  "text": ["winter", "plain", "wing span"]}),
    ]
    assert get_query_cache() is not None  # default-on, the dangerous config
    got = [sorted(mon(b)["doc_id"].to_pylist()) for b in batches]
    assert got == [[10], [21], [], [40, 42]]


def test_rollback_preserves_snapshotted_newer_commit(tmp_path, sf_dir,
                                                     ray_session):
    """Regression (round-3 review): rollback must not delete a NEWER
    snapshotted commit point, and numbering continues past it (no
    generation aliasing under a live pin)."""
    import os

    from lucene_ray.index.build import add_documents, build_index
    from lucene_ray.index.commits import (latest_generation, list_commits,
                                          rollback, snapshot)
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    import ray.data

    idx = str(tmp_path / "idx")
    build_index(os.path.join(sf_dir, "documents.parquet"), idx,
                num_segments=2)
    g1 = snapshot(idx)
    extra = ray.data.from_items(
        [{"doc_id": 20_000 + i, "text": "pinned addition"} for i in range(4)])
    add_documents(extra, idx, num_segments=1)
    g2 = snapshot(idx)  # pin the newer point too
    n2 = Searcher(idx).count(Q.MatchAllDocsQuery())

    rollback(idx, g1)
    gens = [c["generation"] for c in list_commits(idx)]
    assert gens == [g1, g2]  # the pinned newer point survived
    # the pinned point still opens with its full state
    assert Searcher(idx, commit=g2).count(Q.MatchAllDocsQuery()) == n2
    # numbering continues PAST the surviving pin — no aliasing
    add_documents(extra, idx, num_segments=1)
    assert latest_generation(idx) == g2 + 1


def test_decontaminate_counts_distinct_overlap(ray_session):
    """decontaminate: n_hits counts DISTINCT shared shingles (repeats in
    a doc count once); min_hits thresholds; non-overlapping docs drop."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.dedup import decontaminate

    bench = pa.table({"text": ["alpha beta gamma delta"]})
    # doc 1: two distinct benchmark trigrams, one of them twice
    # doc 2: one benchmark trigram; doc 3: none
    corpus = ray.data.from_items([
        {"doc_id": 1, "text": "alpha beta gamma delta x alpha beta gamma"},
        {"doc_id": 2, "text": "z alpha beta gamma z"},
        {"doc_id": 3, "text": "completely different words here"},
    ])
    t = pa.concat_tables(
        decontaminate(corpus, bench, shingle_n=3, min_hits=1)
        .iter_batches(batch_format="pyarrow"))
    got = dict(zip(t["doc_id"].to_pylist(), t["n_hits"].to_pylist()))
    assert got == {1: 2, 2: 1}

    t2 = pa.concat_tables(
        decontaminate(corpus, bench, shingle_n=3, min_hits=2)
        .iter_batches(batch_format="pyarrow"))
    assert t2["doc_id"].to_pylist() == [1]


def test_quality_metrics_golden():
    """QualityStats math (benchmark/quality/QualityStats.java:28-160):
    hand-checked P@k / AP / nDCG / recall on a tiny ranked list."""
    import numpy as np

    from lucene_ray.pipelines.quality import topic_metrics

    # ranked: d1 d2 d3 d4 d5; relevant = {d1, d3, d9} (d9 never retrieved)
    m = topic_metrics(np.array([1, 2, 3, 4, 5]), {1, 3, 9}, k=5)
    assert m["num_rel"] == 3
    assert abs(m["p_at_k"] - 2 / 5) < 1e-12
    # AP = (1/1 + 2/3) / 3
    assert abs(m["ap"] - (1.0 + 2.0 / 3.0) / 3.0) < 1e-12
    # DCG = 1/log2(2) + 1/log2(4) = 1.5; IDCG = 1/log2(2)+1/log2(3)+1/log2(4)
    idcg = 1.0 + 1.0 / np.log2(3.0) + 0.5
    assert abs(m["ndcg"] - 1.5 / idcg) < 1e-12
    assert abs(m["recall"] - 2 / 3) < 1e-12
    # degenerate: no relevant docs -> all zeros, no division error
    z = topic_metrics(np.array([1, 2]), set(), k=5)
    assert (z["ap"], z["ndcg"], z["recall"]) == (0.0, 0.0, 0.0)


def test_content_sources_roundtrip(ray_session, tmp_path_factory):
    """LineDocSource / TREC / JSONL feeds (benchmark/byTask/feeds/
    LineDocSource.java:47, TrecContentSource.java:63): write+read
    round-trips preserve ids, order, and tab-containing bodies; an index
    built from a line-doc feed answers queries."""
    import json
    import os

    import pyarrow as pa
    import ray.data

    from lucene_ray.data.sources import (read_jsonl_docs, read_line_docs,
                                         read_trec, write_line_docs,
                                         write_trec)
    from lucene_ray.index.build import build_index
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    d = tmp_path_factory.mktemp("sources")
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["alpha beta", "tab\there gamma", "alpha solo"]),
        "title": pa.array(["t0", "t1", "t2"]),
    })
    lp = write_line_docs(t, str(d / "l.tsv"), title_col="title")
    back = read_line_docs(lp).take_all()
    assert [r["doc_id"] for r in back] == [0, 1, 2]
    assert back[1]["text"] == "tab\there gamma"  # body tabs survive
    assert [r["title"] for r in back] == ["t0", "t1", "t2"]

    tp = write_trec(t, str(d / "t.trec"))
    tb = sorted(read_trec(tp).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in tb] == t["text"].to_pylist()

    jp = str(d / "j.jsonl")
    with open(jp, "w") as f:
        for r in t.to_pylist():
            f.write(json.dumps(r) + "\n")
    jb = sorted(read_jsonl_docs(jp).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in jb] == t["text"].to_pylist()

    # a feed is a first-class build source
    idx = str(d / "idx")
    build_index(read_line_docs(lp).map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow"),
        idx, num_segments=1)
    s = Searcher(idx)
    docs, _ = s.search_all(Q.TermQuery("alpha"))
    assert set(docs.tolist()) == {0, 2}


def test_enwiki_source_roundtrip(ray_session, tmp_path_factory):
    """EnwikiContentSource (feeds/EnwikiContentSource.java:47): wiki-dump
    page blocks round-trip ids, titles, and bodies."""
    import pyarrow as pa

    from lucene_ray.data.sources import read_enwiki, write_enwiki

    t = pa.table({
        "doc_id": pa.array([7, 8], type=pa.int64()),
        "text": pa.array(["wiki body one", "second page\nwith newline"]),
        "title": pa.array(["Page A", "Page B"]),
    })
    p = str(tmp_path_factory.mktemp("wiki") / "dump.xml")
    write_enwiki(t, p, title_col="title")
    back = sorted(read_enwiki(p).take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in back] == [7, 8]
    assert [r["title"] for r in back] == ["Page A", "Page B"]
    assert back[1]["text"] == "second page\nwith newline"


def test_byte_range_sources_boundary_exactness(ray_session, tmp_path_factory):
    """Round-4: read_trec/read_enwiki parallelize a SINGLE file by byte
    range with block-boundary reconciliation. With a range far smaller
    than a block, every block straddles ranges — each must parse exactly
    once (no duplicates, no drops), and alphanumeric DOCNOs (real TREC
    collections) must not crash the reader (round-3 advisor finding)."""
    import pyarrow as pa

    from lucene_ray.data.sources import (read_enwiki, read_trec,
                                         write_enwiki, write_trec)

    d = tmp_path_factory.mktemp("ranges")
    n = 40
    # no leading/trailing whitespace: the TREC/enwiki readers strip the
    # block's surrounding whitespace, as the file-per-task readers did
    texts = [(f"body text number {i} " + "pad " * (i % 7)).strip()
             for i in range(n)]

    # TREC with alphanumeric DOCNOs (LA010189-0001 style)
    t = pa.table({
        "doc_id": pa.array([f"LA0101{i:02d}-0001" for i in range(n)]),
        "text": pa.array(texts),
    })
    tp = str(d / "alpha.trec")
    write_trec(t, tp)
    got = read_trec(tp, range_bytes=96).take_all()
    assert len(got) == n
    assert sorted(r["docno"] for r in got) == sorted(
        f"LA0101{i:02d}-0001" for i in range(n))
    by_no = {r["docno"]: r for r in got}
    for i in range(n):
        r = by_no[f"LA0101{i:02d}-0001"]
        assert r["text"] == texts[i]
        assert isinstance(r["doc_id"], int)  # stable hash, no ValueError
    # ids are stable across reads and distinct
    again = read_trec(tp, range_bytes=96).take_all()
    assert {r["docno"]: r["doc_id"] for r in again} == {
        r["docno"]: r["doc_id"] for r in got}
    assert len({r["doc_id"] for r in got}) == n

    # numeric DOCNOs keep their value (back-compat with the writer)
    t2 = pa.table({"doc_id": pa.array(list(range(n)), pa.int64()),
                   "text": pa.array(texts)})
    tp2 = str(d / "num.trec")
    write_trec(t2, tp2)
    got2 = sorted(read_trec(tp2, range_bytes=64).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in got2] == list(range(n))
    assert [r["text"] for r in got2] == texts

    # enwiki single file, ranges much smaller than a page
    ep = str(d / "dump.xml")
    write_enwiki(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts),
    }), ep)
    pages = sorted(read_enwiki(ep, range_bytes=64).take_all(),
                   key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in pages] == list(range(n))
    assert [r["text"] for r in pages] == texts


def test_free_text_suggest_bounded_model(ray_session):
    """Round-4: the free-text model is bounded before driver collection —
    a corpus with hundreds of thousands of distinct grams and a prefix
    matching ALL of them completes quickly with the driver holding at
    most (orders+2)*cand_cap rows, and the exact top-k is unaffected by
    a cap far above k."""
    import time

    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.suggest import free_text_suggest

    rng = np.random.default_rng(3)
    # ~300k distinct tokens (every token unique except the planted ones)
    uniq = [f"t{i:06d}" for i in range(120_000)]
    planted = ["go north"] * 30 + ["go nowhere"] * 10
    docs = [" ".join(uniq[i:i + 50]) for i in range(0, 120_000, 50)]
    texts = docs + planted
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))

    t0 = time.perf_counter()
    out = free_text_suggest(ds, context="go", prefix="n", k=2, cand_cap=64)
    dt = time.perf_counter() - t0
    assert dt < 60  # bounded collection, not a driver-side vocab dict
    assert out["term"].to_pylist()[:2] == ["north", "nowhere"]

    # a prefix matching EVERY token: the capped model still answers and
    # the driver row count is bounded by the cap per kind
    out2 = free_text_suggest(ds, context="go", prefix="t", k=2, cand_cap=64)
    assert out2.num_rows == 2


def test_line_docs_byte_ranges_sequential_ids(ray_session, tmp_path_factory):
    """read_line_docs parallelizes by byte range while keeping the
    format's sequential-id contract: doc_id = global line number, exact
    across range boundaries far smaller than a line."""
    import pyarrow as pa

    from lucene_ray.data.sources import read_line_docs, write_line_docs

    d = tmp_path_factory.mktemp("ld")
    n = 37
    texts = [f"line body {i} " + "x" * (i % 23) for i in range(n)]
    t = pa.table({"text": pa.array(texts)})
    lp = str(d / "docs.tsv")
    write_line_docs(t, lp)
    got = sorted(read_line_docs(lp, range_bytes=48).take_all(),
                 key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in got] == list(range(n))
    assert [r["text"] for r in got] == texts


def test_asof_and_range_join(ray_session):
    """AS-OF and RANGE joins (pipelines/events.py): hand-checked tiny
    stream — latest at-or-before match, tolerance cutoff, equal-ts tie
    (max value wins, the documented rule), empty right side, and the
    windowed count/sum against brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.events import asof_join, range_join

    def mk(rows):
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }))

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    S = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    left = mk([(100, 1, S(50), 0.0), (101, 1, S(5), 0.0),
               (102, 2, S(50), 0.0), (103, 3, S(50), 0.0)])
    right = mk([(1, 1, S(10), 1.0), (2, 1, S(40), 2.0),
                (3, 1, S(40), 5.0),          # equal-ts tie: max value
                (4, 2, S(60), 9.0)])         # after the left row

    out = {r["left_id"]: r for r in asof_join(left, right).take_all()}
    assert out[100]["right_ts_us"] is not None
    assert out[100]["right_value"] == 5.0    # ts=40, tie -> max value
    assert out[101]["right_value"] is None   # nothing at or before t=5
    assert out[102]["right_value"] is None   # right row is AFTER left
    assert out[103]["right_value"] is None   # user has no right rows
    # tolerance: the t=40 match is 10 s old; a 5 s tolerance kills it
    out2 = {r["left_id"]: r
            for r in asof_join(left, right, tolerance_s=5).take_all()}
    assert out2[100]["right_value"] is None

    rj = {r["left_id"]: r
          for r in range_join(left, right, lo_s=-45, hi_s=0).take_all()}
    assert rj[100]["n_right"] == 3 and rj[100]["sum_right"] == 8.0
    assert rj[101]["n_right"] == 0 and rj[101]["sum_right"] == 0.0
    assert rj[102]["n_right"] == 0


def test_video_frame_sampling_plumbing(ray_session):
    """Frame sampling (the video leg of the multimodal set): the frame
    PLAN is exact (one frame per interval, capped), rows are
    deterministic across runs, and strict mode stays the honest stub."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.multimodal import (SampleFramesStub,
                                                 sample_frames,
                                                 synth_video_table)

    vids = synth_video_table(24)
    out = pa.concat_tables(
        sample_frames(ray.data.from_arrow(vids), every_ms=10_000,
                      max_frames=4, concurrency=2, batch_size=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])

    dur = vids["duration_ms"].to_numpy()
    want = np.minimum(dur // 10_000 + 1, 4)
    got_counts = np.bincount(out["media_id"].to_numpy(), minlength=24)
    assert got_counts.tolist() == want.tolist()
    # timestamps are the plan, frames 32-byte deterministic slices
    assert out["ts_ms"].to_pylist()[:4] == [0, 10_000, 20_000, 30_000][: int(want[0])]
    out2 = pa.concat_tables(
        sample_frames(ray.data.from_arrow(vids), every_ms=10_000,
                      max_frames=4).iter_batches(batch_format="pyarrow",
                                                 batch_size=1 << 16)
    ).sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])
    assert out["frame"].to_pylist() == out2["frame"].to_pylist()

    import pytest

    with pytest.raises(Exception):
        pa.concat_tables(
            sample_frames(ray.data.from_arrow(vids), strict=True)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))


def test_pack_sequences_semantics_and_block_invariance(ray_session):
    """pipelines/packing.pack_sequences: concat-and-chunk packing —
    every pack except the last is exactly `budget` tokens, segments
    tile each document without gaps, docs straddle boundaries, and the
    result is independent of input block structure and bucket size."""
    import ray.data

    from lucene_ray.pipelines.packing import pack_sequences

    # doc 0: 3 tokens, doc 1: 10 (straddles B=8), doc 2: 20 (spans 3 packs)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "a b c",
            " ".join(f"t{i}" for i in range(10)),
            " ".join(f"u{i}" for i in range(20)),
        ]),
    })
    out = pa.concat_tables(
        pack_sequences(ray.data.from_arrow(docs), budget=8, bucket_docs=2)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    ).sort_by([("pack_id", "ascending"), ("doc_id", "ascending")])
    rows = list(zip(out["pack_id"].to_pylist(), out["doc_id"].to_pylist(),
                    out["begin_tok"].to_pylist(), out["end_tok"].to_pylist()))
    # offsets: doc0 [0,3), doc1 [3,13), doc2 [13,33); packs of 8
    assert rows == [
        (0, 0, 0, 3), (0, 1, 0, 5),          # pack 0 = tokens 0..8
        (1, 1, 5, 10), (1, 2, 0, 3),          # pack 1 = tokens 8..16
        (2, 2, 3, 11),                        # pack 2 = tokens 16..24
        (3, 2, 11, 19),                       # pack 3 = tokens 24..32
        (4, 2, 19, 20),                       # tail pack
    ]
    # per-pack token totals: all full except the tail
    sizes = {}
    for p, _d, b, e in rows:
        sizes[p] = sizes.get(p, 0) + (e - b)
    assert [sizes[p] for p in sorted(sizes)] == [8, 8, 8, 8, 1]

    # block-structure + bucket-size invariance on a larger random corpus
    rng = np.random.default_rng(7)
    big = pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "text": pa.array([
            " ".join(f"w{j}" for j in range(int(rng.integers(1, 40))))
            for _ in range(200)
        ]),
    })

    def run(ds, **kw):
        return pa.concat_tables(
            pack_sequences(ds, budget=64, **kw)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by([("pack_id", "ascending"), ("doc_id", "ascending")])

    a = run(ray.data.from_arrow(big), bucket_docs=16)
    b = run(ray.data.from_arrow(big).repartition(13), bucket_docs=64)
    assert a.equals(b)


def test_blended_infix_suggest_blenders(ray_session):
    """BlendedInfixSuggester (suggest/analyzing/BlendedInfixSuggester
    .java:60): first-match position drives the coefficient for all
    three BlenderTypes; weights multiply."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.suggest import blended_infix_suggest

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "tabby cat sits",          # match at position 0
            "the striped tabby",       # match at position 2
            "a tab stop",              # match at position 1
            "no match here",
        ]),
        "w": pa.array([10.0, 10.0, 10.0, 10.0]),
    })
    ds = ray.data.from_arrow(docs)
    lin = blended_infix_suggest(ds, "tab", blender="linear",
                                weight_col="w")
    got = {r["doc_id"]: (r["position"], round(r["score"], 6))
           for r in lin.to_pylist()}
    assert got == {0: (0, 10.0), 1: (2, 8.0), 2: (1, 9.0)}
    rec = blended_infix_suggest(ds, "tab", blender="reciprocal",
                                weight_col="w")
    got_r = {r["doc_id"]: round(r["score"], 6) for r in rec.to_pylist()}
    assert got_r == {0: 10.0, 1: round(10 / 3, 6), 2: 5.0}
    exp = blended_infix_suggest(ds, "tab", blender="exp_reciprocal",
                                exponent=2.0, weight_col="w")
    got_e = {r["doc_id"]: round(r["score"], 6) for r in exp.to_pylist()}
    assert got_e == {0: 10.0, 1: round(10 / 9, 6), 2: 2.5}
    # k cap + default weight 1
    top1 = blended_infix_suggest(ds, "tab", k=1)
    assert top1.num_rows == 1 and top1["doc_id"][0].as_py() == 0


def test_quality_benchmark_stats(built_index, brute_force):
    """QualityStats roles: P@k / recall / truncated AP / MRR against the
    deterministic tf>=2 Judge, checked on a hand-computed fixture."""
    import numpy as np

    from lucene_ray.pipelines.quality_eval import (quality_benchmark,
                                                   term_frequency_judgments)
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    rel = term_frequency_judgments(s, "table", min_tf=2)
    want_rel = {int(d) for d, toks in zip(brute_force["ids"],
                                          brute_force["tokens"])
                if toks.count("table") >= 2}
    assert set(rel.tolist()) == want_rel
    rows = quality_benchmark(s, ["table"], k=10, min_tf=2)
    r = rows[0]
    assert 0.0 <= r["p_at_k"] <= 1.0 and 0.0 <= r["recall_at_k"] <= 1.0
    # tf>=2 docs have high tf -> BM25 ranks them early; MRR must be 1.0
    assert r["reciprocal_rank"] == 1.0
    # hand-check P@10 from the brute ranking
    from lucene_ray.search import query as Q
    docs, scores = s.search_all(Q.TermQuery("table"))
    top = docs[np.lexsort((docs, -np.round(scores, 4)))[:10]]
    assert r["p_at_k"] == sum(int(d) in want_rel for d in top) / 10
