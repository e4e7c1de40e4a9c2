"""Index build, resume, global stats, and merge correctness."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index, load_manifest, read_global_term_stats
from lucene_ray.index.merge import force_merge, tiered_merge
from lucene_ray.search.query import BooleanQuery, TermQuery
from lucene_ray.search.searcher import Searcher


def test_manifest_and_stats(built_index, brute_force):
    idx, m = built_index
    assert m["doc_count"] == brute_force["doc_count"]
    assert m["sum_total_term_freq"] == brute_force["sum_ttf"]
    # segments disjoint & ordered
    segs = m["segments"]
    for a, b in zip(segs, segs[1:]):
        assert a["max_doc_id"] < b["doc_base"]
    # lineage fields present (north rule: per-partition lineage + metrics)
    for s in segs:
        assert s["fingerprint"] and s["postings_bytes"] > 0
        assert s["terms_per_sec"] >= 0


def test_global_term_stats_match_brute(built_index, brute_force):
    idx, _ = built_index
    tbl = read_global_term_stats(idx, ["table", "key"])
    got = dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
    for t in ("table", "key"):
        want = sum(1 for toks in brute_force["tokens"] if t in toks)
        assert got[t] == want


def test_resume_skips_completed_segments(sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    m1 = build_index(f"{sf_dir}/documents.parquet", idx, num_segments=3)
    assert all(not s["skipped"] for s in m1["segments"])
    m2 = build_index(f"{sf_dir}/documents.parquet", idx, num_segments=3)
    assert all(s["skipped"] for s in m2["segments"])
    assert [s["segment_id"] for s in m1["segments"]] == [
        s["segment_id"] for s in m2["segments"]
    ]


def test_norms_match_smallfloat(built_index, brute_force):
    idx, m = built_index
    from lucene_ray.util.smallfloat import int_to_byte4

    for s in m["segments"][:2]:
        d = pq.read_table(os.path.join(s["path"], "docs.parquet"))
        ids = d["doc_id"].to_numpy()
        lens = d["doc_len"].to_numpy()
        norms = d["norm"].to_numpy()
        id_list = list(brute_force["ids"])
        for i in range(0, len(ids), 37):
            row = id_list.index(ids[i])
            assert lens[i] == len(brute_force["tokens"][row])
            assert norms[i] == int_to_byte4(int(lens[i]))


def test_force_merge_rank_identical(sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    midx = str(tmp_path / "merged")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=6)
    mm = force_merge(idx, midx, hot_term_df=100, salt_buckets=3)
    assert mm["segments"][0]["merge_fan_in"] == 6
    a, b = Searcher(idx), Searcher(midx)
    assert b.doc_count == a.doc_count and b.sum_ttf == a.sum_ttf
    for t in ["table", "key", "spark"]:
        ta, tb = a.search(TermQuery(t), k=10), b.search(TermQuery(t), k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.scores.tolist() == tb.scores.tolist()
        assert ta.total_hits == tb.total_hits
    q = BooleanQuery(should=(TermQuery("spark"), TermQuery("window")))
    assert a.search(q, k=10).doc_ids.tolist() == b.search(q, k=10).doc_ids.tolist()


def test_interleaved_partitions_merge_and_search(sf_dir, tmp_path):
    """Segments built from an arbitrary (non-contiguous) partitioning of the
    doc space must merge and search identically to a contiguous build —
    repartition/streaming execution gives no ordering guarantee."""
    import pyarrow as pa
    import ray.data

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    parts = [docs.take(pa.array(np.where(ids % 3 == r)[0])) for r in range(3)]

    idx = str(tmp_path / "interleaved")
    midx = str(tmp_path / "interleaved_merged")
    build_index(ray.data.from_arrow(parts), idx)
    m = load_manifest(idx)
    assert len(m["segments"]) == 3
    bases = sorted(s["doc_base"] for s in m["segments"])
    maxes = sorted(s["max_doc_id"] for s in m["segments"])
    assert maxes[0] > bases[1]  # genuinely overlapping ranges

    cidx = str(tmp_path / "contiguous")
    build_index(f"{sf_dir}/documents.parquet", cidx, num_segments=3)
    force_merge(idx, midx, hot_term_df=100, salt_buckets=3)

    a, b, c = Searcher(cidx), Searcher(idx), Searcher(midx)
    for t in ["table", "key", "spark"]:
        ta = a.search(TermQuery(t), k=10)
        for s in (b, c):
            ts = s.search(TermQuery(t), k=10)
            assert ta.doc_ids.tolist() == ts.doc_ids.tolist()
            assert ta.scores.tolist() == ts.scores.tolist()
            assert ta.total_hits == ts.total_hits


def test_merged_df_ttf_consistent(sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    midx = str(tmp_path / "merged")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=5)
    force_merge(idx, midx, hot_term_df=10, salt_buckets=4)  # everything hot
    from lucene_ray.index.build import stats_path

    gt = pq.read_table(stats_path(idx)).sort_by("term")
    mt = pq.read_table(
        os.path.join(load_manifest(midx)["segments"][0]["path"], "terms.parquet")
    ).sort_by("term")
    assert gt["term"].to_pylist() == mt["term"].to_pylist()
    assert gt["df"].to_pylist() == mt["df"].to_pylist()
    assert gt["ttf"].to_pylist() == mt["ttf"].to_pylist()


def test_sharded_merge_rank_identical(sf_dir, tmp_path):
    """Term-range-sharded merged segments (terms_per_shard small enough to
    force several shards) must search identically to the source index, and
    MatchAllDocsQuery must count every doc exactly once (owns_docs)."""
    from lucene_ray.search.query import MatchAllDocsQuery

    idx = str(tmp_path / "idx")
    midx = str(tmp_path / "sharded")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=5)
    mm = force_merge(idx, midx, hot_term_df=100, salt_buckets=3, terms_per_shard=10)
    assert len(mm["segments"]) > 2  # actually sharded
    assert sum(1 for s in mm["segments"] if s.get("owns_docs")) == 1
    a, b = Searcher(idx), Searcher(midx)
    for t in ["table", "key", "spark", "window"]:
        ta, tb = a.search(TermQuery(t), k=10), b.search(TermQuery(t), k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.scores.tolist() == tb.scores.tolist()
        assert ta.total_hits == tb.total_hits
    q = BooleanQuery(should=(TermQuery("spark"), TermQuery("window")))
    assert a.search(q, k=10).doc_ids.tolist() == b.search(q, k=10).doc_ids.tolist()
    assert b.count(MatchAllDocsQuery()) == a.count(MatchAllDocsQuery())


def test_deletes_and_incremental_add(sf_dir, tmp_path):
    """Tombstone deletes mask hits everywhere (top-k, search_all, count);
    add_documents appends new segments and updates global stats — together
    they give updateDocument semantics (IndexWriter.java:1553-1617)."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.index.build import add_documents
    from lucene_ray.index.deletes import delete_docs, load_tombstones

    idx = str(tmp_path / "upd")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=3)
    s0 = Searcher(idx)
    base_hits = s0.search(TermQuery("table"), k=5)
    victim = int(base_hits.doc_ids[0])

    delete_docs(idx, [victim])
    s1 = Searcher(idx)
    td = s1.search(TermQuery("table"), k=5)
    assert victim not in td.doc_ids.tolist()
    assert td.total_hits == base_hits.total_hits - 1
    docs, _ = s1.search_all(TermQuery("table"))
    assert victim not in docs.tolist()
    assert s1.count(TermQuery("table")) == base_hits.total_hits - 1
    assert load_tombstones(idx).tolist() == [victim]

    # re-add the doc's content under a fresh id (the "update" half)
    new_id = 1_000_000 + victim
    t = pa.table({"doc_id": pa.array([new_id], type=pa.int64()),
                  "text": pa.array(["table table table fresh update"], type=pa.string())})
    m2 = add_documents(ray.data.from_arrow(t), idx)
    assert m2["doc_count"] == s0.doc_count + 1
    s2 = Searcher(idx)
    docs2, _ = s2.search_all(TermQuery("table"))
    assert new_id in docs2.tolist() and victim not in docs2.tolist()
    # global df refreshed over the union
    tbl = read_global_term_stats(idx, ["fresh"])
    assert tbl.num_rows == 1 and tbl["df"][0].as_py() == 1


def test_add_indexes_wholesale_import(sf_dir, tmp_path):
    """addIndexes(Directory...): two shard builds over disjoint halves
    import into one index with no re-encode; search equals a direct build
    over the whole corpus."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.index.build import add_indexes

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    half = int(np.median(ids))
    lo = docs.take(pa.array(np.where(ids <= half)[0]))
    hi = docs.take(pa.array(np.where(ids > half)[0]))

    a_dir, b_dir, full_dir = (str(tmp_path / n) for n in ("shard_a", "shard_b", "full"))
    build_index(ray.data.from_arrow(lo), a_dir, num_segments=2)
    build_index(ray.data.from_arrow(hi), b_dir, num_segments=2)
    build_index(f"{sf_dir}/documents.parquet", full_dir, num_segments=4)

    m = add_indexes(a_dir, [b_dir])
    assert m["doc_count"] == docs.num_rows
    sa, sf_ = Searcher(a_dir), Searcher(full_dir)
    for t in ["table", "key", "spark"]:
        ta, tb = sf_.search(TermQuery(t), k=10), sa.search(TermQuery(t), k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.scores.tolist() == tb.scores.tolist()
        assert ta.total_hits == tb.total_hits


def test_suggest_prefix_by_df(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    t = s.suggest("s", k=5)
    assert t.num_rows >= 1
    terms = t["term"].to_pylist()
    dfs = t["df"].to_pylist()
    assert all(x.startswith("s") for x in terms)
    assert dfs == sorted(dfs, reverse=True) or len(set(dfs)) < len(dfs)


def test_force_merge_compacts_deletes(sf_dir, tmp_path):
    """Merging an index with tombstones physically drops the deleted docs
    (DocIDMerger 'deleted docs squeezed out'): stats shrink, the merged
    index carries no tombstones, results match the masked source."""
    from lucene_ray.index.deletes import delete_docs, load_tombstones
    from lucene_ray.search.query import MatchAllDocsQuery

    idx = str(tmp_path / "delsrc")
    midx = str(tmp_path / "delmerged")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=4)
    s0 = Searcher(idx)
    victims = s0.search(TermQuery("table"), k=3).doc_ids.tolist()
    delete_docs(idx, victims)

    mm = force_merge(idx, midx, hot_term_df=100, salt_buckets=3)
    assert load_tombstones(midx).shape[0] == 0  # deletes are physical now
    assert mm["doc_count"] == s0.doc_count - len(victims)

    s1, s2 = Searcher(idx), Searcher(midx)  # s1 masks, s2 is compacted
    for t in ["table", "key", "spark"]:
        ta, tb = s1.search(TermQuery(t), k=10), s2.search(TermQuery(t), k=10)
        # same hits; scores legitimately differ because the compacted index
        # has FRESH stats (df/doc_count shrank) while the source's stats are
        # stale-until-merge (BufferedUpdatesStream semantics)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.total_hits == tb.total_hits
    assert s2.count(MatchAllDocsQuery()) == s0.doc_count - len(victims)
    # df stats reflect the drop
    tbl = read_global_term_stats(midx, ["table"])
    src_tbl = read_global_term_stats(idx, ["table"])
    assert tbl["df"][0].as_py() == src_tbl["df"][0].as_py() - len(victims)


def test_tiered_merge_rank_identical(sf_dir, tmp_path):
    """Doc-range tiered merge (group_size adjacent segments -> one) must be
    rank-identical to the source, with real per-segment docs tables."""
    idx = str(tmp_path / "tm_src")
    midx = str(tmp_path / "tm_out")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=6)
    mm = tiered_merge(idx, midx, group_size=3, hot_term_df=100, salt_buckets=3)
    assert len(mm["segments"]) == 2
    assert all(s["merge_fan_in"] == 3 for s in mm["segments"])
    a, b = Searcher(idx), Searcher(midx)
    assert b.doc_count == a.doc_count and b.sum_ttf == a.sum_ttf
    for t in ["table", "key", "spark", "window"]:
        ta, tb = a.search(TermQuery(t), k=10), b.search(TermQuery(t), k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.scores.tolist() == tb.scores.tolist()
        assert ta.total_hits == tb.total_hits
    q = BooleanQuery(should=(TermQuery("spark"), TermQuery("window")))
    assert a.search(q, k=10).doc_ids.tolist() == b.search(q, k=10).doc_ids.tolist()


def test_sharded_merge_cross_shard_compound_queries(sf_dir, tmp_path):
    """Query terms living in DIFFERENT term shards must still evaluate
    correctly for compound queries — the shard group is one logical
    segment (ShardGroupReader), not N independent ones. terms_per_shard=2
    also forces hot terms' source rows to straddle shard boundaries,
    exercising the lazy sub-run re-fuse."""
    from lucene_ray.search.query import PhraseQuery

    idx = str(tmp_path / "idx")
    midx = str(tmp_path / "xshard")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=5,
                with_positions=True)
    mm = force_merge(idx, midx, terms_per_shard=2)
    assert len(mm["segments"]) >= 8  # heavily sharded
    a, b = Searcher(idx), Searcher(midx)
    queries = [
        BooleanQuery(should=(TermQuery("spark"), TermQuery("window"))),
        BooleanQuery(must=(TermQuery("key"), TermQuery("table"))),
        BooleanQuery(should=(TermQuery("spark"), TermQuery("window"),
                             TermQuery("customer")), minimum_should_match=2),
        BooleanQuery(must=(TermQuery("table"),), must_not=(TermQuery("key"),)),
        PhraseQuery(("key", "value")),
    ]
    for q in queries:
        da, sa = a.search_all(q)
        db, sb = b.search_all(q)
        oa, ob = np.argsort(da), np.argsort(db)
        assert da[oa].tolist() == db[ob].tolist()
        assert np.allclose(sa[oa], sb[ob])
        ta, tb = a.search(q, k=10), b.search(q, k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        # totals: EQ must be exact; GTE is a valid lower bound (pruning
        # depends on segment layout, so relations may differ)
        exact = da.shape[0]
        for td in (ta, tb):
            if td.relation == "EQ":
                assert td.total_hits == exact
            else:
                assert td.total_hits <= exact


def test_index_sorting_early_exit_topk(sf_dir, tmp_path):
    """setIndexSort as a distributed resequencing pre-pass: doc order ==
    sort-key order, sorted_topk reads the first k live docs without
    scoring; results equal the global ORDER BY."""
    import pyarrow.parquet as pq2

    from lucene_ray.index.sorted import build_sorted_index, sorted_topk
    from lucene_ray.search.searcher import Searcher

    idx = str(tmp_path / "sortedidx")
    m = build_sorted_index(
        f"{sf_dir}/documents.parquet", idx, by="n_chars", descending=True,
        num_segments=4,
    )
    assert m["index_sort"]["by"] == "n_chars"
    s = Searcher(idx)
    got = sorted_topk(s, 10, columns=["doc_id", "orig_doc_id", "n_chars"])
    want = (
        pq2.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "n_chars"])
        .sort_by([("n_chars", "descending"), ("doc_id", "ascending")])
        .slice(0, 10)
    )
    assert got["orig_doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["n_chars"].to_pylist() == want["n_chars"].to_pylist()
    # new ids are the global ranks 0..9
    assert got["doc_id"].to_pylist() == list(range(10))
    # the index itself still searches (text column intact)
    td = s.search("table", k=5)
    assert td.total_hits > 0
    # early exit survives deletes: tombstone rank 0, top-1 becomes rank 1
    from lucene_ray.index.deletes import delete_docs

    delete_docs(idx, [0])
    s2 = Searcher(idx)
    got2 = sorted_topk(s2, 1, columns=["doc_id"])
    assert got2["doc_id"].to_pylist() == [1]


def test_ram_directory_index(sf_dir):
    """ByteBuffersDirectory role: a tmpfs-resident index behaves exactly
    like an FS index (same layout, same results)."""
    import shutil

    from lucene_ray.index.build import ram_index_dir

    idx = ram_index_dir()
    try:
        if os.path.isdir("/dev/shm"):  # documented fallback elsewhere
            assert idx.startswith("/dev/shm/")
        build_index(f"{sf_dir}/documents.parquet", idx, num_segments=2)
        s = Searcher(idx)
        td = s.search(TermQuery("table"), k=5)
        assert td.total_hits == 391  # known corpus value
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_degenerate_corpora(tmp_path, ray_session):
    """Empty corpus and all-stopword segments build and search cleanly
    (empty postings.bin, empty global stats)."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import EnglishAnalyzer
    from lucene_ray.search.query import MatchAllDocsQuery

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    idx = str(tmp_path / "empty")
    m = build_index(ray.data.from_arrow(empty), idx, num_segments=1)
    s = Searcher(idx)
    assert m["doc_count"] == 0
    assert s.search(TermQuery("x"), k=5).total_hits == 0
    assert s.count("anything") == 0

    stoponly = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                         "text": pa.array(["the and of"])})
    idx2 = str(tmp_path / "stoponly")
    m2 = build_index(ray.data.from_arrow(stoponly), idx2,
                     analyzer=EnglishAnalyzer, num_segments=1)
    s2 = Searcher(idx2)
    assert m2["doc_count"] == 1
    assert s2.search(TermQuery("the"), k=5).total_hits == 0
    assert s2.count(MatchAllDocsQuery()) == 1


def test_remerge_force_merged_index(sf_dir, tmp_path):
    """force_merge of a force_merge output (shared docs table, no local
    docs.parquet) must work; tiered_merge of term shards refuses with a
    clear error."""
    import pytest as _pytest

    idx = str(tmp_path / "src")
    m1 = str(tmp_path / "m1")
    m2 = str(tmp_path / "m2")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=4,
                with_positions=True)
    force_merge(idx, m1, terms_per_shard=10)
    force_merge(m1, m2)  # re-merge the sharded index into one shard
    a, b = Searcher(idx), Searcher(m2)
    for t in ["table", "key", "spark"]:
        ta, tb = a.search(TermQuery(t), k=10), b.search(TermQuery(t), k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.scores.tolist() == tb.scores.tolist()
    # phrase still works through the chained positions_path
    pa_, pb = (a.search('"key value"', k=10), b.search('"key value"', k=10))
    assert pa_.doc_ids.tolist() == pb.doc_ids.tolist()
    with _pytest.raises(ValueError, match="term-range shards"):
        tiered_merge(m1, str(tmp_path / "bad"))


def test_sorted_range_binary_search(sf_dir, tmp_path):
    """IndexSortSortedNumericDocValuesRangeQuery analog: ranges on the
    index-sort key via footer-stat binary search — counts equal brute
    force for bounded/unbounded/exclusive variants, ascending and
    descending layouts, and after deletes."""
    import numpy as np
    import pyarrow.parquet as pq2

    from lucene_ray.index.deletes import delete_docs
    from lucene_ray.index.sorted import (build_sorted_index, sorted_range,
                                         sorted_range_count)
    from lucene_ray.search.searcher import Searcher

    v = pq2.read_table(f"{sf_dir}/documents.parquet",
                       columns=["n_chars"])["n_chars"].to_numpy()

    for desc in (False, True):
        idx = str(tmp_path / f"sr_{desc}")
        build_sorted_index(f"{sf_dir}/documents.parquet", idx, by="n_chars",
                           descending=desc, num_segments=3)
        s = Searcher(idx)
        cases = [
            (200, 400, True, True),
            (200, 400, False, False),
            (None, 300, True, True),
            (250, None, True, True),
            (None, None, True, True),
            (10_000, 20_000, True, True),  # empty range
            (311, 311, True, True),        # point range (tie runs)
        ]
        for lo, hi, il, iu in cases:
            m = np.ones(v.shape[0], dtype=bool)
            if lo is not None:
                m &= (v >= lo) if il else (v > lo)
            if hi is not None:
                m &= (v <= hi) if iu else (v < hi)
            got = sorted_range_count(s, lo, hi, il, iu)
            assert got == int(m.sum()), (desc, lo, hi, il, iu)
        a, b = sorted_range(s, 200, 400)
        assert b - a == int(((v >= 200) & (v <= 400)).sum())

    # deletes subtract only tombstones inside the interval
    dels = {a, b - 1, min(b + 5, v.shape[0] - 1)}
    delete_docs(idx, sorted(dels))
    s2 = Searcher(idx)
    got = sorted_range_count(s2, 200, 400)
    assert got == (b - a) - len(dels & set(range(a, b)))


def test_numeric_doc_values_updates(ray_session, tmp_path_factory):
    """IndexWriter.updateNumericDocValue (IndexWriter.java:1892 role,
    index/docvalues.py): committed update generations overlay feature
    reads without re-indexing; later generations win; untouched docs keep
    the base value; readers discover updates from the segment path."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.index.build import build_index
    from lucene_ray.index.docvalues import update_doc_values
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b", "a c", "b c", "a d"]),
        "w": pa.array([10.0, 20.0, 30.0, 40.0]),
    })
    idx = str(tmp_path_factory.mktemp("dvu") / "index")
    build_index(ray.data.from_arrow(t), idx, num_segments=2,
                features={"w": "w"})
    s = Searcher(idx)
    base = s.doc_values_stats(Q.MatchAllDocsQuery(), "w")
    assert base["vsum"] == 100.0
    update_doc_values(idx, "w", [1, 3], [200.0, 400.0])
    update_doc_values(idx, "w", [3], [999.0])  # gen 2 wins over gen 1
    s2 = Searcher(idx)  # fresh readers see the committed overlay
    st = s2.doc_values_stats(Q.MatchAllDocsQuery(), "w")
    assert st["vsum"] == 10.0 + 200.0 + 30.0 + 999.0
    assert st["vmax"] == 999.0
    # FeatureQuery scores read the updated value too
    d, sc = s2.search_all(Q.FeatureQuery("w", function="linear"))
    got = dict(zip(d.tolist(), sc.tolist()))
    assert got[3] == 999.0 and got[0] == 10.0
