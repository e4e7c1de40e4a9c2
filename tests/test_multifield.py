"""Multi-field index: per-field postings/norms, field:term, BM25F.

Reference model: Document of named Fields with per-field stats
(document/Document.java:40, index/FieldInfos.java), CombinedFieldQuery
BM25F (sandbox/.../search/CombinedFieldQuery.java:303-420).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher

SF_DIR = "/root/testdata/sf0.001"
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def mf_index(ray_session, tmp_path_factory):
    import ray.data

    from lucene_ray.data.webpages import with_title_column

    idx = str(tmp_path_factory.mktemp("mf") / "index")
    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(with_title_column, batch_format="pyarrow")
    manifest = build_index(
        ds, idx, num_segments=4, with_positions=True,
        extra_fields={"title": "title"},
    )
    return idx, manifest


@pytest.fixture(scope="module")
def mf_brute():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    body = [x.split(" ") for x in t["text"].to_pylist()]
    title = [x[:4] for x in body]
    return {"ids": ids, "body": body, "title": title}


def test_manifest_field_stats(mf_index, mf_brute):
    _idx, m = mf_index
    assert "title" in m["fields"]
    want_ttf = sum(len(x) for x in mf_brute["title"])
    assert m["fields"]["title"]["sum_ttf"] == want_ttf
    # default field stats unchanged by the extra field
    assert m["sum_total_term_freq"] == sum(len(x) for x in mf_brute["body"])


def test_field_term_query_matches_brute(mf_index, mf_brute):
    idx, _ = mf_index
    s = Searcher(idx, mode="f64")
    term = "table"
    docs, scores = s.search_all(Q.TermQuery(term, field="title"))
    want = {
        int(i) for i, toks in zip(mf_brute["ids"], mf_brute["title"]) if term in toks
    }
    assert set(docs.tolist()) == want

    # f64 score check vs the BM25 formula over TITLE stats (exact doc_len;
    # title lengths < 24 so smallfloat quantization is the identity)
    n = float(len(mf_brute["ids"]))
    df = float(len(want))
    sttf = float(sum(len(x) for x in mf_brute["title"]))
    avgdl = sttf / n
    id2len = {int(i): len(tk) for i, tk in zip(mf_brute["ids"], mf_brute["title"])}
    id2tf = {
        int(i): tk.count(term) for i, tk in zip(mf_brute["ids"], mf_brute["title"])
    }
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
    for d, sc in zip(docs.tolist(), scores.tolist()):
        tf = id2tf[d]
        want_sc = idf * tf / (tf + K1 * (1 - B + B * id2len[d] / avgdl))
        assert abs(sc - want_sc) < 1e-9


def test_default_field_unchanged_by_extra_field(mf_index, built_index):
    """Default-field searches on the multi-field index must be identical to
    the single-field index (same docs, same scores, same totals)."""
    mf_idx, _ = mf_index
    sf_idx, _ = built_index
    a, b = Searcher(sf_idx), Searcher(mf_idx)
    for t in ["table", "key", "spark", "window"]:
        ta, tb = a.search(Q.TermQuery(t), k=10), b.search(Q.TermQuery(t), k=10)
        assert ta.doc_ids.tolist() == tb.doc_ids.tolist()
        assert ta.scores.tolist() == tb.scores.tolist()
        assert ta.total_hits == tb.total_hits
    pa_, pb = (
        a.search(Q.PhraseQuery(("key", "value")), k=10),
        b.search(Q.PhraseQuery(("key", "value")), k=10),
    )
    assert pa_.doc_ids.tolist() == pb.doc_ids.tolist()
    assert pa_.scores.tolist() == pb.scores.tolist()


def test_multiterm_scans_do_not_cross_fields(mf_index, mf_brute):
    idx, _ = mf_index
    s = Searcher(idx)
    # default-field regex that would match EVERY title key if sections
    # leaked: '.*' — hit set must equal docs with >= 1 body token
    docs, _ = s.search_all(Q.RegexpQuery(".+"))
    want_default = {
        int(i) for i, tk in zip(mf_brute["ids"], mf_brute["body"]) if tk
    }
    assert set(docs.tolist()) == want_default
    # field-scoped prefix stays inside the title section
    docs_t, _ = s.search_all(Q.PrefixQuery("tab", field="title"))
    want_t = {
        int(i)
        for i, tk in zip(mf_brute["ids"], mf_brute["title"])
        if any(w.startswith("tab") for w in tk)
    }
    assert set(docs_t.tolist()) == want_t
    # unbounded default-field range must not include title keys
    docs_r, _ = s.search_all(Q.TermRangeQuery(None, None))
    assert set(docs_r.tolist()) == want_default


def test_field_phrase_query(mf_index, mf_brute):
    idx, _ = mf_index
    s = Searcher(idx)
    want = set()
    for i, tk in zip(mf_brute["ids"], mf_brute["title"]):
        if any(a == "key" and b == "value" for a, b in zip(tk, tk[1:])):
            want.add(int(i))
    docs, _ = s.search_all(Q.PhraseQuery(("key", "value"), field="title"))
    assert set(docs.tolist()) == want
    assert len(want) > 0 or True  # phrase may be absent in titles; set equality is the test


def test_parser_field_syntax(mf_index):
    idx, _ = mf_index
    s = Searcher(idx)
    q = s.parse("title:table")
    assert isinstance(q, Q.TermQuery) and q.field == "title"
    q2 = s.parse('title:"key value"')
    assert isinstance(q2, Q.PhraseQuery) and q2.field == "title"
    # unknown field strips to default
    q3 = s.parse("bogus:table")
    assert isinstance(q3, Q.TermQuery) and q3.field is None
    # end-to-end: parsed field query == programmatic field query
    a = s.search("title:table", k=10)
    b = s.search(Q.TermQuery("table", field="title"), k=10)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()


def test_combined_field_query_bm25f(mf_index, mf_brute):
    """BM25F vs a numpy brute force of the documented formula."""
    idx, _ = mf_index
    s = Searcher(idx, mode="f64")
    wb, wt = 1.0, 2.0
    terms = ("table", "key")
    q = Q.CombinedFieldQuery(terms, ((None, wb), ("title", wt)))
    docs, scores = s.search_all(q)

    ids = mf_brute["ids"]
    n = float(len(ids))
    sttf_b = float(sum(len(x) for x in mf_brute["body"]))
    sttf_t = float(sum(len(x) for x in mf_brute["title"]))
    avgdl = (wb * sttf_b + wt * sttf_t) / n
    got = dict(zip(docs.tolist(), scores.tolist()))
    want_scores = {}
    for t in terms:
        df_b = sum(1 for tk in mf_brute["body"] if t in tk)
        df_t = sum(1 for tk in mf_brute["title"] if t in tk)
        df = max(df_b, df_t)
        if df == 0:
            continue
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, (bt, tt) in enumerate(zip(mf_brute["body"], mf_brute["title"])):
            tf = wb * bt.count(t) + wt * tt.count(t)
            if tf == 0:
                continue
            dl = wb * len(bt) + wt * len(tt)
            sc = idf * tf / (tf + K1 * (1 - B + B * dl / avgdl))
            want_scores[int(ids[i])] = want_scores.get(int(ids[i]), 0.0) + sc
    assert set(got) == set(want_scores)
    for d in got:
        assert abs(got[d] - want_scores[d]) < 1e-9


def test_multifield_survives_merges(mf_index, tmp_path):
    from lucene_ray.index.merge import force_merge, tiered_merge

    idx, _ = mf_index
    src = Searcher(idx, mode="f64")
    fq = Q.TermQuery("table", field="title")
    cq = Q.CombinedFieldQuery(("table",), ((None, 1.0), ("title", 2.0)))
    want_f = src.search(fq, k=10)
    want_c = src.search(cq, k=10)

    tm = str(tmp_path / "tiered")
    tiered_merge(idx, tm, group_size=2)
    st = Searcher(tm, mode="f64")
    got = st.search(fq, k=10)
    assert got.doc_ids.tolist() == want_f.doc_ids.tolist()
    assert np.allclose(got.scores, want_f.scores)
    gc = st.search(cq, k=10)
    assert gc.doc_ids.tolist() == want_c.doc_ids.tolist()
    assert np.allclose(gc.scores, want_c.scores)

    fm = str(tmp_path / "forced")
    force_merge(idx, fm, hot_term_df=100, salt_buckets=3)
    sf_ = Searcher(fm, mode="f64")
    got2 = sf_.search(fq, k=10)
    assert got2.doc_ids.tolist() == want_f.doc_ids.tolist()
    assert np.allclose(got2.scores, want_f.scores)


def test_merged_multifield_stats_fresh_after_deletes(mf_index, tmp_path):
    """Merges that compact tombstones must refresh per-field sum_ttf (title
    avgdl), not inherit stale sums — BM25F / field queries on the merged
    index then score with the compacted stats."""
    import json
    import shutil

    from lucene_ray.index.deletes import delete_docs
    from lucene_ray.index.merge import force_merge, tiered_merge

    src_idx, m = mf_index
    # work on a copy so the shared fixture keeps no tombstones
    idx = str(tmp_path / "mfdel")
    shutil.copytree(src_idx, idx)
    # rewrite copied manifest paths
    with open(f"{idx}/manifest.json") as f:
        mm = json.load(f)
    for s in mm["segments"]:
        s["path"] = s["path"].replace(src_idx, idx)
    with open(f"{idx}/manifest.json", "w") as f:
        json.dump(mm, f)

    s0 = Searcher(idx)
    victims = s0.search(Q.TermQuery("table", field="title"), k=3).doc_ids.tolist()
    delete_docs(idx, victims)
    victim_title_len = 4 * len(victims)  # titles are exactly 4 tokens

    tm = str(tmp_path / "mfdel_tiered")
    mt = tiered_merge(idx, tm, group_size=2)
    assert (
        mt["fields"]["title"]["sum_ttf"]
        == m["fields"]["title"]["sum_ttf"] - victim_title_len
    )
    st = Searcher(tm)
    docs, _ = st.search_all(Q.TermQuery("table", field="title"))
    assert not set(victims) & set(docs.tolist())

    fm = str(tmp_path / "mfdel_forced")
    mf_ = force_merge(idx, fm)
    assert (
        mf_["fields"]["title"]["sum_ttf"]
        == m["fields"]["title"]["sum_ttf"] - victim_title_len
    )


def test_field_stats_survive_shard_merge_and_add(mf_index, tmp_path):
    """Shard metas carry FULL per-field sums; add_documents on a sharded
    multi-field index must keep manifest field sum_ttf correct (counting
    each shared doc space once), not collapse to the new segments' sums."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.index.build import add_documents, load_manifest
    from lucene_ray.index.merge import force_merge

    idx, m = mf_index
    sharded = str(tmp_path / "sharded")
    mm = force_merge(idx, sharded, terms_per_shard=9)
    assert len(mm["segments"]) > 2
    assert mm["fields"]["title"]["sum_ttf"] == m["fields"]["title"]["sum_ttf"]

    new = pa.table({
        "doc_id": pa.array([10_000_000], type=pa.int64()),
        "text": pa.array(["brand new body text tokens here"]),
        "title": pa.array(["brand new body text"]),
    })
    m2 = add_documents(ray.data.from_arrow(new), sharded)
    assert m2["fields"]["title"]["sum_ttf"] == m["fields"]["title"]["sum_ttf"] + 4
    assert m2["doc_count"] == m["doc_count"] + 1
    # reload from disk agrees
    m3 = load_manifest(sharded)
    assert m3["fields"]["title"]["sum_ttf"] == m2["fields"]["title"]["sum_ttf"]


def test_field_scoped_interval_query(mf_index, mf_brute):
    """IntervalQuery(field='title') resolves its leaves to the title
    section (review finding: field used to be silently ignored)."""
    from lucene_ray.search import intervals as IV

    s = Searcher(mf_index[0])
    src = IV.Ordered((IV.Term("spark"), IV.Term("sql")), maxgaps=1)
    docs_t, _ = s.search_all(Q.IntervalQuery(src, field="title"))
    docs_d, _ = s.search_all(Q.IntervalQuery(src))

    def brute(toklists):
        out = set()
        for d, toks in zip(mf_brute["ids"], toklists):
            ps = [i for i, w in enumerate(toks) if w == "spark"]
            qs = [i for i, w in enumerate(toks) if w == "sql"]
            if any(0 < b - a <= 2 for a in ps for b in qs):
                out.add(d)
        return out

    assert set(docs_t.tolist()) == brute(mf_brute["title"])
    assert set(docs_d.tolist()) == brute(mf_brute["body"])


def test_field_exists_query(ray_session, tmp_path_factory):
    """FieldExistsQuery (search/FieldExistsQuery.java:63): matches exactly
    the docs whose field analyzed to >= 1 token, constant score; unknown
    field matches nothing; parser maps `f:*` to it and bare `*`/`''` to
    match-all."""
    import ray.data

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    first = pc.binary_join(pc.list_slice(pc.split_pattern(docs["text"], " "), 0, 1), " ")
    has = pa.array(docs["doc_id"].to_numpy() % 4 == 0)
    docs = docs.append_column(
        "kw", pc.if_else(has, first, pa.scalar("", type=pa.string())))
    idx = str(tmp_path_factory.mktemp("fe") / "index")
    build_index(ray.data.from_arrow(docs), idx, num_segments=2,
                extra_fields={"kw": "kw"})
    s = Searcher(idx)
    d, sc = s.search_all(Q.FieldExistsQuery("kw", boost=2.0))
    want = {i for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
            if i % 4 == 0 and t}
    assert set(d.tolist()) == want
    assert np.all(sc == 2.0)
    # unknown field -> no matches
    d2, _ = s.search_all(Q.FieldExistsQuery("nope"))
    assert d2.shape[0] == 0
    # parser mapping
    from lucene_ray.search.parser import parse_query

    assert parse_query("kw:*", fields={"kw"}) == Q.FieldExistsQuery("kw")
    assert parse_query("*") == Q.MatchAllDocsQuery()


def test_per_field_postings_options(ray_session, tmp_path_factory, sf_dir):
    """Per-field postings format registry (PerFieldPostingsFormat.java:71
    + IndexOptions.java:28): a docs_and_freqs field writes NO rows into
    the positions artifact; a docs field flattens freqs to 1 and shrinks
    postings bytes; upgrades past the index-wide setting are rejected."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from lucene_ray.data.webpages import with_title_column
    from lucene_ray.index.build import build_index
    from lucene_ray.index.check import check_index
    from lucene_ray.index.fields import field_prefix
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(docs, columns=["doc_id", "text"]).map_batches(
        with_title_column, batch_format="pyarrow")
    idx = str(tmp_path_factory.mktemp("pfo") / "idx")
    build_index(ds, idx, num_segments=2, with_positions=True,
                extra_fields={"title": "title"},
                field_options={"title": "docs"}, stored_source=docs)
    check_index(idx)

    # positions artifact holds NO title-field terms
    pref = field_prefix("title")
    for p in glob.glob(os.path.join(idx, "segments", "*", "positions.parquet")):
        terms = pq.read_table(p, columns=["term"])["term"].to_pylist()
        assert not any(t.startswith(pref) for t in terms)

    s = Searcher(idx)
    # body phrases still work; a title phrase matches nothing
    d_body, _ = s.search_all(Q.PhraseQuery(("key", "value")))
    assert d_body.shape[0] > 0
    d_title, _ = s.search_all(Q.PhraseQuery(("key", "value"), field="title"))
    assert d_title.shape[0] == 0
    # docs-only field scores tf=1: every matching doc with the same title
    # length gets the same score
    dt, st = s.search_all(Q.TermQuery("table", field="title"))
    assert dt.shape[0] > 0
    assert np.unique(np.round(st, 6)).shape[0] == 1  # all titles are 4 tokens

    # an all-opted-out index writes no positions file at all
    idx2 = str(tmp_path_factory.mktemp("pfo") / "nopos")
    build_index(docs, idx2, num_segments=2, with_positions=True,
                field_options={None: "docs_and_freqs"})
    assert not glob.glob(os.path.join(idx2, "segments", "*",
                                      "positions.parquet"))
    check_index(idx2)

    # postings bytes drop measurably for a docs-only default field
    idx3 = str(tmp_path_factory.mktemp("pfo") / "docsonly")
    m3 = build_index(docs, idx3, num_segments=2,
                     field_options={None: "docs"})
    idx4 = str(tmp_path_factory.mktemp("pfo") / "full")
    m4 = build_index(docs, idx4, num_segments=2)
    b3 = sum(sg["postings_bytes"] for sg in m3["segments"])
    b4 = sum(sg["postings_bytes"] for sg in m4["segments"])
    assert b3 < b4

    # upgrades past the index-wide setting are rejected
    with pytest.raises(ValueError):
        build_index(docs, str(tmp_path_factory.mktemp("pfo") / "bad"),
                    num_segments=2, with_positions=False,
                    field_options={"title": "positions"})


def test_multi_field_parser_expands_unfielded_leaves(mf_searcher=None):
    """MultiFieldQueryParser.java:42,118 — unfielded leaves expand to
    per-field SHOULD copies with boosts; explicit field: atoms stay."""
    from lucene_ray.search import query as Q
    from lucene_ray.search.parser import parse_multi_field

    q = parse_multi_field("table window", (None, "title"))
    assert isinstance(q, Q.BooleanQuery) and len(q.should) == 2
    for clause in q.should:
        fields = [c.field for c in clause.should]
        assert fields == [None, "title"]
    q2 = parse_multi_field("+table title:key", (None, "title"),
                           boosts={"title": 2.0})
    exp = q2.must[0]
    assert exp.should[1].boost == 2.0  # title copy boosted
    assert q2.should[0] == Q.TermQuery("key", field="title")  # stays as-is
    # phrase leaves expand too
    q3 = parse_multi_field('"key value"', (None, "title"))
    assert {c.field for c in q3.should} == {None, "title"}
