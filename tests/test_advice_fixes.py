"""Regression tests for round-1 judge/advisor findings (ADVICE.md r1).

Covers: total_hits relation under MaxScore non-essential pruning, positional
data surviving merges, search_after tombstone accounting, and query-level
boost on pure-SHOULD general-path boolean queries.
"""

import numpy as np

from lucene_ray.index.build import build_index
from lucene_ray.index.merge import force_merge, tiered_merge
from lucene_ray.search import query as Q
from lucene_ray.search.searcher import Searcher


def test_total_hits_relation_honest_under_maxscore(built_index):
    """A pruned OR (k=1 -> non-essential split engages) must never report
    relation EQ with an undercounted total (ADVICE r1 high: _union_maxscore
    dropped docs matching only non-essential terms with exact=True)."""
    idx, _ = built_index
    s = Searcher(idx)
    q = Q.BooleanQuery(should=(Q.TermQuery("table"), Q.TermQuery("key")))
    exact = s.count(q)
    for k in (1, 2, 5):
        td = s.search(q, k=k)
        if td.relation == "EQ":
            assert td.total_hits == exact
        else:
            assert td.total_hits <= exact
    # unpruned run is always exact
    td = s.search(q, k=5, prune=False)
    assert td.relation == "EQ" and td.total_hits == exact


def test_merged_indexes_keep_positions(built_index, tmp_path):
    """Phrase queries must work identically on tiered- and force-merged
    indexes (ADVICE r1 medium: merges dropped positions.parquet while the
    manifest still claimed with_positions=True)."""
    idx, _ = built_index
    src = Searcher(idx)
    phrase = Q.PhraseQuery(("key", "value"))
    want = src.search(phrase, k=10)
    assert want.doc_ids.shape[0] > 0  # the phrase exists in the corpus

    tm = str(tmp_path / "tiered")
    tiered_merge(idx, tm, group_size=2)
    got_t = Searcher(tm).search(phrase, k=10)
    assert got_t.doc_ids.tolist() == want.doc_ids.tolist()
    assert np.allclose(got_t.scores, want.scores)

    fm = str(tmp_path / "forced")
    force_merge(idx, fm, hot_term_df=100, salt_buckets=3)
    got_f = Searcher(fm).search(phrase, k=10)
    assert got_f.doc_ids.tolist() == want.doc_ids.tolist()
    assert np.allclose(got_f.scores, want.scores)


def test_search_after_total_excludes_tombstones(sf_dir, tmp_path):
    """search_after must count hits AFTER the tombstone mask, consistent
    with search() (ADVICE r1 low)."""
    from lucene_ray.index.deletes import delete_docs

    idx = str(tmp_path / "sa_idx")
    build_index(f"{sf_dir}/documents.parquet", idx, num_segments=3)
    s0 = Searcher(idx)
    q = Q.TermQuery("table")
    page1 = s0.search(q, k=3, prune=False)
    victim = int(page1.doc_ids[0])
    delete_docs(idx, [victim])

    s1 = Searcher(idx)
    after_score = float(page1.scores[-1])
    after_doc = int(page1.doc_ids[-1])
    td = s1.search_after(q, k=5, after_score=after_score, after_doc=after_doc)
    assert td.total_hits == s1.count(q)
    assert victim not in td.doc_ids.tolist()


def test_pure_should_boost_applies_in_general_path(built_index):
    """q.boost on a pure-SHOULD BooleanQuery of non-TermQuery clauses must
    scale scores (ADVICE r1 low: boost was applied only with must/filter)."""
    idx, _ = built_index
    s = Searcher(idx)
    phrase = Q.PhraseQuery(("key", "value"))
    base = s.search(Q.BooleanQuery(should=(phrase,)), k=10, prune=False)
    boosted = s.search(Q.BooleanQuery(should=(phrase,), boost=2.0), k=10, prune=False)
    assert base.doc_ids.tolist() == boosted.doc_ids.tolist()
    assert np.allclose(boosted.scores, base.scores * 2.0)


def test_conjunction_leapfrog_block_skip(built_index, monkeypatch):
    """AND path must decode only the blocks the rarest term can intersect
    (BlockMaxConjunctionScorer semantics) — not every block of every
    clause — while staying hit-identical to the unpruned evaluation."""
    import lucene_ray.codec.postings as cp
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)

    # hit-completeness first (prune=False path identical)
    q = Q.BooleanQuery(must=(Q.TermQuery("key"), Q.TermQuery("table")))
    da, sa = s.search_all(q)
    td = s.search(q, k=10)
    order = np.lexsort((da, -sa))[:10]
    assert td.doc_ids.tolist() == da[order].tolist()
    assert np.allclose(td.scores, sa[order])

    # count decoded blocks on AND(rare synthetic term pair)
    counts = {"n": 0}
    orig = cp.PostingsReader.decode_blocks

    def counting(self, block_idx):
        counts["n"] += int(np.asarray(block_idx).shape[0])
        return orig(self, block_idx)

    monkeypatch.setattr(cp.PostingsReader, "decode_blocks", counting)
    stats = s.term_stats({"key", "table"})
    rare = min(("key", "table"), key=lambda t: stats[t][0])
    # rare term's total block count across segments
    rare_blocks = 0
    for r in s.readers:
        i = r.term_index(rare)
        if i >= 0:
            rare_blocks += r.postings_reader(i).n_blocks
    counts["n"] = 0
    s.search_all(q)
    # driver decodes all its blocks; the other term decodes at most the
    # blocks containing driver candidates (<= driver blocks + segments)
    assert counts["n"] <= 2 * rare_blocks + 2 * len(s.readers)


def test_midword_wildcard_in_quoted_phrase(built_index):
    """ADVICE r3: a mid-word wildcard inside a quoted phrase ("table
    s*k") used to normalize into a literal '*'-containing term that
    silently matched nothing; it now expands like the reference
    ComplexPhraseQueryParser."""
    from lucene_ray.search.parser import parse_query
    from lucene_ray.search.searcher import Searcher

    idx, _ = built_index
    s = Searcher(idx)

    # ground truth: expand by brute force over the dictionary
    q_exact = parse_query('"key value"')
    want, _sc = s.search_all(q_exact)
    assert want.shape[0] > 0

    q_pat = parse_query('"key v*e"')
    assert isinstance(q_pat, Q.PhraseWildcardQuery)
    got, _sc = s.search_all(q_pat)
    # every "key value" doc matches "key v*e" (v*e also admits other
    # terms, so got is a superset)
    assert set(want.tolist()) <= set(got.tolist())

    q_q = parse_query('"key val?e"')
    got_q, _sc = s.search_all(q_q)
    assert set(want.tolist()) <= set(got_q.tolist())

    # normalization applies to the literal fragments only
    q_case = parse_query('"Key V*E"')
    got_c, _sc = s.search_all(q_case)
    assert got_c.tolist() == got.tolist()


def test_block_join_none_scores_zero():
    """ADVICE r3: ScoreMode.None produces score 0 per parent in the
    reference ToParentBlockJoinQuery, not a constant 1."""
    from lucene_ray.search.join import to_parent_block_join

    up, sc = to_parent_block_join(
        np.array([0, 1, 200]), np.array([1.0, 3.0, 2.0]), 100,
        score_mode="none")
    assert up.tolist() == [0, 2]
    assert sc.tolist() == [0.0, 0.0]


def test_dv_update_generation_order_and_no_overwrite(tmp_path):
    """ADVICE r3: generations ordered by parsed integer (lexicographic
    %03d order inverts at gen >= 1000) and allocated with O_EXCL so
    concurrent updaters never overwrite each other."""
    import os

    from lucene_ray.index.docvalues import (DV_DIR, load_dv_updates,
                                            update_doc_values)

    idx = str(tmp_path / "idx")
    os.makedirs(os.path.join(idx, DV_DIR))
    # simulate a long-lived index: pre-seed generations 998..1000 so the
    # next update lands at 1001 and must win over gen 999's value
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(idx, DV_DIR)
    for g, v in [(998, 1.0), (999, 2.0), (1000, 3.0)]:
        pq.write_table(pa.table({"doc_id": pa.array([7], pa.int64()),
                                 "value": pa.array([v], pa.float64())}),
                       os.path.join(d, f"feat_f_gen{g:03d}.parquet"))
    p = update_doc_values(idx, "f", [7], [4.0])
    assert p.endswith("feat_f_gen1001.parquet")
    ids, vals = load_dv_updates(d)["f"]
    assert ids.tolist() == [7] and vals.tolist() == [4.0]

    # collision: pre-create the next gen file; allocation must step past
    open(os.path.join(d, "feat_f_gen1002.parquet"), "wb").close()
    p2 = update_doc_values(idx, "f", [7], [5.0])
    assert p2.endswith("feat_f_gen1003.parquet")
