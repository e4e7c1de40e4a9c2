"""Driver-contract invariants for __ray_entry__ (the surface the round
driver calls): every oracle has a matching query, entry() produces a
non-empty stable-schema result, and a sample of entries runs at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = sorted(set(o) - set(q))
    assert not missing, f"oracles without queries: {missing}"
    # rows-only entries are allowed, but should stay a small minority
    rows_only = sorted(set(q) - set(o))
    assert len(rows_only) <= len(q) // 3, rows_only


def test_entry_smoke(ray_session):
    t = entrymod.entry()
    assert t.num_rows > 0
    assert t.column_names == ["qid", "rank", "doc_id", "score"]


def test_sample_queries_run(ray_session):
    q = entrymod.queries()
    for name in ("term_query", "phrase_query", "dedup_exact", "events_sliding_window"):
        t = q[name](SF)
        n = t.num_rows if hasattr(t, "num_rows") else len(t)
        assert n > 0, name
