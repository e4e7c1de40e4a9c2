"""Flexible/precedence query parser (search/flexible.py — the
StandardQueryParser.java:71 config-driven pipeline role)."""

import numpy as np

from lucene_ray.search import query as Q
from lucene_ray.search.flexible import parse_flexible
from lucene_ray.search.parser import parse_query


def test_and_binds_tighter_than_or():
    q = parse_flexible("a AND b OR c")
    assert isinstance(q, Q.BooleanQuery)
    assert len(q.should) == 2 and not q.must
    inner = q.should[0]
    assert isinstance(inner, Q.BooleanQuery)
    assert {t.term for t in inner.must} == {"a", "b"}
    assert q.should[1].term == "c"


def test_precedence_match_set_differs_from_classic(built_index):
    """The flexible parser MATCHES window-only docs for
    'table AND key OR window'; the classic parser's +table +key window
    rewrite does not — the precedence wart the flexible pipeline fixes."""
    from lucene_ray.search.searcher import Searcher

    s = Searcher(built_index[0])
    flex_docs, _ = s.search_all(parse_flexible("table AND key OR window"))
    classic_docs, _ = s.search_all(parse_query("table AND key OR window"))

    tdocs, _ = s.search_all(Q.TermQuery("table"))
    kdocs, _ = s.search_all(Q.TermQuery("key"))
    wdocs, _ = s.search_all(Q.TermQuery("window"))
    t, k, w = set(tdocs.tolist()), set(kdocs.tolist()), set(wdocs.tolist())
    assert set(flex_docs.tolist()) == (t & k) | w
    assert set(classic_docs.tolist()) == (t & k)
    assert w - (t & k), "fixture must contain window-only docs"


def test_default_operator_and():
    q = parse_flexible("a b c", default_operator="and")
    assert isinstance(q, Q.BooleanQuery)
    assert {t.term for t in q.must} == {"a", "b", "c"} and not q.should
    q2 = parse_flexible("a b OR c", default_operator="and")
    # (a AND b) OR c
    assert len(q2.should) == 2
    assert {t.term for t in q2.should[0].must} == {"a", "b"}


def test_not_binds_to_current_group():
    q = parse_flexible("a NOT b OR c")
    # (a AND NOT b) OR c
    assert len(q.should) == 2
    inner = q.should[0]
    assert inner.must[0].term == "a" and inner.must_not[0].term == "b"


def test_config_defaults_and_multifield():
    q = parse_flexible('"key value"', phrase_slop=3)
    assert isinstance(q, Q.PhraseQuery) and q.slop == 3
    # explicit slop wins over config
    q2 = parse_flexible('"key value"~1', phrase_slop=3)
    assert q2.slop == 1
    q3 = parse_flexible("tble~", fuzzy_max_edits=1)
    assert isinstance(q3, Q.FuzzyQuery) and q3.max_edits == 1

    q4 = parse_flexible("scan", multi_fields=("title", "body"),
                        field_boosts={"title": 2.0})
    assert isinstance(q4, Q.DisjunctionMaxQuery)
    assert q4.queries[0].boost == 2.0
    assert q4.queries[0].query.field == "title"
    assert q4.queries[1].field == "body"
    # an explicit field prefix opts out of expansion
    q5 = parse_flexible("title:scan", multi_fields=("title", "body"))
    assert isinstance(q5, Q.TermQuery) and q5.field == "title"


def test_groups_and_boost():
    q = parse_flexible("a AND (b OR c)^2")
    assert isinstance(q, Q.BooleanQuery)
    boosted = q.must[1]
    assert isinstance(boosted, Q.BoostQuery) and boosted.boost == 2.0


def test_empty_and_bare_connectors():
    assert isinstance(parse_flexible(""), Q.MatchAllDocsQuery)
    assert isinstance(parse_flexible("AND OR"), Q.MatchAllDocsQuery)


def test_xml_parser_builders(built_index):
    """XML CoreParser role (queryparser/xml/CoreParser.java:48): the
    builder registry maps elements to Query dataclasses; a parsed
    BooleanQuery matches exactly what the equivalent programmatic query
    matches; unknown elements and malformed XML raise."""
    import pytest

    from lucene_ray.search.searcher import Searcher
    from lucene_ray.search.xmlparser import (XMLParseError,
                                             parse_xml_query,
                                             register_builder)

    s = Searcher(built_index[0])
    xml = """
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>table</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>key</TermQuery></Clause>
    </BooleanQuery>"""
    want_q = Q.BooleanQuery(must=(Q.TermQuery("table"),),
                            must_not=(Q.TermQuery("key"),))
    dx, sx = s.search_all(parse_xml_query(xml))
    dw, sw = s.search_all(want_q)
    assert dx.tolist() == dw.tolist()
    assert np.allclose(sx, sw)

    # UserQuery delegates to the classic parser
    du, _ = s.search_all(parse_xml_query("<UserQuery>+table -key</UserQuery>"))
    assert du.tolist() == dw.tolist()

    with pytest.raises(XMLParseError):
        parse_xml_query("<WhatQuery/>")
    with pytest.raises(XMLParseError):
        parse_xml_query("<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>")
    with pytest.raises(XMLParseError):
        parse_xml_query("not xml at all <")

    # extension point: a custom builder registers and dispatches
    register_builder("EverythingQuery",
                     lambda el, a, f, child: Q.MatchAllDocsQuery())
    de, _ = s.search_all(parse_xml_query("<EverythingQuery/>"))
    assert de.shape[0] == s.count(Q.MatchAllDocsQuery())


def test_collector_manager_hook(built_index):
    """Public Collector/CollectorManager extension surface
    (CollectorManager.java:42; search/collectors.py): built-in managers
    agree with the native paths, and a custom manager collects
    per-segment partials that reduce correctly."""
    from lucene_ray.search.collectors import (CollectorManager,
                                              TopScoreDocCollectorManager,
                                              TotalHitCountCollectorManager)
    from lucene_ray.search.searcher import Searcher

    s = Searcher(built_index[0])
    q = Q.BooleanQuery(should=(Q.TermQuery("table"), Q.TermQuery("key")))

    n = s.search_with_collector(q, TotalHitCountCollectorManager())
    assert n == s.count(q)

    docs, scores = s.search_with_collector(q, TopScoreDocCollectorManager(5))
    td = s.search(q, k=5, prune=False)
    assert docs.tolist() == td.doc_ids.tolist()
    assert np.allclose(scores, td.scores)

    class EvenOddCounter(CollectorManager):
        def collect_leaf(self, _reader, d, _s):
            return int((d % 2 == 0).sum()), int((d % 2 == 1).sum())

        def reduce(self, partials):
            return (sum(p[0] for p in partials),
                    sum(p[1] for p in partials))

    all_docs, _ = s.search_all(q)
    even, odd = s.search_with_collector(q, EvenOddCounter())
    assert even == int((all_docs % 2 == 0).sum())
    assert odd == int((all_docs % 2 == 1).sum())
    assert even + odd == s.count(q)


def test_string_dv_sort_collector(tmp_path, ray_session, sf_dir):
    """Sort by string doc values through the collector hook, descending
    included, with update overlays in the keys."""
    import os

    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index
    from lucene_ray.index.docvalues import update_string_doc_values
    from lucene_ray.search.collectors import TopFieldStringDVCollectorManager
    from lucene_ray.search.searcher import Searcher

    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "sdvsort")
    build_index(docs, idx, num_segments=2, string_values={"src": "source"})
    ids = pq.read_table(docs, columns=["doc_id"])["doc_id"].to_numpy()
    sel = ids[ids % 9 == 0]
    update_string_doc_values(idx, "src", sel, ["zzz-last"] * sel.shape[0])

    s = Searcher(idx)
    asc = s.search_with_collector(
        Q.MatchAllDocsQuery(), TopFieldStringDVCollectorManager("src", k=5))
    vals = [p[0] for p in asc]
    assert vals == sorted(vals)
    desc = s.search_with_collector(
        Q.MatchAllDocsQuery(),
        TopFieldStringDVCollectorManager("src", k=5, ascending=False))
    dvals = [p[0] for p in desc]
    assert dvals == sorted(dvals, reverse=True)
    assert dvals[0] == "zzz-last"          # the overlay value sorts last
    ddocs = [p[1] for p in desc if p[0] == "zzz-last"]
    assert ddocs == sorted(ddocs)          # doc-asc tie-break both ways
