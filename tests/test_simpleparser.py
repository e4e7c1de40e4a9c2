"""SimpleQueryParser (queryparser/simple/SimpleQueryParser.java:33-105):
lenient human syntax -> Query AST. Pure parser tests (no Ray)."""

from lucene_ray.search import query as Q
from lucene_ray.search.simpleparser import parse_simple_query as p


def test_operators_and_precedence():
    # AND binds tighter than OR; '-' lifts to MUST_NOT of its level
    q = p("table + wind* | customer -key")
    assert isinstance(q, Q.BooleanQuery)
    assert q.must_not == (Q.TermQuery("key"),)
    andg, cust = q.should
    assert cust == Q.TermQuery("customer")
    assert andg.must == (Q.TermQuery("table"), Q.PrefixQuery("wind"))


def test_adjacency_is_or():
    q = p("a b c")
    assert q == Q.BooleanQuery(should=(
        Q.TermQuery("a"), Q.TermQuery("b"), Q.TermQuery("c")))


def test_phrase_slop_fuzzy_group():
    q = p('"key value"~1 | spark~1')
    ph, fz = q.should
    assert ph == Q.PhraseQuery(("key", "value"), slop=1)
    assert fz == Q.FuzzyQuery("spark", max_edits=1)
    g = p("a + (b | c)")
    assert g.must[0] == Q.TermQuery("a")
    assert g.must[1].should == (Q.TermQuery("b"), Q.TermQuery("c"))


def test_negated_group_and_and_level_not():
    q = p("-(a b) c")
    assert q.should == (Q.TermQuery("c"),)
    assert q.must_not[0].should == (Q.TermQuery("a"), Q.TermQuery("b"))
    q2 = p("a + -b")
    assert q2.must == (Q.TermQuery("a"),)
    assert q2.must_not == (Q.TermQuery("b"),)


def test_lenient_never_raises():
    for junk in ("", ")(", '"unclosed', "+ | -", "a ~ b", "\\", "a)b",
                 "((((", "-", "|||", 'a"b'):
        p(junk)  # must not raise
    assert p("") == Q.MatchAllDocsQuery()
    assert p('"unclosed key').terms == ("unclosed", "key")


def test_stray_close_paren_keeps_rest():
    # a top-level ')' is skipped, everything after it still parses
    q = p("foo) bar baz")
    assert q == Q.BooleanQuery(should=(
        Q.TermQuery("foo"), Q.TermQuery("bar"), Q.TermQuery("baz")))


def test_hyphen_inside_word_is_not_negation():
    # "wi-fi" is one human term (analyzed to a phrase), NOT wi AND NOT fi
    q = p("wi-fi")
    assert q == Q.PhraseQuery(("wi", "fi"))
    # but a boundary '-' still negates
    q2 = p("a -b")
    assert q2.must_not == (Q.TermQuery("b"),)


def test_field_weights_disjunction():
    q = p("foo", field_weights={None: 1.0, "title": 2.0})
    assert q.should == (Q.TermQuery("foo", boost=1.0),
                        Q.TermQuery("foo", boost=2.0, field="title"))


def test_escapes_and_double_bars():
    assert p("a || b") == p("a | b")
    assert p("a && b") == p("a + b")
    p(r"wi\+fi")  # escaped operator reaches the analyzer, never raises


def test_surround_parser():
    """Surround syntax (queryparser/surround): W/N distance ops map to
    ordered/unordered intervals (maxgaps = n-1), AND/OR/NOT to booleans,
    bare leaves to ordinary term/prefix queries, malformed input raises."""
    import pytest

    from lucene_ray.search import intervals as IV
    from lucene_ray.search.surround import SurroundParseError, parse_surround

    q = parse_surround("3w(spark, window) and customer")
    assert isinstance(q, Q.BooleanQuery)
    iv, term = q.must
    assert iv.source == IV.Ordered((IV.Term("spark"), IV.Term("window")),
                                   maxgaps=2)
    assert term == Q.TermQuery("customer")
    # infix default distance 1, unordered
    q2 = parse_surround("a N b")
    assert q2.source == IV.Unordered((IV.Term("a"), IV.Term("b")), maxgaps=0)
    # OR of sources stays an interval Or inside a distance op
    q3 = parse_surround("2n(a or b, c)")
    assert isinstance(q3.source, IV.Unordered)
    assert isinstance(q3.source.sources[0], IV.Or)
    # prefix leaf in boolean context is a PrefixQuery
    q4 = parse_surround("te* AND b")
    assert q4.must[0] == Q.PrefixQuery("te")
    # NOT
    q5 = parse_surround("a not b")
    assert q5.must_not == (Q.TermQuery("b"),)
    # top-level OR is a SCORED boolean, not a constant interval (review fix)
    q6 = parse_surround("spark or window")
    assert q6 == Q.BooleanQuery(should=(Q.TermQuery("spark"),
                                        Q.TermQuery("window")))
    for bad in ("", "3w(a and b, c)", "(a", "3w a", "and"):
        with pytest.raises(SurroundParseError):
            parse_surround(bad)


def test_simple_parser_never_raises_hypothesis():
    """The reference parser's core contract is 'never throws on human
    input' (SimpleQueryParser.java:33) — fuzz it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list('ab c+|-()"~*\\&xyz0123'))

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def _fuzz(text):
        q = p(text)
        assert q is not None

    _fuzz()


def test_surround_parser_raises_cleanly_hypothesis():
    """parse_surround either returns a Query or raises SurroundParseError
    — never a different exception type (fuzz)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_ray.search.surround import SurroundParseError, parse_surround

    alphabet = st.sampled_from(list("ab c,()wWnN35orandnot*"))

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def _fuzz(text):
        try:
            parse_surround(text)
        except SurroundParseError:
            pass

    _fuzz()
