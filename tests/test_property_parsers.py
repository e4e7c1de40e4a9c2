"""Parser fuzz: every parser family must return a Query (never raise)
on arbitrary printable input, and the result must survive the
to_dict/from_dict round trip and resolve_fields — the robustness
contract real query frontends need (garbage-in never 500s)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_ray.search import query as Q

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=40)

# syntax-heavy soup: operators, quotes, parens, ranges, boosts, fields
soup = st.lists(st.sampled_from([
    "AND", "OR", "NOT", "+", "-", "(", ")", '"', "~", "~2", "^2", "*",
    "?", "[", "]", "{", "}", "TO", ":", "title:", "key", "value",
    "tab*", "k?y", "/k.y/", "va~1", " ",
]), min_size=1, max_size=12).map("".join)


def _round_trip(q: Q.Query):
    d = q.to_dict()
    q2 = Q.query_from_dict(d)
    assert q2.to_dict() == d
    Q.resolve_fields(q)  # must not raise


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=st.one_of(printable, soup))
def test_classic_parser_never_raises(text):
    from lucene_ray.search.parser import parse_query

    _round_trip(parse_query(text, fields={"title"}))


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=st.one_of(printable, soup))
def test_simple_parser_never_raises(text):
    from lucene_ray.search.simpleparser import parse_simple_query

    _round_trip(parse_simple_query(text))


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=st.one_of(printable, soup))
def test_flexible_parser_never_raises(text):
    from lucene_ray.search.flexible import parse_flexible

    _round_trip(parse_flexible(text))


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=st.one_of(printable, soup))
def test_multi_field_parser_never_raises(text):
    from lucene_ray.search.parser import parse_multi_field

    _round_trip(parse_multi_field(text, (None, "title"),
                                  boosts={"title": 2.0}))
