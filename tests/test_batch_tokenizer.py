"""Vectorized ASCII tokenizer path must be token- and position-identical
to the exact Python analyzer on realistic web text (round-1 finding: the
old fast path only fired on ^[a-z0-9_ ]*$ and any stop set disabled it)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.analysis.analyzers import Analyzer, EnglishAnalyzer, StandardAnalyzer
from lucene_ray.analysis.batch import tokenize_column

REALISTIC = [
    "The Quick Brown Fox jumps over the lazy dog!",
    "Visit https://example.com/path?q=1&x=2 for more info.",
    "He said: \"Don't do it, John.\" (but he did).",
    "Totals: 1,000,000 units at $3.14 each -- amazing!?",
    "mixed_CASE tokens, CamelCase and snake_case_words...",
    "trailing dots... and 'quoted' words, can't won't o'clock",
    "a.b.c d'e'f 1,2,3 x.y's",
    "",
    "    ",
    "line\nbreaks\tand\ttabs are separators",
    "email-like foo.bar@baz.com and IPs 192.168.0.1",
    "!!!", "a", "A.", ".a", "a.", "'a'", ",1, 1,", "_ _a a_",
]


def _brute(texts, analyzer):
    terms, docs, pos = [], [], []
    for i, t in enumerate(texts):
        for term, p in analyzer.tokens_with_positions(t):
            terms.append(term)
            docs.append(i)
            pos.append(p)
    return terms, docs, pos


@pytest.mark.parametrize("analyzer", [StandardAnalyzer, EnglishAnalyzer,
                                      Analyzer(lowercase=False)])
def test_fast_path_matches_python_analyzer(analyzer):
    flat, doc_idx, positions = tokenize_column(pa.array(REALISTIC), analyzer)
    want_t, want_d, want_p = _brute(REALISTIC, analyzer)
    assert flat.to_pylist() == want_t
    assert doc_idx.tolist() == want_d
    assert positions.tolist() == want_p


def test_mixed_ascii_nonascii_batch():
    texts = REALISTIC + ["héllo wörld", "日本語 テスト one two", "naïve café"]
    flat, doc_idx, positions = tokenize_column(pa.array(texts), StandardAnalyzer)
    want_t, want_d, want_p = _brute(texts, StandardAnalyzer)
    assert flat.to_pylist() == want_t
    assert doc_idx.tolist() == want_d
    assert positions.tolist() == want_p


def test_stop_filter_keeps_position_gaps():
    texts = ["the cat and the hat", "To be or not to be"]
    flat, doc_idx, positions = tokenize_column(pa.array(texts), EnglishAnalyzer)
    # doc 0: 'cat' at pos 1, 'hat' at pos 4 (the/and dropped, gaps kept)
    d0 = [(t, p) for t, d, p in zip(flat.to_pylist(), doc_idx, positions) if d == 0]
    assert d0 == [("cat", 1), ("hat", 4)]


def test_long_token_chopping_routes_to_python():
    long_tok = "x" * 600
    texts = ["short stuff", f"prefix {long_tok} suffix"]
    flat, doc_idx, _ = tokenize_column(pa.array(texts), StandardAnalyzer)
    want_t, want_d, _ = _brute(texts, StandardAnalyzer)
    assert flat.to_pylist() == want_t
    assert doc_idx.tolist() == want_d


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abcXYZ019_'.,!? \t\n-@#$%^&*()[]{};:<>/\\\"`~=+")
            ),
            max_size=60,
        ),
        max_size=8,
    )
)
def test_hypothesis_ascii_equivalence(texts):
    flat, doc_idx, positions = tokenize_column(pa.array(texts, type=pa.string()),
                                               StandardAnalyzer)
    want_t, want_d, want_p = _brute(texts, StandardAnalyzer)
    assert flat.to_pylist() == want_t
    assert doc_idx.tolist() == want_d
    assert positions.tolist() == want_p
