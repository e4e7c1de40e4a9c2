"""TermAutomatonQuery (sandbox TermAutomatonQuery.java:59 role) vs a
per-document brute-force NFA over the tokenized corpus."""

import numpy as np
import pytest

from lucene_ray.search.scoring import automaton_from_token_stream
from lucene_ray.search.searcher import Searcher


@pytest.fixture(scope="module")
def searcher(built_index):
    idx, _m = built_index
    return Searcher(idx)


def brute_automaton(tokens_per_doc, ids, n_states, transitions, accept):
    """Scalar NFA: for every doc, every start position, walk every path;
    freq = distinct accepted end positions."""
    out = {}
    edges = {}
    for f, t, term in transitions:
        edges.setdefault(f, []).append((t, term))
    for did, toks in zip(ids, tokens_per_doc):
        ends = set()
        n = len(toks)
        for start in range(n):
            frontier = {(0, start)}
            seen = set()
            while frontier:
                state, pos = frontier.pop()
                if (state, pos) in seen:
                    continue
                seen.add((state, pos))
                if state in accept and pos > start:
                    ends.add(pos)
                if pos >= n:
                    continue
                for to, term in edges.get(state, ()):
                    if term is None or toks[pos] == term:
                        frontier.add((to, pos + 1))
        if ends:
            out[int(did)] = len(ends)
    return out


def _assert_matches(searcher, brute_force, n_states, transitions, accept):
    docs, freqs = searcher.term_automaton_freqs(n_states, transitions, accept)
    got = dict(zip(docs.tolist(), freqs.tolist()))
    want = brute_automaton(brute_force["tokens"], brute_force["ids"],
                           n_states, transitions, accept)
    assert got == want and want


def test_optional_middle_token(searcher, brute_force):
    # "key value" OR "key ? value" — two path lengths, not a multi-phrase
    n_states = 4
    transitions = ((0, 1, "key"), (1, 3, "value"),
                   (1, 2, None), (2, 3, "value"))
    _assert_matches(searcher, brute_force, n_states, transitions, (3,))


def test_synonym_branch(searcher, brute_force):
    # "key (value|table)" — equivalent to a multi-phrase; cross-checks
    # the automaton path against the established matcher
    n_states = 3
    transitions = ((0, 1, "key"), (1, 2, "value"), (1, 2, "table"))
    docs, freqs = searcher.term_automaton_freqs(n_states, transitions, (2,))
    d2, f2 = searcher.multi_phrase_freqs((("key",), ("value", "table")))
    o1, o2 = np.argsort(docs), np.argsort(d2)
    assert docs[o1].tolist() == d2[o2].tolist()
    assert freqs[o1].tolist() == f2[o2].tolist()
    _assert_matches(searcher, brute_force, n_states, transitions, (2,))


def test_token_stream_builder_hole_and_synonym():
    # "big <hole> data" with synonym 'large' on 'big'
    n, tr, acc = automaton_from_token_stream(
        [("big", 1), ("large", 0), ("data", 2)])
    assert n == 4 and acc == (3,)
    assert set(tr) == {(0, 1, "big"), (0, 1, "large"),
                       (1, 2, None), (2, 3, "data")}


def test_token_stream_builder_end_to_end(searcher, brute_force):
    n, tr, acc = automaton_from_token_stream([("key", 1), ("value", 2)])
    _assert_matches(searcher, brute_force, n, tr, acc)


def test_cycle_rejected(searcher):
    with pytest.raises(ValueError, match="acyclic"):
        searcher.term_automaton_freqs(
            2, ((0, 1, "key"), (1, 0, "value")), (1,))


def test_leading_any_rejected(searcher):
    with pytest.raises(NotImplementedError):
        searcher.term_automaton_freqs(
            3, ((0, 1, None), (1, 2, "key")), (2,))
