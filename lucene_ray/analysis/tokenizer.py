"""StandardAnalyzer-equivalent tokenization as stateless, batch-vectorizable UDFs.

Semantics modeled on the reference's UAX#29 word-break tokenizer
(lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java:31-113,
grammar StandardTokenizerImpl.jflex) and the analyzer chain
StandardTokenizer -> LowerCaseFilter -> StopFilter
(analysis/standard/StandardAnalyzer.java:34-96, default stop set EMPTY).

This is a fresh implementation of the UAX#29 rules we need, not a port of
the generated JFlex DFA:

* word chains: runs of word characters (letters / digits / underscore —
  ExtendNumLet joins chains, so ``foo_bar`` is one token);
* MidLetter / Single_Quote: ``'`` and ``’`` join letter chains (``can't``);
* MidNumLet: ``.`` joins chains on both sides (``b.com``, ``3.14``);
* MidNum: ``,`` joins digit-adjacent chains (``1,000,000``);
* ideographic (Han) characters emit one token per character
  (StandardTokenizer token type IDEOGRAPHIC);
* tokens longer than ``max_token_length`` (default 255, StandardTokenizer
  maxTokenLength) are split into successive chunks, as the reference does.

Known round-1 deviations from the JFlex DFA (documented, covered by golden
tests in tests/test_analysis.py): combining marks and a few rare
Extend/Format cases follow Python's ``\\w`` class rather than the exact
UAX#29 property set. The oracle-checked corpora are ASCII, where behavior
is identical.
"""

from __future__ import annotations

import re
from typing import Iterable

# ---------------------------------------------------------------------------
# Core token pattern.
#
#   word chain: \w+ optionally extended by joiners:
#     '.'            between any word chars (MidNumLet)
#     '\'' / '’'     between word chars (Single_Quote / MidLetter ')
#     ','            only between digits (MidNum)
# Han ideographs are carved out of matched chains afterwards (Python's \w
# cannot express class subtraction).
# ---------------------------------------------------------------------------
_WORD_RE = re.compile(
    r"\w+(?:(?:['’.]\w+)|(?:(?<=\d),(?=\d)\w+))*",
    re.UNICODE,
)

# CJK ideograph ranges emitted as single-character tokens.
_IDEO_RE = re.compile(
    "([一-鿿㐀-䶿豈-﫿\U00020000-\U0002a6df])"
)

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardTokenizer.maxTokenLength default


def _split_ideographic(token: str) -> Iterable[str]:
    """Split a matched chain so each Han char is its own token."""
    parts = _IDEO_RE.split(token)
    for p in parts:
        if p:
            yield p


def tokenize(text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH) -> list[str]:
    """Tokenize one string; returns surface forms (no lowercasing)."""
    out: list[str] = []
    for m in _WORD_RE.finditer(text):
        tok = m.group(0)
        pieces = _split_ideographic(tok) if _IDEO_RE.search(tok) else (tok,)
        for p in pieces:
            if len(p) <= max_token_length:
                out.append(p)
            else:
                # Reference behavior: oversized tokens are chopped into
                # maxTokenLength chunks, remainder continues as next token.
                for i in range(0, len(p), max_token_length):
                    out.append(p[i : i + max_token_length])
    return out


def tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[tuple[str, int, int, int]]:
    """Tokenize returning (term, position, start_offset, end_offset).

    Positions are 0-based token indices (position increments of 1 — no
    graph tokens in the standard chain).
    """
    out: list[tuple[str, int, int, int]] = []
    pos = 0
    for m in _WORD_RE.finditer(text):
        tok, start = m.group(0), m.start()
        if _IDEO_RE.search(tok):
            off = 0
            for p in _split_ideographic(tok):
                s = start + off
                out.append((p, pos, s, s + len(p)))
                pos += 1
                off += len(p)
        elif len(tok) <= max_token_length:
            out.append((tok, pos, start, start + len(tok)))
            pos += 1
        else:
            for i in range(0, len(tok), max_token_length):
                p = tok[i : i + max_token_length]
                out.append((p, pos, start + i, start + i + len(p)))
                pos += 1
    return out


# English stop set: EnglishAnalyzer.ENGLISH_STOP_WORDS_SET
# (analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:43-52)
ENGLISH_STOP_WORDS = frozenset(
    (
        "a an and are as at be but by for if in into is it no not of on "
        "or such that the their then there these they this to was will with"
    ).split()
)
