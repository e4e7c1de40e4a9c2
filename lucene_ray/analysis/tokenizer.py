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

Round-4 UAX#29 upgrade (WB4): combining marks (Mn/Mc — the Extend class)
and format characters (Cf, e.g. ZWNJ/soft hyphen) attached to a word
chain are ABSORBED into the token (included in its surface form, exactly
as the reference DFA's yytext() keeps them), so NFD text like
``cafe\\u0301`` tokenizes as one token. Marks/format chars NOT preceded
by a word chain act as separators (the DFA never starts a token on
them). Remaining deviations (documented, covered by golden tests in
tests/test_analysis.py): regional indicators, Hiragana token types and
Complex_Context (Thai/Lao) follow the word-chain rule rather than the
exact UAX#29 segment classes.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from typing import Iterable


def _char_class(cats: "frozenset[str] | set[str]") -> str:
    """Regex character-class body (\\uXXXX-escaped ranges) for the given
    Unicode general categories — Python ``re`` has no ``\\p{...}``."""
    ranges: list[tuple[int, int]] = []
    start = prev = None
    for cp in range(sys.maxunicode + 1):
        if unicodedata.category(chr(cp)) in cats:
            if prev is not None and cp == prev + 1:
                prev = cp
            else:
                if start is not None:
                    ranges.append((start, prev))
                start = prev = cp
    if start is not None:
        ranges.append((start, prev))

    def f(c: int) -> str:
        return f"\\U{c:08x}" if c > 0xFFFF else f"\\u{c:04x}"

    return "".join(f(a) + ("-" + f(b) if b > a else "") for a, b in ranges)


# Extend/Format absorption class (UAX#29 WB4): nonspacing + spacing
# combining marks and format controls. Built once per process (~0.2 s,
# lazy so pure-ASCII workflows never pay it).
_EXT_CLASS: str | None = None
_WORD_RE_C: "re.Pattern[str] | None" = None

# ---------------------------------------------------------------------------
# Core token pattern.
#
#   atom: \w followed by word chars or absorbed Extend/Format chars
#   word chain: atom optionally extended by joiners:
#     '.'            between any word chars (MidNumLet)
#     '\'' / '’'     between word chars (Single_Quote / MidLetter ')
#     ','            only between digits (MidNum)
# Han ideographs are carved out of matched chains afterwards (Python's \w
# cannot express class subtraction).
# ---------------------------------------------------------------------------


def _word_re() -> "re.Pattern[str]":
    global _EXT_CLASS, _WORD_RE_C
    if _WORD_RE_C is None:
        _EXT_CLASS = _char_class({"Mn", "Mc", "Cf"})
        atom = r"\w[\w%s]*" % _EXT_CLASS
        _WORD_RE_C = re.compile(
            r"%(a)s(?:(?:['’.]%(a)s)|(?:(?<=\d),(?=\d)%(a)s))*" % {"a": atom},
            re.UNICODE,
        )
    return _WORD_RE_C

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
    for m in _word_re().finditer(text):
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
    for m in _word_re().finditer(text):
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


# ---------------------------------------------------------------------------
# Alternative raw tokenizers (Analyzer(tokenizer=...)):
# core/WhitespaceTokenizer.java:28, core/LetterTokenizer.java:29,
# core/KeywordTokenizer.java:28, path/PathHierarchyTokenizer.java:40,
# pattern/PatternTokenizer.java:53. Each returns the same
# (term, position, start, end) stream shape as tokenize_with_offsets.

_WS_TOK_RE = re.compile(r"\S+")
_LETTER_TOK_RE = re.compile(r"[^\W\d_]+")  # Unicode letters only


def _chopped(tok: str, pos: int, start: int, max_token_length: int):
    """maxTokenLen chopping shared by the whitespace/letter tokenizers
    (the reference's CharTokenizer buffer split)."""
    if len(tok) <= max_token_length:
        yield tok, pos, start, start + len(tok)
        return
    for i in range(0, len(tok), max_token_length):
        p = tok[i:i + max_token_length]
        yield p, pos, start + i, start + i + len(p)
        pos += 1


def whitespace_tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[tuple[str, int, int, int]]:
    """WhitespaceTokenizer: maximal runs of non-whitespace."""
    out: list[tuple[str, int, int, int]] = []
    for m in _WS_TOK_RE.finditer(text):
        for part in _chopped(m.group(0), len(out), m.start(),
                             max_token_length):
            out.append(part)
    return out


def letter_tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[tuple[str, int, int, int]]:
    """LetterTokenizer: maximal runs of Unicode letters (digits,
    underscore and joiners all split)."""
    out: list[tuple[str, int, int, int]] = []
    for m in _LETTER_TOK_RE.finditer(text):
        for part in _chopped(m.group(0), len(out), m.start(),
                             max_token_length):
            out.append(part)
    return out


def keyword_tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[tuple[str, int, int, int]]:
    """KeywordTokenizer: the entire input is ONE token (no chopping —
    the reference emits the whole buffer regardless of length)."""
    if not text:
        return []
    return [(text, 0, 0, len(text))]


def path_hierarchy_tokenize_with_offsets(
    text: str, delimiter: str = "/", replacement: "str | None" = None,
    skip: int = 0,
) -> list[tuple[str, int, int, int]]:
    """PathHierarchyTokenizer: '/a/b/c' emits '/a', '/a/b', '/a/b/c' —
    every prefix at position 0 (the reference's first token has
    posInc=1, the rest posInc=0). ``skip`` drops that many leading
    components from every emitted token (tokens then start at the
    first kept delimiter, as in the reference); ``replacement``
    rewrites the delimiter in the EMITTED terms (offsets still refer
    to the original text)."""
    if not text:
        return []
    rep = delimiter if replacement is None else replacement
    # component boundaries: every delimiter position + end of string
    ends = [i for i, ch in enumerate(text) if ch == delimiter
            and i != 0] + [len(text)]
    # a leading delimiter belongs to the first component
    out: list[tuple[str, int, int, int]] = []
    base = 0
    if skip:
        # start after `skip` delimiter-separated components
        seen = 0
        for i, ch in enumerate(text):
            if ch == delimiter:
                seen += 1
                if seen == skip + (1 if text.startswith(delimiter) else 0):
                    base = i
                    break
        else:
            return []
        ends = [e for e in ends if e > base]
    for e in ends:
        if e == base:
            continue
        term = text[base:e]
        if rep != delimiter:
            term = term.replace(delimiter, rep)
        out.append((term, 0, base, e))
    # drop a trailing empty component ('/a/' -> '/a' once, not twice)
    dedup: list[tuple[str, int, int, int]] = []
    for t in out:
        if dedup and t[0] == dedup[-1][0]:
            continue
        dedup.append(t)
    return dedup


def pattern_tokenize_with_offsets(
    text: str, pattern: str, group: int = -1
) -> list[tuple[str, int, int, int]]:
    """PatternTokenizer: ``group=-1`` treats the pattern as the
    SEPARATOR (split mode); ``group>=0`` emits that capture group of
    every match."""
    rx = re.compile(pattern)
    out: list[tuple[str, int, int, int]] = []
    if group < 0:
        last = 0
        for m in rx.finditer(text):
            if m.start() > last:
                out.append((text[last:m.start()], len(out), last,
                            m.start()))
            last = max(last, m.end())
            if m.end() == m.start():  # zero-width separator: advance
                last += 1
        if last < len(text):
            out.append((text[last:], len(out), last, len(text)))
        return out
    for m in rx.finditer(text):
        tok = m.group(group)
        if tok:
            out.append((tok, len(out), m.start(group), m.end(group)))
    return out
