"""UAX29URLEmailTokenizer role: StandardTokenizer plus URL / EMAIL
token types emitted as SINGLE tokens.

Semantics modeled on the reference's
analysis/common/src/java/org/apache/lucene/analysis/standard/
UAX29URLEmailTokenizer.java:52 (grammar UAX29URLEmailTokenizerImpl.jflex,
which layers RFC 3986 URL and RFC 5321 email productions over the UAX#29
word-break rules). Fresh implementation of the subset we need, not a port
of the generated DFA:

* **EMAIL** — ``local@domain`` with an RFC 5321 dot-atom local part
  (atext = alnum + ``!#$%&'*+/=?^_`{|}~-``, dot-separated atoms) and a
  dotted domain ending in an alphabetic TLD (length >= 2);
* **URL** — ``http(s)://`` / ``ftp://`` schemes, or a scheme-less
  ``www.``-prefixed authority, followed by host[:port][/path?query#frag];
  trailing sentence punctuation (``.,;:!?'")]}``) is trimmed off the
  match (the reference grammar's path production likewise excludes a
  bare trailing full stop);
* everything BETWEEN the protected spans tokenizes through the standard
  UAX#29 chain (tokenizer.tokenize_with_offsets), with positions
  renumbered over the combined stream and offsets referring to the
  original text.

Documented deviations (golden-tested in tests/test_analysis.py):
userinfo@host URLs resolve as an URL whose path swallows the
query/fragment charset rather than via the grammar's dedicated userinfo
production; internationalized (non-ASCII) hostnames fall to the word
chain; a match is only taken at a non-word boundary (lookbehind), so
``xhttps://a.com`` keeps ``xhttps`` as a word token.
"""

from __future__ import annotations

import re

from lucene_ray.analysis.tokenizer import (DEFAULT_MAX_TOKEN_LENGTH,
                                           tokenize_with_offsets)

_ATEXT = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]"
_EMAIL_SRC = (
    rf"{_ATEXT}+(?:\.{_ATEXT}+)*"
    r"@(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}"
)
_URL_SRC = (
    r"(?:(?:https?|ftp)://|www\.)"
    r"[A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?"  # host
    r"(?::\d{1,5})?"                               # port
    r"(?:/[^\s<>\"'`)\]}]*)?"                      # path + query + fragment
)
# URL first: at a shared start ('www.x.com') the URL production wins, as
# in the reference grammar's longest-match ordering; a bare local@domain
# never starts with a scheme so EMAIL still fires. The lookbehind keeps
# matches anchored at word-break boundaries.
_COMBINED_RE = re.compile(
    rf"(?<![A-Za-z0-9_.@-])(?:(?P<url>{_URL_SRC})|(?P<email>{_EMAIL_SRC}))",
    re.IGNORECASE,
)
_TRAILING_PUNCT = ".,;:!?'\")]}"

# cheap row-level candidate test for the batch path: rows without any of
# these substrings cannot contain a URL/EMAIL production and tokenize
# identically to the standard chain
URLEMAIL_HINT_RE2 = r"(?i)(?:(?:https?|ftp)://|www\.|[A-Za-z0-9]@[A-Za-z0-9])"


def urlemail_tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[tuple[str, int, int, int]]:
    """(term, position, start_offset, end_offset) with URL/EMAIL spans
    kept whole; gaps run the standard UAX#29 tokenizer."""
    out: list[tuple[str, int, int, int]] = []
    pos = 0
    last = 0

    def _gap(upto: int) -> None:
        nonlocal pos
        if upto <= last:
            return
        for t, _p, gs, ge in tokenize_with_offsets(
                text[last:upto], max_token_length):
            out.append((t, pos, last + gs, last + ge))
            pos += 1

    for m in _COMBINED_RE.finditer(text):
        s = m.start()
        tok = m.group(0)
        if m.lastgroup == "url":
            tok = tok.rstrip(_TRAILING_PUNCT)
            if tok[:4].lower() == "www." and "/" not in tok:
                # a trimmed bare authority like 'www.x.com' must still
                # carry a real TLD chain; 'www.' alone is not a URL
                if len(tok) <= 4:
                    continue
        _gap(s)
        e = s + len(tok)
        if len(tok) <= max_token_length:
            out.append((tok, pos, s, e))
            pos += 1
        else:
            # reference behavior: oversized tokens chop into
            # maxTokenLength chunks (StandardTokenizer.maxTokenLength)
            for i in range(0, len(tok), max_token_length):
                p = tok[i:i + max_token_length]
                out.append((p, pos, s + i, s + i + len(p)))
                pos += 1
        last = e
    _gap(len(text))
    return out
