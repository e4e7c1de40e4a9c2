"""Optional token filters: Porter stemming and ASCII folding.

* :func:`porter_stem` — a fresh implementation of the Porter (1980)
  algorithm ("An algorithm for suffix stripping", Program 14(3)), the same
  published algorithm behind the reference's PorterStemFilter
  (analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemFilter.java:51);
  implemented from the paper's rules, not ported from the reference's
  generated code.
* :func:`ascii_fold` — accent/diacritic folding to ASCII for the Latin-1 /
  Latin Extended-A ranges plus common ligatures — the high-traffic subset
  of ASCIIFoldingFilter
  (analysis/common/.../miscellaneous/ASCIIFoldingFilter.java); built as a
  str.translate codepoint table, so folding a token is one C call.

Both operate per *unique* token: the batch tokenizer dictionary-encodes
the flat token array and maps only the vocabulary (see analysis/batch.py),
so per-token Python cost is O(vocab), not O(corpus).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# ASCII folding
# ---------------------------------------------------------------------------

_FOLD_PAIRS = {
    "àáâãäåāăą": "a", "çćĉċč": "c", "ďđ": "d", "èéêëēĕėęě": "e",
    "ĝğġģ": "g", "ĥħ": "h", "ìíîïĩīĭįı": "i", "ĵ": "j", "ķ": "k",
    "ĺļľŀł": "l", "ñńņňŉ": "n", "òóôõöøōŏő": "o", "ŕŗř": "r",
    "śŝşš": "s", "ţťŧ": "t", "ùúûüũūŭůűų": "u", "ŵ": "w", "ýÿŷ": "y",
    "źżž": "z", "þ": "th", "ð": "d", "ß": "ss", "æǽ": "ae", "œ": "oe",
}
_FOLD_TABLE: dict[int, str] = {}
for _src, _dst in _FOLD_PAIRS.items():
    for _ch in _src:
        _FOLD_TABLE[ord(_ch)] = _dst
        up = _ch.upper()
        if len(up) == 1:  # ß uppercases to 'SS' (already covered lowercase)
            _FOLD_TABLE[ord(up)] = _dst.upper()


def ascii_fold(w: str) -> str:
    """Fold accented Latin characters to their ASCII base form."""
    return w.translate(_FOLD_TABLE)


def cjk_width_fold(w: str) -> str:
    """CJKWidthFilter role (analysis/cjk/CJKWidthFilter.java:36): fold
    fullwidth ASCII variants (U+FF01-FF5E) to Basic Latin and halfwidth
    Katakana (U+FF66-FF9F) to fullwidth, COMPOSING the halfwidth
    voiced/semi-voiced marks (U+FF9E/FF9F) with the preceding kana
    (ﾃﾞ -> デ) — exactly the filter's scope, NOT a general NFKC (which
    would also rewrite ㈱/ﬁ-style compatibility chars the filter leaves
    alone). NFKC is applied per halfwidth-kana char/pair only."""
    import unicodedata

    out: list[str] = []
    for ch in w:
        o = ord(ch)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif o == 0x3000:                      # ideographic space
            out.append(" ")
        elif o in (0xFF9E, 0xFF9F):            # voiced marks compose
            if out:
                combined = unicodedata.normalize("NFKC", out[-1] + ch)
                if len(combined) == 1:
                    out[-1] = combined
                    continue
            # leading / uncombinable: the standalone fullwidth mark
            out.append(unicodedata.normalize("NFKC", ch))
        elif 0xFF66 <= o <= 0xFF9D:
            out.append(unicodedata.normalize("NFKC", ch))
        else:
            out.append(ch)
    return "".join(out)


def elide(w: str, articles: frozenset) -> str:
    """ElisionFilter (analysis/util/ElisionFilter.java:35): strip a
    leading article + apostrophe ("l'avion" -> "avion") when the prefix
    before the FIRST apostrophe (ASCII ' or typographic ’) is in the
    articles set. Expects lowercased input (the French chain lowercases
    after elision in the reference; with lowercase articles the streams
    agree)."""
    for apos in ("'", "’"):
        i = w.find(apos)
        if i >= 0:
            return w[i + 1:] if w[:i] in articles else w
    return w


def decimal_digit_fold(w: str) -> str:
    """DecimalDigitFilter (analysis/core/DecimalDigitFilter.java:31):
    fold every Unicode decimal digit (Nd) to its ASCII 0-9 form, so
    ٣ / ３ / ३ all index as 3."""
    if w.isascii():
        return w
    import unicodedata

    out = []
    for ch in w:
        d = unicodedata.decimal(ch, None)
        out.append(chr(0x30 + d) if d is not None else ch)
    return "".join(out)


_SCAND_SE = {"ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø"}


def scandinavian_normalize_token(w: str) -> str:
    """ScandinavianNormalizationFilter (miscellaneous/
    ScandinavianNormalizationFilter.java:38 + ScandinavianNormalizer
    .java:28, ALL_FOLDINGS): unify the interchangeable Scandinavian
    letters and digraph spellings onto å/æ/ø — ä->æ, ö->ø, aa/ao->å,
    ae->æ, oe/oo->ø (case-preserving) — so blåbærsyltetøj,
    blåbärsyltetöj and blaabaarsyltetoej meet at one term."""
    out = []
    i, n = 0, len(w)
    while i < n:
        ch = w[i]
        if ch in _SCAND_SE:
            out.append(_SCAND_SE[ch])
        elif i + 1 < n and ch in "aAoO":
            nxt = w[i + 1].lower()
            if ch in "aA" and nxt in "ao":
                out.append("å" if ch == "a" else "Å")
                i += 2
                continue
            if ch in "aA" and nxt == "e":
                out.append("æ" if ch == "a" else "Æ")
                i += 2
                continue
            if ch in "oO" and nxt in "eo":
                out.append("ø" if ch == "o" else "Ø")
                i += 2
                continue
            out.append(ch)
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def scandinavian_fold_token(w: str) -> str:
    """ScandinavianFoldingFilter (miscellaneous/
    ScandinavianFoldingFilter.java:38): the more aggressive variant —
    normalize as above, then flatten å/æ->a and ø->o (and their
    capitals), so raksmorgas matches räksmörgås."""
    w = scandinavian_normalize_token(w)
    return w.translate(_SCAND_FLAT)


_SCAND_FLAT = str.maketrans({"å": "a", "Å": "A", "æ": "a", "Æ": "A",
                             "ø": "o", "Ø": "O"})


def english_possessive_strip(word: str) -> str:
    """EnglishPossessiveFilter (en/EnglishPossessiveFilter.java:30):
    strip a trailing 's / ’s / ＇s possessive."""
    if (len(word) >= 2 and word[-2] in ("'", "’", "＇")
            and word[-1] in ("s", "S")):
        return word[:-2]
    return word


def english_minimal_stem(word: str) -> str:
    """Harman S-stemmer (en/EnglishMinimalStemmer.java:33 — Donna
    Harman, "How Effective Is Suffixing?", JASIS 42(1), 1991): minimal
    English plural removal ('ies'->'y', plain '-s' off, -ss/-us and
    vowel-e endings protected)."""
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    p = word[-2]
    if p in ("u", "s"):
        return word
    if p == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("i", "a", "o", "e"):
            return word
    return word[:-1]
