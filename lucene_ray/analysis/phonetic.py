"""Phonetic encoders — the analysis/phonetic module role
(lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java:33, which wraps commons-codec encoders): tokens map
to sound-alike codes so 'smith' and 'smyth' meet at the same term.

Fresh implementations of two public, exactly-specified encoders:

* :func:`soundex` — the classic American Soundex (Russell/Odell, the
  algorithm printed in Knuth TAOCP vol. 3 §6 and implemented by
  commons-codec ``Soundex``): first letter + 3 digits, adjacent same
  codes collapse, H/W are transparent between consonants, vowels reset.
* :func:`nysiis` — the New York State Identification and Intelligence
  System code (Taft 1970; commons-codec ``Nysiis``): head/tail
  rewrites, then the iterative body rules, trailing S/A drops, AY→Y.

Like the reference's ``inject`` option, pair ``Analyzer(phonetic=...)``
with ``keyword_repeat=True`` to index BOTH the surface token and its
code at the same position (PhoneticFilter inject=true), or leave
``keyword_repeat`` off to replace tokens with codes (inject=false).
Both run vocabulary-mapped through ``transform_token`` — per-token
Python never touches the per-occurrence hot path."""

from __future__ import annotations

_SOUNDEX_CODE = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(word: str) -> str:
    """Classic Soundex: LETTER + 3 digits (zero-padded). Non-alpha input
    passes through unchanged (codes would collide meaninglessly)."""
    w = [ch for ch in word.lower() if "a" <= ch <= "z"]
    if len(w) != len(word):
        return word
    if not w:
        return word
    out = [w[0].upper()]
    prev = _SOUNDEX_CODE.get(w[0], "")
    for ch in w[1:]:
        code = _SOUNDEX_CODE.get(ch, "")
        if code:
            if code != prev:
                out.append(code)
                if len(out) == 4:
                    break
            prev = code
        elif ch in "hw":
            # H and W are transparent: the previous consonant code
            # still blocks an equal code on the far side
            continue
        else:
            prev = ""  # vowel: resets the adjacency collapse
    return "".join(out).ljust(4, "0")


def nysiis(word: str) -> str:
    """NYSIIS code (Taft 1970); non-alpha input passes through."""
    w = "".join(ch for ch in word.lower() if "a" <= ch <= "z")
    if len(w) != len(word) or not w:
        return word
    # head rewrites
    for src, dst in (("mac", "mcc"), ("kn", "nn"), ("k", "c"),
                     ("ph", "ff"), ("pf", "ff"), ("sch", "sss")):
        if w.startswith(src):
            w = dst + w[len(src):]
            break
    # tail rewrites
    for src, dst in (("ee", "y"), ("ie", "y"), ("dt", "d"), ("rt", "d"),
                     ("rd", "d"), ("nt", "d"), ("nd", "d")):
        if w.endswith(src):
            w = w[: -len(src)] + dst
            break
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        ch = w[i]
        rep = ch
        if w[i:i + 2] == "ev":
            rep, skip = "af", 2
        elif ch in "aeiou":
            rep, skip = "a", 1
        elif ch == "q":
            rep, skip = "g", 1
        elif ch == "z":
            rep, skip = "s", 1
        elif ch == "m":
            rep, skip = "n", 1
        elif w[i:i + 2] == "kn":
            rep, skip = "n", 2
        elif ch == "k":
            rep, skip = "c", 1
        elif w[i:i + 3] == "sch":
            rep, skip = "sss", 3
        elif w[i:i + 2] == "ph":
            rep, skip = "ff", 2
        elif ch == "h" and (w[i - 1] not in "aeiou"
                            or (i + 1 < n and w[i + 1] not in "aeiou")):
            # replace with the TRANSFORMED previous letter — it then
            # collapses into it (commons-codec Nysiis behavior)
            rep, skip = key[-1], 1
        elif ch == "w" and w[i - 1] in "aeiou":
            rep, skip = key[-1], 1
        else:
            skip = 1
        for c in rep:
            if c != key[-1]:
                key.append(c)
        i += skip
    out = "".join(key)
    if out.endswith("s") and len(out) > 1:
        out = out[:-1]
    if out.endswith("ay"):
        out = out[:-2] + "y"
    if out.endswith("a") and len(out) > 1:
        out = out[:-1]
    return out.upper()


ENCODERS = {"soundex": soundex, "nysiis": nysiis}


def encode(term: str, encoder: str) -> str:
    fn = ENCODERS.get(encoder)
    if fn is None:
        raise ValueError(f"unknown phonetic encoder {encoder!r} "
                         f"(have {sorted(ENCODERS)})")
    return fn(term)
