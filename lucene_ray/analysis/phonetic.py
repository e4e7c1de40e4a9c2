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


# ---------------------------------------------------------------------------
# Round-5 additions: three more commons-codec encoder roles behind
# PhoneticFilter (PhoneticFilter.java:33) — Metaphone (Lawrence Philips,
# Computer Language 7(12), 1990), Refined Soundex, and Caverphone 2.0
# (David Hood, U. of Otago CS technical report, 2004). All fresh
# implementations of the published algorithms, validated against the
# published/commons-codec test vectors in tests/test_analysis.py.

_VOWELS = frozenset("aeiou")


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Metaphone (Philips 1990; the commons-codec ``Metaphone`` rules,
    default code length 4). Non-alpha input passes through."""
    w = word.lower()
    if not w or not all("a" <= c <= "z" for c in w):
        return word
    # initial-pair exceptions
    if len(w) > 1:
        if w[:2] in ("ae", "gn", "kn", "pn", "wr"):
            w = w[1:]
        elif w[0] == "x":
            w = "s" + w[1:]
        elif w[:2] == "wh":
            w = "w" + w[1:]
    n = len(w)
    out: list[str] = []

    def nxt(i: int, k: int = 1) -> str:
        return w[i + k] if i + k < n else ""

    def prv(i: int, k: int = 1) -> str:
        return w[i - k] if i - k >= 0 else ""

    i = 0
    while i < n and len(out) < max_code_len:
        c = w[i]
        # duplicate letters skip (except C)
        if c != "c" and c == prv(i):
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prv(i) == "m"):
                out.append("B")
        elif c == "c":
            if nxt(i) == "i" and nxt(i, 2) == "a":          # -cia-
                out.append("X")
            elif nxt(i) == "h":
                # -sch- hard K; else CH -> X
                out.append("K" if prv(i) == "s" else "X")
            elif nxt(i) in ("i", "e", "y"):
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt(i) == "g" and nxt(i, 2) in ("e", "y", "i"):
                out.append("J")
                i += 1  # consume the G of DGE/DGY/DGI
            else:
                out.append("T")
        elif c == "g":
            if nxt(i) == "h":
                if i + 2 >= n or nxt(i, 2) not in _VOWELS:
                    pass  # silent GH (night, tough, bought)
                else:
                    out.append("K")
            elif nxt(i) == "n":
                # silent in GN / GNED endings
                if i + 2 == n or (w.endswith("gned") and i == n - 4):
                    pass
                else:
                    out.append("K")
            elif nxt(i) in ("i", "e", "y"):
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prv(i) in _VOWELS and nxt(i) not in _VOWELS:
                pass  # silent after vowel with no vowel following
            elif prv(i) in ("c", "s", "p", "t", "g"):
                pass  # part of a digraph already handled
            else:
                out.append("H")
        elif c == "k":
            if prv(i) != "c":
                out.append("K")
        elif c == "p":
            out.append("F" if nxt(i) == "h" else "P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt(i) == "h":
                out.append("X")
            elif nxt(i) == "i" and nxt(i, 2) in ("o", "a"):
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt(i) == "i" and nxt(i, 2) in ("o", "a"):
                out.append("X")
            elif nxt(i) == "h":
                out.append("0")  # theta
                i += 1
            elif nxt(i) == "c" and nxt(i, 2) == "h":
                pass  # silent in -TCH
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt(i) in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("K")
            if len(out) < max_code_len:
                out.append("S")
        elif c == "y":
            if nxt(i) in _VOWELS:
                out.append("Y")
        elif c == "z":
            out.append("S")
        else:  # f, j, l, m, n, r
            out.append(c.upper())
        i += 1
    return "".join(out)


_REFINED_CODE = dict(zip("abcdefghijklmnopqrstuvwxyz",
                         "01360240043788015936020505"))


def refined_soundex(word: str) -> str:
    """Refined Soundex (the commons-codec ``RefinedSoundex`` mapping):
    first letter + the code of EVERY letter (vowel groups keep their
    '0'), adjacent equal codes collapse, no length cap."""
    w = word.lower()
    if not w or not all("a" <= c <= "z" for c in w):
        return word
    out = [w[0].upper()]
    last = ""
    for ch in w:
        code = _REFINED_CODE[ch]
        if code == last:
            continue
        out.append(code)
        last = code
    return "".join(out)


_CAVER_GROUPS = "stpkfmn"


def caverphone2(word: str) -> str:
    """Caverphone 2.0 (Hood 2004, the revised spec): 10-character code
    padded with '1'. Non-alpha input passes through."""
    import re as _re

    w = word.lower()
    if not w or not all("a" <= c <= "z" for c in w):
        return word
    if w.endswith("e"):
        w = w[:-1]
    for pre, rep in (("cough", "cou2f"), ("rough", "rou2f"),
                     ("tough", "tou2f"), ("enough", "enou2f"),
                     ("trough", "trou2f"), ("gn", "2n")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    if w.endswith("mb"):
        w = w[:-2] + "m2"
    for pat, rep in (("cq", "2q"), ("ci", "si"), ("ce", "se"),
                     ("cy", "sy"), ("tch", "2ch"), ("c", "k"),
                     ("q", "k"), ("x", "k"), ("v", "f"), ("dg", "2g"),
                     ("tio", "sio"), ("tia", "sia"), ("d", "t"),
                     ("ph", "fh"), ("b", "p"), ("sh", "s2h"),
                     ("z", "s")):
        w = w.replace(pat, rep)
    w = _re.sub(r"^[aeiou]", "A", w)
    w = _re.sub(r"[aeiou]", "3", w)
    w = w.replace("j", "y")
    if w.startswith("y3"):
        w = "Y3" + w[2:]
    elif w.startswith("y"):
        w = "A" + w[1:]
    w = w.replace("y", "3")
    w = w.replace("3gh3", "3kh3")
    w = w.replace("gh", "22")
    w = w.replace("g", "k")
    for ch in _CAVER_GROUPS:
        w = _re.sub(ch + "+", ch.upper(), w)
    w = w.replace("w3", "W3").replace("wh3", "Wh3")
    if w.endswith("w"):
        w = w[:-1] + "3"
    w = w.replace("w", "2")
    if w.startswith("h"):
        w = "A" + w[1:]
    w = w.replace("h", "2")
    w = w.replace("r3", "R3")
    if w.endswith("r"):
        w = w[:-1] + "3"
    w = w.replace("r", "2")
    w = w.replace("l3", "L3")
    if w.endswith("l"):
        w = w[:-1] + "3"
    w = w.replace("l", "2")
    w = w.replace("2", "")
    if w.endswith("3"):
        w = w[:-1] + "A"
    w = w.replace("3", "")
    return (w + "1" * 10)[:10]


ENCODERS.update({"metaphone": metaphone,
                 "refined_soundex": refined_soundex,
                 "caverphone2": caverphone2})
