"""Hunspell dictionary stemming — the analysis/hunspell role
(lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Hunspell.java, Dictionary.java:105 .aff/.dic parsing,
Stemmer.java:63 affix stripping, HunspellStemFilter.java:43 the token
filter): morphology driven by USER-PROVIDED ``.aff`` rules and ``.dic``
word lists, the production stemming path for many languages.

Fresh implementation of the published Hunspell format subset the
reference's Stemmer exercises for stemming:

* ``.dic``: ``word[/flags]`` entries (first line = count, skipped).
* ``.aff``: ``FLAG`` modes (single UTF-8 char, ``long`` 2-char,
  ``num`` comma-separated), ``PFX``/``SFX`` rule groups
  (``strip``/``affix``/``condition`` with bracket classes), and the
  cross-product bit letting a prefix and suffix strip together.

Stemming mirrors Stemmer.java's order: dictionary hit first, then
suffix rules (condition re-checked against the RECONSTRUCTED base, flag
must be on the base entry), then TWO-LEVEL suffixes via continuation
classes (``affix/Flags`` entries — base+s1+s2 analyses where s1's rule
licenses s2), then prefix rules, then prefix+suffix when both rules
allow cross-product. Documented subset: no compounding (COMPOUNDRULE),
no REP/ICONV suggestion tables — those serve spell-suggesting, not the
stem filter.

The dictionary object is heavy; analyzers reference it by FILE PATHS
(JSON-serializable, manifest round-trip) and workers load + cache one
instance per process (:func:`load_cached`) — the actor-pool pattern:
parse once per worker, not once per batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class _Affix:
    flag: str
    strip: str
    affix: str
    cond: "re.Pattern[str] | None"  # anchored at the stripped base
    cross: bool
    cont: frozenset = frozenset()  # continuation classes (affix/Flags)


class HunspellDictionary:
    """Parsed .aff rules + .dic entries; ``stem`` returns all analyses,
    ``stem_one`` the deterministic first (shortest stem, ties lexical —
    a stable pick where the reference returns an unordered list)."""

    def __init__(self) -> None:
        self.words: dict[str, frozenset] = {}
        self.prefixes: list[_Affix] = []
        self.suffixes: list[_Affix] = []
        self.flag_mode = "char"

    # -- parsing -----------------------------------------------------------

    @classmethod
    def load(cls, aff_path: str, dic_path: str) -> "HunspellDictionary":
        with open(aff_path, encoding="utf-8", errors="replace") as f:
            aff = f.read()
        with open(dic_path, encoding="utf-8", errors="replace") as f:
            dic = f.read()
        return cls.parse(aff, dic)

    @classmethod
    def parse(cls, aff: str, dic: str) -> "HunspellDictionary":
        d = cls()
        lines = aff.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "FLAG" and len(parts) >= 2:
                d.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "char")
            elif parts[0] in ("PFX", "SFX") and len(parts) >= 4 \
                    and parts[2] in ("Y", "N"):
                kind, flag, cross = parts[0], parts[1], parts[2] == "Y"
                try:
                    count = int(parts[3])
                except ValueError:
                    continue
                for _ in range(count):
                    if i >= len(lines):
                        break
                    ep = lines[i].split()
                    i += 1
                    if len(ep) < 4 or ep[0] != kind or ep[1] != flag:
                        continue
                    strip = "" if ep[2] == "0" else ep[2]
                    aff_raw, _, contflags = ep[3].partition("/")
                    affix = "" if aff_raw == "0" else aff_raw
                    cond = None if len(ep) < 5 or ep[4] == "." \
                        else _compile_condition(ep[4], kind)
                    a = _Affix(flag, strip, affix, cond, cross,
                               frozenset(d._parse_flags(contflags)))
                    (d.suffixes if kind == "SFX" else d.prefixes).append(a)
        first = True
        for line in dic.splitlines():
            line = line.strip()
            if first:
                first = False
                if line.isdigit():
                    continue  # the count header
            if not line or line.startswith("#"):
                continue
            word, _, flags = line.partition("/")
            word = word.strip()
            if word:
                d.words[word] = frozenset(d._parse_flags(flags))
        return d

    def _parse_flags(self, flags: str) -> list:
        flags = flags.strip()
        if not flags:
            return []
        if self.flag_mode == "num":
            return [f for f in flags.split(",") if f]
        if self.flag_mode == "long":
            return [flags[j:j + 2] for j in range(0, len(flags) - 1, 2)]
        return list(flags)

    # -- stemming ----------------------------------------------------------

    def _entry_flags(self, base: str) -> "frozenset | None":
        got = self.words.get(base)
        if got is not None:
            return got
        lo = base.lower()
        return self.words.get(lo) if lo != base else None

    def stem(self, word: str) -> list[str]:
        """Every dictionary analysis of ``word`` (Stemmer.java:63
        uniqueStems order: exact hit, suffix strips, prefix strips,
        cross-product prefix+suffix)."""
        out: list[str] = []
        if self._entry_flags(word) is not None:
            out.append(word)
        for base in self._suffix_bases(word, require=None):
            if base not in out:
                out.append(base)
        # two-level suffixes (continuation classes): word = base+s1+s2
        # where s2's rule B attached to the form rule A produced, and A
        # carries B among its continuation flags (`affix/Flags` in the
        # .aff entry — Dictionary.java's affix condition chain)
        for b_rule in self.suffixes:
            if b_rule.affix and not word.endswith(b_rule.affix):
                continue
            mid = word[: len(word) - len(b_rule.affix)] + b_rule.strip
            if not mid or (b_rule.cond is not None
                           and not b_rule.cond.search(mid)):
                continue
            for a_rule in self.suffixes:
                if b_rule.flag not in a_rule.cont:
                    continue
                if a_rule.affix and not mid.endswith(a_rule.affix):
                    continue
                base = mid[: len(mid) - len(a_rule.affix)] + a_rule.strip
                if not base or (a_rule.cond is not None
                                and not a_rule.cond.search(base)):
                    continue
                fl = self._entry_flags(base)
                if fl is not None and a_rule.flag in fl and base not in out:
                    out.append(base)
        for pbase, paff in self._prefix_bases(word):
            fl = self._entry_flags(pbase)
            if fl is not None and paff.flag in fl and pbase not in out:
                out.append(pbase)
            if paff.cross:
                for base in self._suffix_bases(pbase, require="cross"):
                    if base not in out:
                        out.append(base)
        return out

    def _suffix_bases(self, word: str, require: "str | None") -> list:
        found = []
        for a in self.suffixes:
            if require == "cross" and not a.cross:
                continue
            if a.affix and not word.endswith(a.affix):
                continue
            base = word[: len(word) - len(a.affix)] + a.strip
            if not base:
                continue
            if a.cond is not None and not a.cond.search(base):
                continue
            fl = self._entry_flags(base)
            if fl is not None and a.flag in fl:
                found.append(base)
        return found

    def _prefix_bases(self, word: str) -> list:
        found = []
        for a in self.prefixes:
            if a.affix and not word.startswith(a.affix):
                continue
            base = a.strip + word[len(a.affix):]
            if not base:
                continue
            if a.cond is not None and not a.cond.search(base):
                continue
            found.append((base, a))
        return found

    def stem_one(self, word: str) -> str:
        """The token filter's single-output mode (HunspellStemFilter's
        longestOnly inverted: SHORTEST stem, ties lexicographic) — a
        deterministic pick so index and query sides agree; the word
        itself when no analysis exists."""
        stems = self.stem(word)
        if not stems:
            return word
        return min(stems, key=lambda s: (len(s), s))


def _compile_condition(cond: str, kind: str) -> "re.Pattern[str] | None":
    """A Hunspell condition is a char-class sequence checked against the
    affix-adjacent end of the base: anchored at the END for SFX, the
    START for PFX (AffixCondition.java:38)."""
    try:
        pat = cond.replace("-", "\\-") if "[" not in cond else cond
        return re.compile(pat + "$" if kind == "SFX" else "^" + pat)
    except re.error:
        return None


_CACHE: dict = {}


def load_cached(aff_path: str, dic_path: str) -> HunspellDictionary:
    """One parsed dictionary per (aff, dic) per process — the stateful
    actor-pool pattern (setup once per worker, not per batch)."""
    key = (aff_path, dic_path)
    d = _CACHE.get(key)
    if d is None:
        d = HunspellDictionary.load(aff_path, dic_path)
        _CACHE[key] = d
    return d
