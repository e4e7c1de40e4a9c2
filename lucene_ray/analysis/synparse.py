"""Synonym-file parsers — the SolrSynonymParser and WordnetSynonymParser
roles (analysis/common/src/java/org/apache/lucene/analysis/synonym/
SolrSynonymParser.java:33, WordnetSynonymParser.java:30): turn the two
standard synonym file formats into the Analyzer's ``synonyms`` tuple
(``((source, (targets...)), ...)``, analyzers.py).

Solr format:
* ``a, b, c`` — an equivalence class. With ``expand=True`` (the
  reference default) every member maps to every OTHER member; with
  ``expand=False`` every member maps to the first.
* ``a, b => c, d`` — an explicit mapping: each left-hand term maps to
  every right-hand term.
* ``#`` starts a comment; blank lines skip; ``\\,`` ``\\=>`` and
  ``\\ `` escape the separators inside a term.

WordNet prolog format: ``s(<synset>,<ord>,'<word>',<pos>,...).`` lines;
every synset is an equivalence class (expand semantics).

Multi-word sources/targets keep their spaces — the analyzer's
multi-word rule machinery handles them (SynonymGraphFilter.java:78
posLength flattening). Output is sorted and deduplicated so the parsed
tuple is deterministic and manifest-stable.
"""

from __future__ import annotations


def _split_unescaped(s: str, sep: str) -> list:
    """Split on unescaped ``sep``, KEEPING escape sequences intact so a
    later split level can still see them; _unescape strips them last."""
    out, cur, i = [], [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            cur.append(s[i:i + 2])
            i += 2
            continue
        if s.startswith(sep, i):
            out.append("".join(cur))
            cur = []
            i += len(sep)
            continue
        cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _rules_to_tuple(rules: dict) -> tuple:
    return tuple(sorted(
        (src, tuple(sorted(tgts))) for src, tgts in rules.items() if tgts))


def parse_solr_synonyms(text: str, expand: bool = True) -> tuple:
    """SolrSynonymParser.java:33 ``parse`` — returns the Analyzer
    ``synonyms`` tuple."""
    rules: dict = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line.replace("\\=>", "\x00"):
            lhs_s, rhs_s = _split_unescaped(line, "=>")[:2]
            lhs = [_unescape(t).strip()
                   for t in _split_unescaped(lhs_s, ",")]
            rhs = [_unescape(t).strip()
                   for t in _split_unescaped(rhs_s, ",")]
            for src in lhs:
                if src:
                    rules.setdefault(src, set()).update(
                        t for t in rhs if t)
        else:
            cls = [_unescape(t).strip()
                   for t in _split_unescaped(line, ",")]
            cls = [t for t in cls if t]
            if len(cls) < 2:
                continue
            if expand:
                for src in cls:
                    rules.setdefault(src, set()).update(
                        t for t in cls if t != src)
            else:
                head = cls[0]
                for src in cls[1:]:
                    rules.setdefault(src, set()).add(head)
    return _rules_to_tuple(rules)


def parse_wordnet_synonyms(text: str) -> tuple:
    """WordnetSynonymParser.java:30 — ``s(synset,ord,'word',...)`` prolog
    lines; each synset expands as an equivalence class. Single quotes
    inside words escape by doubling (''), like the reference."""
    synsets: dict = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line.startswith("s("):
            continue
        body = line[2:line.rindex(")")]
        # synset id = first field; word = the first quoted field
        first = body.split(",", 2)
        if len(first) < 3:
            continue
        sid = first[0].strip()
        rest = first[2]
        q0 = rest.index("'")
        i, word = q0 + 1, []
        while i < len(rest):
            if rest[i] == "'":
                if i + 1 < len(rest) and rest[i + 1] == "'":
                    word.append("'")
                    i += 2
                    continue
                break
            word.append(rest[i])
            i += 1
        w = "".join(word).replace("_", " ")
        if w:
            synsets.setdefault(sid, []).append(w)
    rules: dict = {}
    for members in synsets.values():
        uniq = sorted(set(members))
        if len(uniq) < 2:
            continue
        for src in uniq:
            rules.setdefault(src, set()).update(
                t for t in uniq if t != src)
    return _rules_to_tuple(rules)
