"""Dictionary-based compound word decomposition — the analysis/compound
module role (lucene/analysis/common/src/java/org/apache/lucene/analysis/
compound/DictionaryCompoundWordTokenFilter.java:40,
CompoundWordTokenFilterBase.java:36): German-style compounds
('donaudampfschiff') inject their dictionary subwords at the SAME
position as the original token, so a query for 'schiff' reaches the
compound. The subword scan mirrors the reference exactly: every start
offset tries subword lengths min..max against the dictionary, emitting
all matches or only the longest per start."""

from __future__ import annotations


def decompose(term: str, dictionary: frozenset, min_word: int = 5,
              min_sub: int = 2, max_sub: int = 15,
              only_longest: bool = False) -> list[str]:
    """Subwords of ``term`` found in ``dictionary``
    (DictionaryCompoundWordTokenFilter.decompose,
    DictionaryCompoundWordTokenFilter.java:75): tokens shorter than
    ``min_word`` pass untouched; per start offset, each in-dictionary
    subword of length [min_sub, max_sub] emits (or only the longest
    when ``only_longest``)."""
    n = len(term)
    if n < min_word:
        return []
    out: list[str] = []
    for i in range(0, n - min_sub + 1):
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            sub = term[i:i + j]
            if sub in dictionary:
                if only_longest:
                    longest = sub
                else:
                    out.append(sub)
        if longest is not None:
            out.append(longest)
    return out
