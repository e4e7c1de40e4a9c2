"""String similarity for spell ranking — the JaroWinklerDistance role
(lucene/suggest/src/java/org/apache/lucene/search/spell/
JaroWinklerDistance.java:32). Semantics pinned to DuckDB's
``jaro_winkler_similarity`` (the house oracle): scaling p = 0.1, prefix
capped at 4, the Winkler bonus only above the 0.7 boost threshold, and
0.0 when either string is empty — verified pairwise against DuckDB over
randomized inputs in tests."""

from __future__ import annotations


def jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4,
                 boost_threshold: float = 0.7) -> float:
    """Winkler prefix bonus over :func:`jaro`, applied only above the
    boost threshold (JaroWinklerDistance.java:32 keeps the same 0.7
    gate; DuckDB's jaro_winkler_similarity matches bit-for-bit)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    length = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        length += 1
    return j + length * p * (1 - j)


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    """N-gram similarity (Kondrak, "N-gram similarity and distance",
    SPIRE 2005) — the NGramDistance role
    (suggest/spell/NGramDistance.java:43): an edit-distance DP over
    n-gram windows with a null-prefix of n-1 so edge characters weigh
    like middle ones, null-prefix matches discounted. Returns a
    similarity in [0, 1] (1 = identical)."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        same = sum(1 for a, b in zip(source, target) if a == b)
        return same / max(sl, tl)
    padded = "\0" * (n - 1) + source
    prev = list(range(sl + 1))
    for j in range(1, tl + 1):
        gram = ("\0" * (n - j) + target[:j]) if j < n \
            else target[j - n:j]
        cur = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            window = padded[i - 1:i - 1 + n]
            cost = 0
            denom = n
            for a, b in zip(window, gram):
                if a != b:
                    cost += 1
                elif a == "\0":
                    denom -= 1  # discount null-prefix matches
            ec = cost / denom
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + ec)
        prev = cur
    return 1.0 - prev[sl] / max(sl, tl)
