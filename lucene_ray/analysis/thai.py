"""Thai word segmentation — the ThaiTokenizer role
(lucene/analysis/common/src/java/org/apache/lucene/analysis/th/
ThaiTokenizer.java:38) and the ICU tokenizer's dictionary-based
word-break for Southeast-Asian scripts (lucene/analysis/icu/src/java/
org/apache/lucene/analysis/icu/segmentation/ICUTokenizer.java:48).

The reference delegates Thai (no inter-word spaces) to a
dictionary-driven BreakIterator. This module is the same shape as the
house CJK segmenters (analysis/chinese.py precedent): a minimum-cost
lattice over a REDUCED seed lexicon of high-frequency Thai words,
longer matches cheaper, with a per-cluster unknown fallback — the
documented lexicon reduction. Unknown Thai text falls out as ORTHOGRAPHIC
SYLLABLE CLUSTERS (a base consonant plus its dependent vowels/tone
marks), not raw code points, so combining marks never strand: the same
grapheme-anchored behavior the ICU break iterator guarantees. Latin and
digit runs pass through whole.

A real dictionary drops in by replacing ``_WORDS``. Deterministic;
per-row and batch tokenizer paths share this one implementation.
Fresh implementation — no reference code.
"""

from __future__ import annotations

_INF = float("inf")

# high-frequency Thai words; cost shrinks with length so the lattice
# prefers the longest dictionary cover
_WORDS = """
ประเทศ ไทย กรุงเทพ ภาษา คน เรา
การ ความ ที่ ของ และ ใน เป็น มี ให้ ได้ ว่า จะ ไม่ กับ แต่
นี้ นั้น อยู่ ไป มา ทำ ดี ใหม่ ใหญ่ เล็ก วัน เวลา ปี เดือน
น้ำ ใจ บ้าน เมือง โรงเรียน นักเรียน ครู หนังสือ อ่าน เขียน
เรียน รู้ คิด พูด ฟัง เห็น กิน นอน เดิน รถ รถไฟ เครื่องบิน
ตลาด อาหาร ข้าว ผลไม้ ทะเล ภูเขา แม่น้ำ ฝน ร้อน หนาว
พ่อ แม่ ลูก พี่ น้อง เพื่อน รัก งาน เงิน ราคา ซื้อ ขาย
ค้นหา ข้อมูล ระบบ คอมพิวเตอร์ เทคโนโลยี วิทยาศาสตร์
"""

_LEXICON: dict[str, int] = {}
for _w in _WORDS.split():
    if any("฀" <= c <= "๿" for c in _w):
        _LEXICON[_w] = max(50, 350 - 40 * len(_w))

_BY_FIRST: dict[str, list] = {}
for _w, _c in _LEXICON.items():
    _BY_FIRST.setdefault(_w[0], []).append((_w, _c))
for _lst in _BY_FIRST.values():
    _lst.sort(key=lambda wc: -len(wc[0]))

# dependent (combining / non-cluster-initial) Thai signs: above/below
# vowels, tone marks, and the post-consonant vowels that cannot start a
# syllable cluster
_TH_DEPENDENT = set(
    "ั"            # mai han-akat
    "ำ"            # sara am (spacing but never cluster-initial)
    "ิีึืฺุู"  # above/below vowels
    "ๅ"            # lakkhangyao
    "็่้๊๋์ํ๎"  # tone/signs
)
# pre-posed vowels (เ แ โ ใ ไ) attach to the FOLLOWING consonant cluster
_TH_PREPOSED = set("เแโใไ")


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0x0E00 <= o <= 0x0E7F:
        return "thai"
    if ch.isdigit():
        return "digit"
    if ch.isalpha():
        return "latin"
    if ch.isspace():
        return "space"
    return "other"


def _cluster_end(text: str, i: int) -> int:
    """End index of the orthographic syllable cluster starting at i:
    optional pre-posed vowels, one base char, trailing dependents."""
    n = len(text)
    j = i
    while j < n and text[j] in _TH_PREPOSED:
        j += 1
    if j < n and _char_class(text[j]) == "thai":
        j += 1
    while j < n and text[j] in _TH_DEPENDENT:
        j += 1
    return max(j, i + 1)


_UNK_RUN_COST = {"latin": 250, "digit": 250}
_UNK_CLUSTER = 700


def th_tokenize_with_offsets(text: str) -> "list[tuple[str, int, int]]":
    """Minimum-cost segmentation; (surface, start, end) per token.
    Whitespace and punctuation are consumed as zero-token edges."""
    n = len(text)
    if n == 0:
        return []
    best = [_INF] * (n + 1)
    best[0] = 0.0
    back: list = [None] * (n + 1)

    def relax(j: int, cost: float, i: int, tok):
        if cost < best[j]:
            best[j] = cost
            back[j] = (i, tok)

    for i in range(n):
        b = best[i]
        if b == _INF:
            continue
        ch = text[i]
        cls = _char_class(ch)
        if cls in ("space", "other"):
            j = i + 1
            while j < n and _char_class(text[j]) in ("space", "other"):
                j += 1
            relax(j, b, i, None)
            continue
        if cls == "thai":
            for w, c in _BY_FIRST.get(ch, ()):
                if text.startswith(w, i):
                    relax(i + len(w), b + c, i, w)
            # unknown Thai: one orthographic cluster (combining signs
            # never strand — the ICU grapheme-anchored guarantee)
            j = _cluster_end(text, i)
            relax(j, b + _UNK_CLUSTER, i, text[i:j])
        else:
            j = i + 1
            while j < n and _char_class(text[j]) == cls:
                j += 1
            relax(j, b + _UNK_RUN_COST[cls], i, text[i:j])

    out = []
    pos = n
    while pos > 0:
        prev, tok = back[pos]
        if tok is not None:
            out.append((tok, prev, pos))
        pos = prev
    out.reverse()
    return out


def th_tokenize(text: str) -> "list[str]":
    return [t for t, _s, _e in th_tokenize_with_offsets(text)]
