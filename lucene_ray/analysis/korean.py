"""Korean morphological segmentation — the nori KoreanTokenizer +
KoreanPartOfSpeechStopFilter roles (lucene/analysis/nori/src/java/org/
apache/lucene/analysis/ko/KoreanTokenizer.java:69,
ko/KoreanPartOfSpeechStopFilter.java:34).

The reference runs a Viterbi lattice over the mecab-ko-dic dictionary
and then drops functional parts of speech (josa particles, eomi verb
endings, …) with the default POS stop set. Korean is whitespace-
delimited between eojeol (word units), but each eojeol agglutinates
content morphemes with particles/endings — so this module runs the
lattice WITHIN each hangul run: edges are (a) seed-lexicon content
words, (b) josa/eomi suffix morphemes tagged with their POS, and
(c) same-run unknown chunks. After backtracking the minimum-cost path,
particle/ending tokens are discarded exactly like the reference's POS
stop filter. Unigram word costs only (no connection matrix) — the same
documented reduction as analysis/japanese.py; a real mecab-ko-dic could
drop in by replacing the seed tables.

Deterministic; the per-row and batch tokenizer paths share this one
implementation (nori is per-document in the reference too).
"""

from __future__ import annotations

_INF = float("inf")

# content-word seed lexicon (nouns, verb/adjective stems). Costs shrink
# with length so one dictionary word beats a split into unknowns.
_WORDS = """
한국 서울 부산 대구 인천 학교 대학 학생 선생님 회사 회사원 일
시간 오늘 내일 어제 올해 작년 매일 세계 나라 사람 친구 가족
기술 연구 개발 검색 엔진 언어 처리 분석 문서 색인 결과 질문
문제 정보 데이터 컴퓨터 기계 학습 계산 자동차 기차 비행기 지하철
날씨 신문 영화 음악 책 물 음식 요리 집 방 길 역 가게 시장 도시
이것 그것 저것 여기 거기 어디 누구 무엇 나 너 우리 그 그녀
하나 둘 셋 년 월 일 번 개 명 원
좋 크 작 높 낮 많 적 빠르 느리 새롭 오래되
하 되 가 오 보 먹 마시 읽 쓰 살 자 일하 생각하 말하 공부하
사 팔 만들 배우 가르치 듣 묻 대답하 찾 쓰이 사용하
"""

# josa (case particles / postpositions) — POS "J" in mecab-ko-dic terms
_JOSA = """
은 는 이 가 을 를 에 에서 로 으로 와 과 의 도 만 까지 부터
에게 한테 보다 처럼 께서 마다 조차 밖에 이나 나 랑 이랑 하고
에게서 으로서 로서 으로써 로써 이라도 라도
"""

# eomi / copula endings (verbal inflections) — POS "E"
_EOMI = """
합니다 습니다 입니다 었습니다 았습니다 했습니다 겠습니다 ㅂ니다
습니까 합니까 입니까 하세요 세요 어요 아요 에요 예요 해요
네요 지요 죠 고 서 면 으면 지만 는데 은데 면서 으니까 니까
다 는다 ㄴ다 었다 았다 했다 이다 였다 하는 하고 해서 하면 한
은 는 을 ㄹ 던 게 기 음 ㅁ
"""

_LEXICON: dict[str, int] = {}
for _w in _WORDS.split():
    _LEXICON[_w] = max(50, 350 - 60 * len(_w))

# suffix morphemes: (surface -> (cost, pos)). Particles/endings are cheap
# so "학교에서" prefers 학교+에서 over one unknown run, but cost more than
# a same-length dictionary word so real vocabulary wins ties.
_SUFFIX: dict[str, tuple[int, str]] = {}
for _w in _JOSA.split():
    _SUFFIX[_w] = (max(80, 250 - 50 * len(_w)), "J")
for _w in _EOMI.split():
    # an ending that is also a josa surface keeps the josa tag (both are
    # dropped by the POS stop set, so the tie is cosmetic)
    _SUFFIX.setdefault(_w, (max(90, 260 - 50 * len(_w)), "E"))

_BY_FIRST: dict[str, list] = {}
for _w, _c in _LEXICON.items():
    _BY_FIRST.setdefault(_w[0], []).append((_w, _c, "W"))
for _w, (_c, _p) in _SUFFIX.items():
    _BY_FIRST.setdefault(_w[0], []).append((_w, _c, _p))
for _lst in _BY_FIRST.values():
    _lst.sort(key=lambda wcp: -len(wcp[0]))

# the default POS stop set drops functional morphemes
# (KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS includes J*, E*)
_STOP_POS = frozenset({"J", "E"})

_UNK_RUN_COST = {"latin": 250, "digit": 250}
_UNK_HANGUL_CHAR = 700
_MAX_UNK_HANGUL = 4


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "hangul"
    if ch.isdigit():
        return "digit"
    if ch.isalpha():
        return "latin"
    if ch.isspace():
        return "space"
    return "other"


def ko_tokenize_with_offsets(text: str) -> "list[tuple[str, int, int]]":
    """Minimum-cost Viterbi segmentation; (surface, start, end) per
    SURVIVING token (josa/eomi morphemes are consumed by the lattice but
    discarded — the POS stop filter role). Whitespace/punctuation are
    zero-token edges."""
    n = len(text)
    if n == 0:
        return []
    best = [_INF] * (n + 1)
    best[0] = 0.0
    # back[i] = (prev_pos, surface_or_None, pos_tag)
    back: list = [None] * (n + 1)

    def relax(j: int, cost: float, i: int, tok, pos_tag: str):
        if cost < best[j]:
            best[j] = cost
            back[j] = (i, tok, pos_tag)

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
            relax(j, b, i, None, "")
            continue
        # dictionary + suffix-morpheme edges. A suffix (josa/eomi) at the
        # very START of an eojeol is implausible — charge it extra so an
        # eojeol-initial "은" prefers the unknown/lexicon reading.
        at_start = i == 0 or _char_class(text[i - 1]) != "hangul"
        for w, c, p in _BY_FIRST.get(ch, ()):
            if text.startswith(w, i):
                penalty = 400 if (p in _STOP_POS and at_start) else 0
                relax(i + len(w), b + c + penalty, i, w, p)
        # unknown same-class run edges
        j = i + 1
        while j < n and _char_class(text[j]) == cls:
            j += 1
        if cls in _UNK_RUN_COST:
            relax(j, b + _UNK_RUN_COST[cls], i, text[i:j], "W")
        else:  # hangul: short unknown chunks, per-char cost
            lim = min(j, i + _MAX_UNK_HANGUL)
            for k in range(i + 1, lim + 1):
                relax(k, b + _UNK_HANGUL_CHAR * (k - i) + 100, i,
                      text[i:k], "W")

    out = []
    pos = n
    while pos > 0:
        prev, tok, ptag = back[pos]
        if tok is not None and ptag not in _STOP_POS:
            out.append((tok, prev, pos))
        pos = prev
    out.reverse()
    return out


def ko_tokenize(text: str) -> "list[str]":
    return [t for t, _s, _e in ko_tokenize_with_offsets(text)]
