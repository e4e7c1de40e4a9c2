"""Japanese morphological segmentation — the kuromoji JapaneseTokenizer
role (lucene/analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/
JapaneseTokenizer.java:63).

The reference runs a Viterbi lattice over the MeCab/IPADIC dictionary
(word costs + connection costs) with per-character-class unknown-word
handling. This module is that architecture over a REDUCED built-in
lexicon (a unidic-lite-style seed of high-frequency particles, copulas,
verbs and nouns — no dictionary files ship in this environment) plus
class-based unknown words: a minimum-cost path through dictionary edges
and same-script-run unknown edges. Unigram word costs only (no
connection matrix) — the documented reduction; the lattice, longest-
match pressure and char-class unknown grouping match the reference's
shape, and a real IPADIC could drop in by replacing ``_LEXICON``.

Like every analysis stage here, segmentation is deterministic and the
per-row and batch tokenizer paths share this one implementation.
"""

from __future__ import annotations

_INF = float("inf")

# surface -> word cost. Dictionary edges get cheaper with length so the
# lattice prefers one dictionary word over a split into unknowns, and
# prefers longer dictionary matches over chains of shorter ones.
_WORDS = """
の は を に が と で も へ や から まで より ね よ か な
です ます でした ました だ である では ません ない
する します した して いる います いた ある あります あった
なる なります なった
この その あの どの これ それ あれ どれ ここ そこ どこ
私 彼 彼女 誰 何
日本 東京 大阪 京都 名古屋 会社 学校 大学 学生 先生 仕事
時間 今日 明日 昨日 今年 去年 毎日 世界 人 年 月 日 間 中
電車 飛行機 車 道 駅 店 家 部屋 水 食事 料理 天気 新聞
情報 検索 言語 処理 分析 文書 索引 結果 質問 答え 問題
技術 開発 研究 学習 機械 計算 数 字 本 声 音 楽 映画 音楽
行く 行き 行った 来る 来た 来ます 見る 見た 見ます
読む 読んだ 書く 書いた 食べる 食べた 飲む 飲んだ
住む 住んで 住ん 働く 働いて 思う 思った 言う 言った
使う 使った 作る 作った 買う 買った 売る 売った
新しい 古い 大きい 小さい 高い 安い 良い 悪い 早い 遅い
とても 少し もっと まだ もう すぐ よく
都 道 府 県 市 区 町 村 駅 語 者 的 性 化 書
"""

_LEXICON: dict[str, int] = {}
for _w in _WORDS.split():
    _LEXICON[_w] = max(50, 350 - 60 * len(_w))

# first-char index, longest candidates first
_BY_FIRST: dict[str, list] = {}
for _w, _c in _LEXICON.items():
    _BY_FIRST.setdefault(_w[0], []).append((_w, _c))
for _lst in _BY_FIRST.values():
    _lst.sort(key=lambda wc: -len(wc[0]))


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0x3040 <= o <= 0x309F:
        return "hira"
    if 0x30A0 <= o <= 0x30FF or o == 0xFF70 or 0xFF66 <= o <= 0xFF9D:
        return "kata"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return "kanji"
    if ch.isdigit():
        return "digit"
    if ch.isalpha():
        return "latin"
    if ch.isspace():
        return "space"
    return "other"


# unknown-word run costs: katakana/latin/digit runs are natural single
# tokens (loanwords, numbers); unknown kanji pays per char so dictionary
# splits win; stray hiragana falls out as single chars (particles and
# inflections come from the lexicon)
_UNK_RUN_COST = {"kata": 400, "latin": 250, "digit": 250, "other": 600}
_UNK_CHAR_COST = {"kanji": 700, "hira": 900}
_MAX_UNK_KANJI = 3


def ja_tokenize_with_offsets(text: str) -> "list[tuple[str, int, int]]":
    """Minimum-cost Viterbi segmentation; (surface, start, end) per
    token. Whitespace and 'other' punctuation are consumed as zero-token
    edges (the tokenizer's discard behavior)."""
    n = len(text)
    if n == 0:
        return []
    best = [_INF] * (n + 1)
    best[0] = 0.0
    # back[i] = (prev_pos, surface_or_None)
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
            # consume punctuation/space without emitting
            j = i + 1
            while j < n and _char_class(text[j]) in ("space", "other"):
                j += 1
            relax(j, b, i, None)
            continue
        # dictionary edges
        for w, c in _BY_FIRST.get(ch, ()):
            if text.startswith(w, i):
                relax(i + len(w), b + c, i, w)
        # unknown same-class run edges
        j = i + 1
        while j < n and _char_class(text[j]) == cls:
            j += 1
        if cls in _UNK_RUN_COST:
            relax(j, b + _UNK_RUN_COST[cls], i, text[i:j])
        else:  # kanji / hiragana: per-char and short-run unknowns
            per = _UNK_CHAR_COST[cls]
            lim = min(j, i + (_MAX_UNK_KANJI if cls == "kanji" else 1))
            for k in range(i + 1, lim + 1):
                relax(k, b + per * (k - i) + 100, i, text[i:k])

    # backtrack
    out = []
    pos = n
    while pos > 0:
        prev, tok = back[pos]
        if tok is not None:
            out.append((tok, prev, pos))
        pos = prev
    out.reverse()
    return out


def ja_tokenize(text: str) -> "list[str]":
    return [t for t, _s, _e in ja_tokenize_with_offsets(text)]
