"""Chinese word segmentation — the smartcn HMMChineseTokenizer role
(lucene/analysis/smartcn/src/java/org/apache/lucene/analysis/cn/smart/
HMMChineseTokenizer.java:33, cn/smart/hhmm/HHMMSegmenter.java:39).

The reference segments Han runs with a hidden-Markov bigram model over
its bundled core dictionary. This module is the same shape — a
minimum-cost lattice over a REDUCED seed lexicon of high-frequency
words with per-character unknown fallback (unigram word costs only, no
bigram transition matrix: the documented reduction, as in
analysis/japanese.py). Longer dictionary matches cost less, so
"中文处理" splits 中文+处理 rather than four unigrams, while genuinely
unknown Han text falls out per character (exactly the reference's OOV
behavior — smartcn emits single Hanzi for unseen words). Latin/digit
runs pass through whole, matching the reference's SentenceTokenizer +
word-type handling.

Deterministic; per-row and batch tokenizer paths share this one
implementation. A real core dictionary could drop in by replacing
``_WORDS``.
"""

from __future__ import annotations

_INF = float("inf")

# high-frequency multi-char words; cost shrinks with length so the
# lattice prefers the longest dictionary cover
_WORDS = """
中国 北京 上海 广州 深圳 我们 你们 他们 她们 自己 什么 怎么
没有 知道 现在 时候 可以 因为 所以 但是 如果 已经 还是 就是
学校 学生 老师 大学 工作 时间 今天 明天 昨天 今年 去年 每天
世界 国家 公司 企业 政府 城市 地方 问题 结果 信息 数据 系统
技术 科学 研究 开发 搜索 引擎 语言 处理 分析 文档 索引 查询
计算 计算机 机器 学习 电脑 网络 软件 程序 算法 模型 文本
汽车 火车 飞机 地铁 天气 新闻 电影 音乐 朋友 家庭 孩子 父母
中文 英文 日文 文件 内容 方法 方式 使用 需要 提供 进行 发展
经济 市场 产品 服务 管理 设计 建设 生产 生活 文化 历史 教育
"""

_LEXICON: dict[str, int] = {}
for _w in _WORDS.split():
    _LEXICON[_w] = max(50, 350 - 60 * len(_w))

_BY_FIRST: dict[str, list] = {}
for _w, _c in _LEXICON.items():
    _BY_FIRST.setdefault(_w[0], []).append((_w, _c))
for _lst in _BY_FIRST.values():
    _lst.sort(key=lambda wc: -len(wc[0]))


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return "han"
    if ch.isdigit():
        return "digit"
    if ch.isalpha():
        return "latin"
    if ch.isspace():
        return "space"
    return "other"


_UNK_RUN_COST = {"latin": 250, "digit": 250}
_UNK_HAN_CHAR = 700


def zh_tokenize_with_offsets(text: str) -> "list[tuple[str, int, int]]":
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
        if cls == "han":
            for w, c in _BY_FIRST.get(ch, ()):
                if text.startswith(w, i):
                    relax(i + len(w), b + c, i, w)
            # unknown Hanzi: single character (smartcn OOV behavior)
            relax(i + 1, b + _UNK_HAN_CHAR, i, ch)
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


def zh_tokenize(text: str) -> "list[str]":
    return [t for t, _s, _e in zh_tokenize_with_offsets(text)]
