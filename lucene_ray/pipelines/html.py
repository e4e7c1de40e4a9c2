"""HTML -> text extraction as an actor-pool ``map_batches`` stage.

Models the reference's benchmark HTML parsing (DemoHTMLParser,
benchmark/byTask/feeds/DemoHTMLParser.java:36) and HTMLStripCharFilter
(analysis/common/charfilter/HTMLStripCharFilter.java:39): strip tags,
unescape a small entity set, extract title and body text.

The north-star per-row invariant: for pages produced by our deterministic
crawler mapping (data/webpages.py), the extracted body text is
**byte-identical** to the canonical ``text`` column per url — asserted by
tests and by the ``html_extract`` oracle query.

The extractor compiles its regexes once per actor (``__init__``), the
reference's analyzer-reuse pattern (analysis/Analyzer.java:85 thread-local
reuse) mapped to Ray actor pools.
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np
import pyarrow as pa


class HtmlTextExtractor:
    """Callable class -> actor pool in map_batches (state = compiled regexes).

    Input: webpage batches with ``html: binary``; output adds
    ``extracted_title`` and ``extracted_text`` string columns.
    """

    def __init__(self) -> None:
        self.title_re = re.compile(rb"<title[^>]*>(.*?)</title>", re.S | re.I)
        self.script_re = re.compile(
            rb"<(script|style)[^>]*>.*?</\1>", re.S | re.I
        )
        self.comment_re = re.compile(rb"<!--.*?-->", re.S)
        self.tag_re = re.compile(rb"<[^>]+>")
        self.ws_re = re.compile(rb"[ \t\r\n]+")

    def _extract_one(self, raw: bytes) -> tuple[str, str]:
        m = self.title_re.search(raw)
        title = (
            _htmlmod.unescape(m.group(1).decode("utf-8", "replace")).strip()
            if m
            else ""
        )
        body = raw
        bm = re.search(rb"<body[^>]*>(.*?)</body>", raw, re.S | re.I)
        if bm:
            body = bm.group(1)
        body = self.comment_re.sub(b"", body)
        body = self.script_re.sub(b"", body)
        # tags separate text runs without inserting characters between
        # adjacent inline content (HTMLStripCharFilter replaces tags with
        # nothing; our wrapper uses <p> blocks so block joins need no space)
        body = self.tag_re.sub(b"", body)
        text = body.decode("utf-8", "replace")
        text = _htmlmod.unescape(text).strip()
        return title, text

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = batch["html"]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        try:
            s = pc.cast(h, pa.string())
        except pa.ArrowInvalid:
            return self._call_slow(batch)  # non-UTF8 bytes: row-wise decode

        # vectorized RE2 chain (the HTMLStripCharFilter pipeline as Arrow
        # kernels; backreference-free patterns since RE2 has no backrefs)
        title = pc.struct_field(
            pc.extract_regex(s, r"(?is)<title[^>]*>(?P<t>.*?)</title>"), "t"
        )
        title = pc.utf8_trim_whitespace(pc.fill_null(title, ""))
        body = pc.struct_field(
            pc.extract_regex(s, r"(?is)<body[^>]*>(?P<b>.*?)</body>"), "b"
        )
        body = pc.if_else(pc.is_null(body), s, body)
        body = pc.replace_substring_regex(body, r"(?s)<!--.*?-->", "")
        body = pc.replace_substring_regex(body, r"(?is)<script[^>]*>.*?</script>", "")
        body = pc.replace_substring_regex(body, r"(?is)<style[^>]*>.*?</style>", "")
        body = pc.replace_substring_regex(body, r"<[^>]+>", "")
        body = pc.utf8_trim_whitespace(body)

        # entity unescape: only rows that actually contain '&' take the
        # exact-python path (html.unescape supports every named entity)
        texts = body.to_pylist()
        titles = title.to_pylist()
        amp_b = np.nonzero(pc.match_substring(body, "&").to_numpy(zero_copy_only=False))[0]
        for i in amp_b:
            texts[i] = _htmlmod.unescape(texts[i])
        amp_t = np.nonzero(pc.match_substring(title, "&").to_numpy(zero_copy_only=False))[0]
        for i in amp_t:
            titles[i] = _htmlmod.unescape(titles[i])
        return batch.append_column(
            "extracted_title", pa.array(titles, type=pa.string())
        ).append_column("extracted_text", pa.array(texts, type=pa.string()))

    def _call_slow(self, batch: pa.Table) -> pa.Table:
        titles, texts = [], []
        for raw in batch["html"].to_pylist():
            t, x = self._extract_one(raw)
            titles.append(t)
            texts.append(x)
        return batch.append_column(
            "extracted_title", pa.array(titles, type=pa.string())
        ).append_column("extracted_text", pa.array(texts, type=pa.string()))


def extract_text(pages, concurrency: int = 4, batch_size: int = 2048):
    """Dataset pipeline: pages -> pages + extracted columns (actor pool)."""
    return pages.map_batches(
        HtmlTextExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
