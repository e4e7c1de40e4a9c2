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
        title = m.group(1).decode("utf-8", "replace").strip() if m else ""
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
