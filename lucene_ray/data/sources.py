"""Content sources beyond Parquet — the benchmark feed readers
(lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/feeds/
LineDocSource.java:47, TrecContentSource.java:63, plus the
test-framework's LineFileDocs.java:61): corpora arrive as
one-doc-per-line TSV, TREC SGML blocks, or JSONL — not Parquet.

Every reader returns a ``ray.data.Dataset`` with the engine's canonical
``(doc_id, text, ...)`` shape so the whole pipeline surface (build_index,
dedup, quality, ...) runs on these feeds unchanged. Writers exist for the
line-doc and TREC formats so round-trip tests and fixtures are
deterministic.

Parsing is vectorized: the line formats ride ``ray.data.read_text``
(one block per file chunk) + Arrow splits; TREC's multi-line <DOC>
blocks are re-assembled per batch with ONE RE2 extract over a
file-per-row read (TREC files are many small files in practice — the
per-file row is the natural parallel unit).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# LineDocSource field order (benchmark/byTask/feeds/LineDocSource.java:47
# "title <TAB> date <TAB> body")
_SEP = "\t"

# default byte range per read task: small enough that range + one block
# fits comfortably in a worker's heap, big enough to amortize task costs
_RANGE_BYTES = 8 << 20


def write_line_docs(table: pa.Table, path: str, title_col: "str | None" = None,
                    date_col: "str | None" = None,
                    text_col: str = "text") -> str:
    """Write the one-doc-per-line TSV format (title \\t date \\t body).
    Missing title/date columns emit empty fields. Deterministic row
    order = table order."""
    titles = (table[title_col].to_pylist() if title_col
              else [""] * table.num_rows)
    dates = (table[date_col].to_pylist() if date_col
             else [""] * table.num_rows)
    bodies = table[text_col].to_pylist()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for t, d, b in zip(titles, dates, bodies):
            f.write(f"{t or ''}{_SEP}{d or ''}{_SEP}{(b or '')}\n")
    os.replace(tmp, path)
    return path


def _scan_lines(path: str, start: int, end: int,
                readahead: int = 1 << 20) -> list:
    """Decoded lines (newline stripped) whose first byte lies in
    [start, end) — the line-format analog of :func:`_scan_blocks`: a
    line belongs to the range holding its start, the last owned line
    completes via bounded forward read-ahead, memory stays bounded by
    range + one line."""
    out: list = []
    with open(path, "rb") as f:
        if start == 0:
            lo = first = 0
        else:
            # back up one byte: position p starts a line iff byte p-1
            # is '\n'; the first owned line starts after the first
            # newline at or past start-1
            lo = start - 1
        f.seek(lo)
        buf = f.read(end - lo)
        if start == 0:
            first = 0
        else:
            nl = buf.find(b"\n")
            if nl < 0 or lo + nl + 1 >= end:
                return out
            first = nl + 1
        pos = first
        while True:
            apos = lo + pos
            if apos >= end or pos >= len(buf):
                break
            nl = buf.find(b"\n", pos)
            while nl < 0:
                more = f.read(readahead)
                if not more:
                    break
                buf += more
                nl = buf.find(b"\n", pos)
            if nl < 0:
                out.append(buf[pos:].decode("utf-8"))
                break
            out.append(buf[pos:nl].decode("utf-8"))
            pos = nl + 1
    return out


def read_line_docs(path: str,
                   range_bytes: int = _RANGE_BYTES) -> "ray.data.Dataset":
    """LineDocSource reader: each line -> (doc_id, title, date, text)
    with doc_id = global line number (the format's sequential-id
    contract, LineDocSource.java:47). Two distributed byte-range passes
    replace the round-3 whole-corpus driver concat: pass 1 counts the
    lines per range (tiny rows to the driver, prefix-summed into range
    doc-id bases), pass 2 parses each range with
    ``doc_id = base + local line index`` — no task ever holds more than
    one range + one line, and a single multi-GB line file parallelizes
    across ranges."""
    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    items = _byte_range_items(paths, range_bytes)

    def count_range(b: pa.Table) -> pa.Table:
        idxs, counts = [], []
        for i, p, s, e in zip(b["item_idx"].to_pylist(),
                              b["path"].to_pylist(),
                              b["start"].to_pylist(), b["end"].to_pylist()):
            idxs.append(i)
            counts.append(len(_scan_lines(p, s, e)))
        return pa.table({"item_idx": pa.array(idxs, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    for i, it in enumerate(items):
        it["item_idx"] = i
    counts_rows = ray.data.from_items(items).map_batches(
        count_range, batch_format="pyarrow").take_all()  # one tiny row/range
    n_by_idx = {r["item_idx"]: r["n"] for r in counts_rows}
    base = 0
    for i, it in enumerate(items):
        it["base"] = base
        base += n_by_idx.get(i, 0)

    def parse_range(b: pa.Table) -> pa.Table:
        bases, lines = [], []
        for p, s, e, bs in zip(b["path"].to_pylist(), b["start"].to_pylist(),
                               b["end"].to_pylist(), b["base"].to_pylist()):
            ls = _scan_lines(p, s, e)
            bases.extend(range(bs, bs + len(ls)))
            lines.extend(ls)
        arr = pa.array(lines, type=pa.string())
        # well-formed lines have exactly two separators (the writer's
        # contract); max_splits keeps tabs inside the body intact
        parts = pc.split_pattern(arr, _SEP, max_splits=2)
        return pa.table({
            "doc_id": pa.array(bases, type=pa.int64()),
            "title": pc.list_element(parts, 0),
            "date": pc.list_element(parts, 1),
            "text": pc.list_element(parts, 2),
        })

    return ray.data.from_items(items).map_batches(
        parse_range, batch_format="pyarrow")


def write_trec(table: pa.Table, path: str, id_col: str = "doc_id",
               text_col: str = "text") -> str:
    """Write TREC SGML blocks: <DOC><DOCNO>id</DOCNO><TEXT>body</TEXT></DOC>."""
    ids = table[id_col].to_pylist()
    bodies = table[text_col].to_pylist()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for i, b in zip(ids, bodies):
            f.write(f"<DOC>\n<DOCNO>{i}</DOCNO>\n<TEXT>\n{(b or '')}\n"
                    f"</TEXT>\n</DOC>\n")
    os.replace(tmp, path)
    return path


def _byte_range_items(paths: list, range_bytes: int) -> list:
    """(path, start, end) byte-range tasks covering every file — the
    parallel unit for single-file feeds (a real enwiki dump is ONE
    ~100-GB XML file; a file-per-task read gives zero parallelism and
    reads the whole file into memory)."""
    items = []
    for p in paths:
        size = os.path.getsize(p)
        n = max(1, -(-size // range_bytes))
        for i in range(n):
            items.append({"path": p, "start": i * range_bytes,
                          "end": min(size, (i + 1) * range_bytes)})
    return items


def _scan_blocks(path: str, start: int, end: int, begin: bytes,
                 endm: bytes, readahead: int = 1 << 20):
    """Raw bytes of every block whose ``begin`` marker STARTS in
    [start, end) — the boundary-reconciliation rule that makes byte-range
    tasks exact: each block belongs to exactly one range (the one holding
    its begin marker), and a task whose last block crosses its range end
    reads FORWARD in bounded chunks until the end marker. Markers that
    straddle the range start are caught by backing the scan window up
    len(begin)-1 bytes. Memory stays bounded by range + one block."""
    m = len(begin)
    lo = max(0, start - (m - 1))
    out = []
    with open(path, "rb") as f:
        f.seek(lo)
        buf = f.read(end - lo)
        pos = 0
        while True:
            i = buf.find(begin, pos)
            if i < 0 or lo + i >= end:
                break
            j = buf.find(endm, i + m)
            while j < 0:
                more = f.read(readahead)
                if not more:
                    break
                buf += more
                j = buf.find(endm, i + m)
            if j < 0:
                break  # truncated trailing block (malformed tail): drop
            out.append(buf[i:j + len(endm)])
            pos = j + len(endm)
    return out


def _docno_to_id(docno: str) -> int:
    """Stable int64 doc id for a DOCNO: numeric DOCNOs keep their value;
    alphanumeric ones (real TREC collections use e.g. 'LA010189-0001')
    map to a stable 63-bit SHA-1 — the reader must not crash on genuine
    TREC feeds (round-3 advisor finding)."""
    if docno.isdigit():
        return int(docno)
    import hashlib as _h

    return int.from_bytes(_h.sha1(docno.encode()).digest()[:8], "big") >> 1


def read_trec(path: str, range_bytes: int = _RANGE_BYTES) -> "ray.data.Dataset":
    """TrecContentSource reader (feeds/TrecContentSource.java:63): parse
    <DOC> blocks into (doc_id, docno, text). Byte-range tasks with
    </DOC>-boundary reconciliation (:func:`_scan_blocks`) — a single
    multi-GB TREC file parallelizes across ranges with bounded RSS, like
    the reference's streaming read. ``docno`` keeps the raw DOCNO string
    (alphanumeric in real collections); ``doc_id`` is its stable int64
    (numeric value, else SHA-1). Requires the writer's strict
    <DOC><DOCNO><TEXT> tag order; docs with a different inner tag order
    are dropped (documented contract)."""
    import re

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])

    def parse_range(b: pa.Table) -> pa.Table:
        doc_re = re.compile(
            rb"<DOC>\s*<DOCNO>\s*(.*?)\s*</DOCNO>\s*<TEXT>\s*(.*?)\s*</TEXT>"
            rb"\s*</DOC>", re.DOTALL)
        out_no, out_txt = [], []
        for p, s, e in zip(b["path"].to_pylist(), b["start"].to_pylist(),
                           b["end"].to_pylist()):
            for blk in _scan_blocks(p, s, e, b"<DOC>", b"</DOC>"):
                mt = doc_re.match(blk)
                if mt:
                    out_no.append(mt.group(1).decode("utf-8"))
                    out_txt.append(mt.group(2).decode("utf-8"))
        return pa.table({
            "doc_id": pa.array([_docno_to_id(d) for d in out_no],
                               type=pa.int64()),
            "docno": pa.array(out_no, type=pa.string()),
            "text": pa.array(out_txt, type=pa.string()),
        })

    items = _byte_range_items(paths, range_bytes)
    return ray.data.from_items(items).map_batches(
        parse_range, batch_format="pyarrow")


def read_jsonl_docs(path: str, id_col: str = "doc_id",
                    text_col: str = "text") -> "ray.data.Dataset":
    """JSONL corpus reader (the modern crawl-dump shape): ray.data's
    native JSON reader, columns renamed to the canonical schema."""
    ds = ray.data.read_json(path)

    def conform(b: pa.Table) -> pa.Table:
        cols = {"doc_id": b[id_col], "text": b[text_col]}
        for name in b.schema.names:
            if name not in (id_col, text_col):
                cols[name] = b[name]
        return pa.table(cols)

    return ds.map_batches(conform, batch_format="pyarrow")


def write_enwiki(table: pa.Table, path: str, id_col: str = "doc_id",
                 title_col: "str | None" = None,
                 text_col: str = "text") -> str:
    """Write the minimal Wikipedia-dump page shape EnwikiContentSource
    consumes: <page><id>..</id><title>..</title><revision><text>..</text>
    </revision></page> inside a <mediawiki> root."""
    ids = table[id_col].to_pylist()
    titles = (table[title_col].to_pylist() if title_col
              else [f"page {i}" for i in ids])
    bodies = table[text_col].to_pylist()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("<mediawiki>\n")
        for i, t, b in zip(ids, titles, bodies):
            f.write(f"<page>\n<id>{i}</id>\n<title>{t or ''}</title>\n"
                    f"<revision><text>{(b or '')}</text></revision>\n"
                    f"</page>\n")
        f.write("</mediawiki>\n")
    os.replace(tmp, path)
    return path


def read_enwiki(path: str, range_bytes: int = _RANGE_BYTES) -> "ray.data.Dataset":
    """EnwikiContentSource reader (benchmark/byTask/feeds/
    EnwikiContentSource.java:47): parse <page> blocks of a Wikipedia-dump
    XML into (doc_id, title, text). A real enwiki dump is ONE ~100-GB
    file, so the read parallelizes by byte range with </page>-boundary
    reconciliation (:func:`_scan_blocks`) — every range task holds at
    most range_bytes + one page in memory, matching the reference's
    streaming read. Entity-unescaping is left to the HTML pipeline (the
    reference also feeds raw wiki markup through its parser)."""
    import re

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])

    def parse_range(b: pa.Table) -> pa.Table:
        out_id, out_title, out_txt = [], [], []
        page_re = re.compile(
            rb"<page>\s*<id>\s*(\d+)\s*</id>\s*<title>(.*?)</title>\s*"
            rb"<revision>\s*<text>(.*?)</text>\s*</revision>\s*</page>",
            re.DOTALL)
        for p, s, e in zip(b["path"].to_pylist(), b["start"].to_pylist(),
                           b["end"].to_pylist()):
            for blk in _scan_blocks(p, s, e, b"<page>", b"</page>"):
                m = page_re.match(blk)
                if m:
                    out_id.append(int(m.group(1)))
                    out_title.append(m.group(2).decode("utf-8"))
                    out_txt.append(m.group(3).decode("utf-8"))
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "title": pa.array(out_title, type=pa.string()),
            "text": pa.array(out_txt, type=pa.string()),
        })

    items = _byte_range_items(paths, range_bytes)
    return ray.data.from_items(items).map_batches(
        parse_range, batch_format="pyarrow")
