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


def read_line_docs(path: str) -> "ray.data.Dataset":
    """LineDocSource reader: each line -> (doc_id, title, date, text)
    with doc_id = global line number. One task per FILE (files in sorted
    order, lines kept in file order via an explicit (file, line) key —
    ray.data.read_text does NOT guarantee line order across blocks).
    The reference reads this format single-threaded
    (LineDocSource.java:47): the sequential-id contract is the format's;
    web-scale corpora should use JSONL/parquet feeds with explicit ids."""
    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])

    def parse_file(b: pa.Table) -> pa.Table:
        tif, lif, lines = [], [], []
        for fi, p in zip(b["file_idx"].to_pylist(), b["path"].to_pylist()):
            with open(p, encoding="utf-8") as f:
                for li, line in enumerate(f):
                    tif.append(fi)
                    lif.append(li)
                    lines.append(line.rstrip("\n"))
        arr = pa.array(lines, type=pa.string())
        # well-formed lines have exactly two separators (the writer's
        # contract); max_splits keeps tabs inside the body intact
        parts = pc.split_pattern(arr, _SEP, max_splits=2)
        return pa.table({
            "file_idx": pa.array(tif, type=pa.int64()),
            "line_idx": pa.array(lif, type=pa.int64()),
            "title": pc.list_element(parts, 0),
            "date": pc.list_element(parts, 1),
            "text": pc.list_element(parts, 2),
        })

    files = ray.data.from_items(
        [{"file_idx": i, "path": p} for i, p in enumerate(paths)])
    t = pa.concat_tables(
        files.map_batches(parse_file, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    order = np.lexsort((t["line_idx"].to_numpy(), t["file_idx"].to_numpy()))
    t = t.take(pa.array(order)).drop_columns(["file_idx", "line_idx"])
    return ray.data.from_arrow(t.add_column(
        0, "doc_id", pa.array(np.arange(t.num_rows, dtype=np.int64))))


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


def read_trec(path: str) -> "ray.data.Dataset":
    """TrecContentSource reader (feeds/TrecContentSource.java:63): parse
    <DOC> blocks into (doc_id, text). Each FILE is one row of the read
    (file_extractor), then ONE RE2 extract-all splits its blocks — TREC
    corpora are directories of many files, which parallelizes the read."""
    import re

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])

    def parse_file(b: pa.Table) -> pa.Table:
        out_id, out_txt = [], []
        doc_re = re.compile(
            r"<DOC>\s*<DOCNO>\s*(.*?)\s*</DOCNO>\s*<TEXT>\s*(.*?)\s*</TEXT>"
            r"\s*</DOC>", re.DOTALL)
        for p in b["path"].to_pylist():
            with open(p, encoding="utf-8") as f:
                content = f.read()
            for m in doc_re.finditer(content):
                out_id.append(int(m.group(1)))
                out_txt.append(m.group(2))
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "text": pa.array(out_txt, type=pa.string()),
        })

    files = ray.data.from_items([{"path": p} for p in paths])
    return files.map_batches(parse_file, batch_format="pyarrow")


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


def read_enwiki(path: str) -> "ray.data.Dataset":
    """EnwikiContentSource reader (benchmark/byTask/feeds/
    EnwikiContentSource.java:47): parse <page> blocks of a Wikipedia-dump
    XML into (doc_id, title, text). Same file-per-task shape as
    :func:`read_trec`; entity-unescaping is left to the HTML pipeline
    (the reference also feeds raw wiki markup through its parser)."""
    import re

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])

    def parse_file(b: pa.Table) -> pa.Table:
        out_id, out_title, out_txt = [], [], []
        page_re = re.compile(
            r"<page>\s*<id>\s*(\d+)\s*</id>\s*<title>(.*?)</title>\s*"
            r"<revision>\s*<text>(.*?)</text>\s*</revision>\s*</page>",
            re.DOTALL)
        for p in b["path"].to_pylist():
            with open(p, encoding="utf-8") as f:
                content = f.read()
            for m in page_re.finditer(content):
                out_id.append(int(m.group(1)))
                out_title.append(m.group(2))
                out_txt.append(m.group(3))
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "title": pa.array(out_title, type=pa.string()),
            "text": pa.array(out_txt, type=pa.string()),
        })

    files = ray.data.from_items([{"path": p} for p in paths])
    return files.map_batches(parse_file, batch_format="pyarrow")
