"""Deterministic Common-Crawl-style web-page tables.

BASELINE.json input_hint mandates the corpus shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Two deterministic generators, no external data:

* :func:`webpages_table` — derived 1:1 from ``{sf_dir}/documents.parquet``
  by a *pure SQL-expressible* mapping, so every pipeline over it can be
  checked against a DuckDB oracle running the same mapping:

      url     = 'https://site' || (doc_id % 997) || '.example/p/' || doc_id
      warc_ts = TIMESTAMP '2024-01-01' + doc_id seconds
      html    = '<html><head><title>doc {doc_id}</title></head>' ||
                '<body><p>' || text || '</p></body></html>'  (utf-8 bytes)
      lang    = documents.lang ; text = documents.text
      doc_id  = documents.doc_id

  plus, when ``include_dups``, a newer re-crawl of every url with
  doc_id % 10 == 0: doc_id' = doc_id + 1_000_000, warc_ts' = warc_ts + 10_000 s
  (same url/text -> exact-dedup 'latest wins' fodder,
  IndexWriter.updateDocument semantics, index/IndexWriter.java:1553-1617).

* :func:`synth_corpus` — a scalable Zipfian bag-of-words generator (seeded,
  deterministic, batch-parallel) for benchmarking at arbitrary row counts;
  mirrors the reference benchmark's synthetic content sources
  (benchmark/byTask/feeds/LineDocSource.java model).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z in unix seconds
DUP_MOD = 10
DUP_ID_OFFSET = 1_000_000
DUP_TS_OFFSET = 10_000  # seconds


def _mapping(doc_ids: np.ndarray, texts: pa.Array, langs: pa.Array) -> pa.Table:
    ids_str = pc.cast(pa.array(doc_ids), pa.string())
    site = pc.cast(pa.array(doc_ids % 997), pa.string())
    url = pc.binary_join_element_wise(
        "https://site", site, ".example/p/", ids_str, ""
    )
    ts = pa.array((EPOCH_2024 + doc_ids) * 1_000_000).cast(pa.timestamp("us"))
    html = pc.binary_join_element_wise(
        "<html><head><title>doc ",
        ids_str,
        "</title></head><body><p>",
        texts,
        "</p></body></html>",
        "",
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "url": url,
            "warc_ts": ts,
            "html": pc.cast(html, pa.binary()),
            "text": texts,
            "lang": langs,
        }
    )


def webpages_from_documents(batch: pa.Table, include_dups: bool = True) -> pa.Table:
    """Vectorized documents->webpages mapping (usable inside map_batches)."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"]
    langs = batch["lang"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(langs, pa.ChunkedArray):
        langs = langs.combine_chunks()
    out = _mapping(doc_ids, texts, langs)
    if include_dups:
        sel = doc_ids % DUP_MOD == 0
        if sel.any():
            # re-crawl rows: same url/html/text as the original, new doc_id,
            # warc_ts shifted +10000s (so 'latest wins' picks the re-crawl)
            dup_tbl = _mapping(
                doc_ids[sel], texts.filter(pa.array(sel)), langs.filter(pa.array(sel))
            )
            dup_tbl = dup_tbl.set_column(
                0, "doc_id", pa.array(doc_ids[sel] + DUP_ID_OFFSET)
            )
            ts = pc.add(dup_tbl["warc_ts"].cast(pa.int64()), DUP_TS_OFFSET * 1_000_000)
            dup_tbl = dup_tbl.set_column(2, "warc_ts", ts.cast(pa.timestamp("us")))
            out = pa.concat_tables([out, dup_tbl])
    return out


def webpages_table(sf_dir: str, include_dups: bool = True) -> pa.Table:
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return webpages_from_documents(docs, include_dups)


def webpages_dataset(sf_dir: str, include_dups: bool = True):
    """Streaming variant: read documents, map to webpage shape per batch."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        lambda b: webpages_from_documents(b, include_dups), batch_format="pyarrow"
    )


def with_title_column(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a deterministic ``title`` column: the first 4 body tokens.

    SQL-expressible (the oracle side):
        array_to_string(string_split(text, ' ')[1:4], ' ')
    Used to exercise the multi-field index (title + body) — the Document
    multi-Field model (document/Document.java:40)."""
    lists = pc.list_slice(pc.split_pattern(batch[text_col], " "), 0, 4)
    return batch.append_column("title", pc.binary_join(lists, " "))


TITLE_SQL = "array_to_string(string_split(text, ' ')[1:4], ' ')"


CHILD_CHUNK = 4  # tokens per child doc
CHILD_ID_BASE = 100  # child_id = parent_id * base + chunk index (chunks < base)


def child_chunks(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic parent/child corpus — the nested-document block model
    (ToParentBlockJoinQuery, join/ToParentBlockJoinQuery.java): each parent
    document explodes into child docs of ``CHILD_CHUNK`` consecutive
    tokens; ``child_id = parent_id * 100 + chunk``. SQL twin:
        ts[4*i+1 : 4*i+4] over unnest(range(ceil(len(ts)/4)))."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, " ")
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = -(-lens // CHILD_CHUNK)
    if n_chunks.size and int(n_chunks.max()) > CHILD_ID_BASE:
        # chunk_idx reaching CHILD_ID_BASE would equal the next parent's
        # chunk 0; exactly CHILD_ID_BASE chunks (idx max BASE-1) is fine
        raise ValueError(
            f"document with > {CHILD_ID_BASE * CHILD_CHUNK} tokens would "
            f"collide child ids with the next parent; raise CHILD_ID_BASE"
        )
    parent = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rows_parent = np.repeat(parent, n_chunks)
    starts = np.cumsum(n_chunks) - n_chunks
    chunk_idx = np.arange(int(n_chunks.sum())) - np.repeat(starts, n_chunks)
    row_of = np.repeat(np.arange(len(texts)), n_chunks)
    # build chunk text via offsets into the flat token array (vectorized)
    flat = pc.list_flatten(lists)
    flat_off = np.concatenate(([0], np.cumsum(lens)))
    c_start = flat_off[row_of] + chunk_idx * CHILD_CHUNK
    c_end = np.minimum(c_start + CHILD_CHUNK, flat_off[row_of] + lens[row_of])
    c_len = c_end - c_start
    take_idx = np.repeat(c_start, c_len) + (
        np.arange(int(c_len.sum())) - np.repeat(np.cumsum(c_len) - c_len, c_len)
    )
    toks = flat.take(pa.array(take_idx))
    child_lists = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(c_len))), type=pa.int32()),
        toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks,
    )
    return pa.table(
        {
            "doc_id": rows_parent * CHILD_ID_BASE + chunk_idx,
            "parent_id": rows_parent,
            "text": pc.binary_join(child_lists, " "),
        }
    )


# SQL view of the same mapping (DuckDB), parameterized on dup inclusion —
# the oracle side of every webpage-table query.
WEBPAGES_SQL = """
WITH pages AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 997 AS VARCHAR) || '.example/p/' ||
             CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id) AS warc_ts,
         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
             '</title></head><body><p>' || text || '</p></body></html>' AS html,
         text, lang
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         'https://site' || CAST(doc_id % 997 AS VARCHAR) || '.example/p/' ||
             CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id + 10000) AS warc_ts,
         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
             '</title></head><body><p>' || text || '</p></body></html>' AS html,
         text, lang
  FROM documents WHERE doc_id % 10 = 0
)
"""


# ---------------------------------------------------------------------------
# scalable synthetic corpus for benchmarking
# ---------------------------------------------------------------------------

def _zipf_vocab(vocab_size: int) -> np.ndarray:
    return np.array([f"w{i:05d}" for i in range(vocab_size)], dtype=object)


def synth_corpus_batch(
    start_id: int, n: int, vocab_size: int = 10_000, mean_len: int = 80, seed: int = 42
) -> pa.Table:
    """One deterministic batch of web pages (seeded by row range, so any
    partitioning of the id space yields identical rows)."""
    rng = np.random.default_rng(seed + start_id)
    vocab = _zipf_vocab(vocab_size)
    ranks = rng.zipf(1.3, size=n * mean_len * 2)
    ranks = ranks[ranks <= vocab_size][: n * mean_len] - 1
    lens = np.clip(rng.poisson(mean_len, size=n), 5, None)
    lens = np.minimum(lens, max(1, ranks.shape[0] // max(n, 1)))
    offsets = np.concatenate(([0], np.cumsum(lens)))
    offsets = np.minimum(offsets, ranks.shape[0])
    words = vocab[ranks]
    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n)]
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    langs = pa.array(np.where(ids % 17 == 0, "de", "en"))
    return _mapping(ids, pa.array(texts, type=pa.string()), langs)


def synth_corpus_dataset(n_docs: int, vocab_size: int = 10_000,
                         mean_len: int = 80, seed: int = 42, batch_rows: int = 20_000):
    """Lazy Dataset of ``n_docs`` synthetic pages, generated in parallel."""
    import ray.data

    starts = [
        {"start": s, "n": min(batch_rows, n_docs - s)}
        for s in range(0, n_docs, batch_rows)
    ]

    def gen(batch: pa.Table) -> pa.Table:
        tbls = [
            synth_corpus_batch(int(s), int(n), vocab_size, mean_len, seed)
            for s, n in zip(
                batch["start"].to_pylist(), batch["n"].to_pylist()
            )
        ]
        return pa.concat_tables(tbls)

    return ray.data.from_items(starts).map_batches(
        gen, batch_size=1, batch_format="pyarrow"
    )
