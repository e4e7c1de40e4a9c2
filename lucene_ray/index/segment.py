"""SPIMI segment construction: one immutable segment per input partition.

The Ray-Data translation of Lucene's DocumentsWriterPerThread: each
``map_batches`` task receives one whole input block (``batch_size=None``),
inverts it in task-local memory (the shared-nothing DWPT model,
index/DocumentsWriterPerThreadPool.java:43,115), and flushes one immutable
segment directory (DocumentsWriterPerThread.flush,
index/DocumentsWriterPerThread.java:442-566):

    segments/<segment_id>/
        terms.parquet     term -> (df, ttf, offset, length) sorted by term
                          (the terms-dictionary role of the Lucene103
                          block-tree, blocktree/Lucene103BlockTreeTermsWriter.java:211 —
                          a sorted Arrow table + binary search instead of a trie)
        postings.bin      concatenated postings blobs (codec/postings.py)
        docs.parquet      doc_id, doc_len, norm  (norms column,
                          codecs/lucene90/Lucene90NormsFormat.java:83)
        positions.parquet optional (term, doc_id, pos) exploded rows
        meta.json         written atomically LAST -> the per-partition
                          checkpoint/lineage record (input fingerprint,
                          counts, terms/sec, postings bytes)

Doc IDs inside a segment are local (doc_id - doc_base), mirroring Lucene's
per-leaf docBase; ``meta.json`` carries the base. A rerun that finds a
completed segment with the same fingerprint skips it (resumability — the
commit-point semantics of index/SegmentInfos.java:54-133 applied per
partition).

Norms: norm byte = SmallFloat.intToByte4(field length), field length =
number of tokens after stop filtering (Similarity.computeNorm,
search/similarities/Similarity.java:151-160).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.analysis.batch import tokenize_column
from lucene_ray.codec.postings import encode_postings_many
from lucene_ray.util.smallfloat import int_to_byte4_array

MANIFEST_SCHEMA = pa.schema(
    [
        ("segment_id", pa.string()),
        ("path", pa.string()),
        ("doc_base", pa.int64()),
        ("max_doc_id", pa.int64()),
        ("doc_count", pa.int64()),
        ("sum_total_term_freq", pa.int64()),
        ("n_terms", pa.int64()),
        ("postings_bytes", pa.int64()),
        ("build_secs", pa.float64()),
        ("terms_per_sec", pa.float64()),
        ("fingerprint", pa.string()),
        ("skipped", pa.bool_()),
        ("field_ttf_json", pa.string()),  # per-extra-field sum_ttf, JSON dict
    ]
)


def _fingerprint(doc_ids: np.ndarray, text_bytes: int) -> str:
    from lucene_ray.codec.postings import CODEC_VERSION

    # codec version fused in so a layout bump invalidates resume checkpoints
    # (a stale-codec segment must never be skipped into a fresh manifest)
    return f"{doc_ids.shape[0]}:{int(doc_ids.sum())}:{text_bytes}:c{CODEC_VERSION}"


class SegmentBuilder:
    """Callable for ``map_batches`` (stateless task — config only).

    Input batch: columns (id_col:int64, text_col:string). Output: one
    manifest row per segment built (MANIFEST_SCHEMA).
    """

    def __init__(
        self,
        index_dir: str,
        analyzer: Analyzer = StandardAnalyzer,
        text_col: str = "text",
        id_col: str = "doc_id",
        with_positions: bool = False,
        extra_fields: dict[str, str] | None = None,
        features: dict[str, str] | None = None,
        field_analyzers: "dict[str, object] | None" = None,
        string_values: dict[str, str] | None = None,
        field_options: "dict[str | None, str] | None" = None,
    ) -> None:
        self.index_dir = index_dir
        self.analyzer = analyzer
        self.text_col = text_col
        self.id_col = id_col
        self.with_positions = with_positions
        # per-field analyzer overrides — PerFieldAnalyzerWrapper
        # (analysis/miscellaneous/PerFieldAnalyzerWrapper.java:51); a
        # field absent here inverts with the default analyzer
        self.field_analyzers = dict(field_analyzers or {})
        # static per-doc feature values (document/FeatureField.java:96 —
        # the reference smuggles the value into a term's frequency; here
        # each feature is a feat_<name> float32 docs.parquet column):
        # feature name -> numeric source column
        self.features = dict(sorted((features or {}).items()))
        # per-field postings format registry — the PerFieldPostingsFormat
        # role (codecs/perfield/PerFieldPostingsFormat.java:71, field
        # IndexOptions index/IndexOptions.java:28): field name (None =
        # default field) -> "docs" | "docs_and_freqs" | "positions".
        # A "docs_and_freqs" field writes NO rows into the positions
        # artifact even when the index has positions; a "docs" field
        # additionally flattens term freqs to 1 (the codec's freq-1
        # stream encodes them with zero freq payload). Unlisted fields
        # follow with_positions.
        self.field_options = dict(field_options or {})
        if not with_positions and \
                "positions" in self.field_options.values():
            raise ValueError(
                "field_options can only DOWNGRADE from the index-wide "
                "setting: a 'positions' field requires with_positions=True")
        # per-doc STRING doc values (BinaryDocValuesField /
        # SortedDocValuesField role, document/BinaryDocValuesField.java:36):
        # name -> string source column, persisted as sdv_<name> columns,
        # updatable via index/docvalues.update_string_doc_values
        self.string_values = dict(sorted((string_values or {}).items()))
        # named fields beyond the default: field name -> source column.
        # Their terms are stored \x01<field>\x1f-prefixed in the SAME sorted
        # dictionary (index/fields.py), norms/lengths as norm_<f>/len_<f>
        # docs.parquet columns (per-field norms, index/FieldInfos.java).
        self.extra_fields = dict(sorted((extra_fields or {}).items()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        if batch.num_rows == 0:
            return MANIFEST_SCHEMA.empty_table()

        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        if not (np.diff(order) > 0).all():
            batch = batch.take(pa.array(order))
            doc_ids = doc_ids[order]
        if doc_ids.shape[0] > 1 and not (np.diff(doc_ids) > 0).all():
            raise ValueError("duplicate doc_ids within a partition")

        base = int(doc_ids[0])
        max_doc = int(doc_ids[-1])
        segment_id = f"seg-{base:012d}-{max_doc:012d}"
        seg_dir = os.path.join(self.index_dir, "segments", segment_id)
        texts = batch[self.text_col]
        text_bytes = texts.nbytes + sum(
            batch[c].nbytes for c in self.extra_fields.values()
        ) + sum(batch[c].nbytes for c in self.features.values())
        fp = _fingerprint(doc_ids, text_bytes)

        # Resume: a completed segment with the same fingerprint is skipped.
        meta_path = os.path.join(seg_dir, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == fp:
                meta["skipped"] = True
                meta["build_secs"] = 0.0
                return self._manifest_row(meta)

        local_ids = (doc_ids - base).astype(np.int64)
        n_docs = batch.num_rows

        # invert the default field plus each named extra field; sections are
        # concatenated in dictionary-sort order (prefixed field sections
        # first, by field name, then the default field's plain terms —
        # index/fields.py guarantees that IS the global sorted order)
        from lucene_ray.index.fields import field_prefix

        sections = []
        for fname, col in self.extra_fields.items():
            sections.append(
                self._invert_field(
                    batch[col], n_docs, local_ids, field_prefix(fname), fname
                )
            )
        default_sec = self._invert_field(texts, n_docs, local_ids, "", None)
        sections.append(default_sec)

        # per-field IndexOptions (PerFieldPostingsFormat.java:71 registry
        # role): DOCS fields drop term frequencies (freq ≡ 1 rides the
        # codec's empty freq-1 stream)
        for s in sections:
            if self._field_option(s["field"]) == "docs":
                s["freqs"] = np.ones_like(s["freqs"])

        sorted_vocab = pa.concat_arrays([s["vocab"] for s in sections])
        off_post = 0
        start_parts = []
        for s in sections:
            start_parts.append(s["term_starts"][:-1] + off_post)
            off_post += int(s["p_docs"].shape[0])
        start_parts.append(np.array([off_post], dtype=np.int64))
        term_starts = np.concatenate(start_parts)
        p_docs = np.concatenate([s["p_docs"] for s in sections])
        freqs = np.concatenate([s["freqs"] for s in sections])
        p_norms = np.concatenate([s["p_norms"] for s in sections])
        doc_len = default_sec["doc_len"]
        norms = default_sec["norms"]

        os.makedirs(os.path.join(self.index_dir, "segments"), exist_ok=True)
        tmp_dir = os.path.join(
            self.index_dir, "segments", f".tmp-{segment_id}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(tmp_dir, exist_ok=True)
        positions_tbl = None
        pos_sections = [s for s in sections
                        if self._field_option(s["field"]) == "positions"]
        if pos_sections:
            positions_tbl = pa.concat_tables(
                [self._positions_table(s, doc_ids) for s in pos_sections]
            )
        extra_doc_cols = {}
        for fname, col in self.features.items():
            extra_doc_cols[f"feat_{fname}"] = (
                batch[col].to_numpy(zero_copy_only=False).astype(np.float32)
            )
        for fname, col in self.string_values.items():
            v = batch[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            extra_doc_cols[f"sdv_{fname}"] = v.cast(pa.string())
        field_ttf = {}
        for s in sections[:-1]:
            extra_doc_cols[f"len_{s['field']}"] = s["doc_len"]
            extra_doc_cols[f"norm_{s['field']}"] = s["norms"].astype(np.int32)
            field_ttf[s["field"]] = int(s["doc_len"].sum())
        n_tokens = sum(s["n_tokens"] for s in sections)
        try:
            meta = self._write_segment(
                tmp_dir,
                segment_id,
                base,
                max_doc,
                doc_ids,
                doc_len,
                norms,
                sorted_vocab,
                term_starts,
                p_docs,
                freqs,
                p_norms,
                fp,
                positions_tbl,
                extra_doc_cols,
                field_ttf,
            )
            meta["build_secs"] = time.perf_counter() - t0
            meta["terms_per_sec"] = (
                n_tokens / meta["build_secs"] if meta["build_secs"] > 0 else 0.0
            )
            with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
                json.dump(meta, f)
            try:
                os.replace(tmp_dir, seg_dir)
            except OSError:
                # another (retried) task won the rename — theirs is complete
                import shutil

                shutil.rmtree(tmp_dir, ignore_errors=True)
        finally:
            if os.path.isdir(tmp_dir):
                import shutil

                shutil.rmtree(tmp_dir, ignore_errors=True)
        meta["skipped"] = False
        return self._manifest_row(meta)

    def _field_option(self, field: "str | None") -> str:
        """Effective IndexOptions of a field: explicit registry entry,
        else the index-wide with_positions default."""
        opt = self.field_options.get(field)
        if opt is None:
            opt = "positions" if self.with_positions else "docs_and_freqs"
        return opt

    def _invert_field(
        self,
        texts,
        n_docs: int,
        local_ids: np.ndarray,
        key_prefix: str,
        field: str | None,
    ) -> dict:
        """Tokenize + invert one field's column into posting arrays.

        Term codes via arrow dictionary encode, then (code, doc) -> freq
        aggregation with one np.unique over a fused int64 key. With a
        ``key_prefix`` the sorted vocab (and positions terms) are prefixed
        into the field's dictionary section."""
        analyzer = (self.field_analyzers.get(field, self.analyzer)
                    if field is not None else self.analyzer)
        payloads = None
        tfs = None
        if analyzer.tf_delimiter is not None:
            # DelimitedTermFrequencyTokenFilter (miscellaneous/
            # DelimitedTermFrequencyTokenFilter.java:37): client-supplied
            # per-occurrence term frequencies; DOCS_AND_FREQS only, like
            # the reference's custom-term-frequency rule (IndexingChain
            # rejects positions with custom frequencies)
            from lucene_ray.analysis.batch import tokenize_with_tf

            if self.with_positions:
                raise ValueError(
                    "tf_delimiter requires with_positions=False "
                    "(custom term frequencies allow DOCS_AND_FREQS only)")
            flat_terms, doc_idx, tfs = tokenize_with_tf(texts, analyzer)
            positions = np.zeros(len(flat_terms), dtype=np.int32)
            off_starts = off_ends = None
        elif analyzer.payload_delimiter is not None:
            from lucene_ray.analysis.batch import tokenize_with_payloads

            (flat_terms, doc_idx, positions, off_starts, off_ends,
             payloads) = tokenize_with_payloads(texts, analyzer)
            if not self.with_positions:
                raise ValueError(
                    "payload_delimiter requires with_positions=True "
                    "(payloads live in the positions table)")
        else:
            res = tokenize_column(
                texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
                analyzer,
                want_offsets=self.with_positions,
            )
            if self.with_positions:
                flat_terms, doc_idx, positions, off_starts, off_ends = res
            else:
                flat_terms, doc_idx, positions = res
                off_starts = off_ends = None
        if analyzer.discount_overlaps and len(flat_terms):
            # numTerms - numOverlap (Similarity.computeNorm,
            # discountOverlaps=true): same-position injected tokens count
            # once -> field length = unique (doc, position) pairs
            stride = np.int64(positions.max()) + 1
            fused = doc_idx.astype(np.int64) * stride + positions
            doc_len = np.bincount(
                (np.unique(fused) // stride).astype(np.int64),
                minlength=n_docs).astype(np.int64)
        elif tfs is not None:
            # field length accumulates the custom frequencies, exactly
            # as the reference's invert does with TermFrequencyAttribute
            doc_len = np.bincount(doc_idx, weights=tfs.astype(np.float64),
                                  minlength=n_docs).astype(np.int64)
        else:
            doc_len = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        norms = int_to_byte4_array(doc_len)

        dict_arr = pc.dictionary_encode(flat_terms)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)  # int32
        vocab = dict_arr.dictionary
        # lexicographic term order (== UTF-8 byte order == codepoint order)
        sort_idx = pc.array_sort_indices(vocab)
        rank = np.empty(len(vocab), dtype=np.int32)
        rank[sort_idx.to_numpy(zero_copy_only=False)] = np.arange(
            len(vocab), dtype=np.int32
        )
        sorted_vocab = vocab.take(sort_idx)
        codes = rank[codes]

        # (code, doc) -> freq via ONE sort of a fused key. uint32 staging
        # when the key space fits: the sort is the builder's dominant
        # memory traffic, and the round-2 scaling wall was the shared
        # DRAM bus — halving the element width measurably lifts 8->32.
        n_tok = codes.shape[0]
        if len(vocab) * n_docs < (1 << 32):
            key = codes.astype(np.uint32) * np.uint32(n_docs) + doc_idx[
                :n_tok
            ].astype(np.uint32)
        else:
            key = codes.astype(np.int64) * n_docs + doc_idx[:n_tok]
        if tfs is not None:
            ukey, inv = np.unique(key, return_inverse=True)
            freqs = np.bincount(inv, weights=tfs.astype(np.float64),
                                minlength=ukey.shape[0]).astype(np.int64)
        else:
            ukey, freqs = np.unique(key, return_counts=True)
        p_codes = (ukey // n_docs).astype(np.int64)
        doc_of = (ukey % n_docs).astype(np.int64)
        p_docs = local_ids[doc_of]
        p_norms = norms[doc_of]
        term_starts = np.searchsorted(p_codes, np.arange(len(vocab) + 1))

        if key_prefix:
            sorted_vocab = pc.binary_join_element_wise(
                key_prefix, sorted_vocab.cast(pa.string()), ""
            )
        return {
            "field": field,
            "key_prefix": key_prefix,
            "vocab": sorted_vocab,
            "term_starts": term_starts,
            "p_docs": p_docs,
            "freqs": freqs.astype(np.uint32),
            "p_norms": p_norms,
            "doc_len": doc_len,
            "norms": norms,
            "n_tokens": len(flat_terms),
            "flat_terms": flat_terms if self.with_positions else None,
            "codes": codes if self.with_positions else None,
            "doc_idx": doc_idx if self.with_positions else None,
            "positions": positions if self.with_positions else None,
            "off_starts": off_starts,
            "off_ends": off_ends,
            "payloads": payloads,
        }

    @staticmethod
    def _positions_table(sec: dict, doc_ids: np.ndarray) -> pa.Table:
        """Exploded (term, doc_id, pos, start_offset, end_offset) rows for
        one field's section, sorted by (term, doc, pos) for row-group
        pruning. Character offsets are the IndexOptions
        DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS variant
        (index/IndexOptions.java:46) — the highlighter's byte-accurate
        snippet source."""
        order = np.lexsort((sec["positions"], sec["doc_idx"], sec["codes"]))
        terms = pc.take(sec["flat_terms"], pa.array(order))
        if sec["key_prefix"]:
            terms = pc.binary_join_element_wise(sec["key_prefix"], terms, "")
        cols = {
            "term": terms,
            "doc_id": doc_ids[sec["doc_idx"][order]],
            "pos": sec["positions"][order].astype(np.int32),
            "start_offset": sec["off_starts"][order].astype(np.int32),
            "end_offset": sec["off_ends"][order].astype(np.int32),
        }
        if sec.get("payloads") is not None:
            cols["payload"] = sec["payloads"][order].astype(np.float32)
        return pa.table(cols)

    def _write_segment(
        self,
        out_dir: str,
        segment_id: str,
        base: int,
        max_doc: int,
        doc_ids: np.ndarray,
        doc_len: np.ndarray,
        norms: np.ndarray,
        sorted_vocab: pa.Array,
        term_starts: np.ndarray,
        p_docs: np.ndarray,
        freqs: np.ndarray,
        p_norms: np.ndarray,
        fingerprint: str,
        positions_tbl: pa.Table | None,
        extra_doc_cols: dict[str, np.ndarray],
        field_ttf: dict[str, int],
    ) -> dict:
        n_terms = len(sorted_vocab)
        buf, offsets, lengths = encode_postings_many(
            p_docs, freqs, p_norms, term_starts
        )
        off = int(buf.shape[0])
        df = np.diff(term_starts)
        ttf = np.add.reduceat(freqs.astype(np.int64), term_starts[:-1])

        with open(os.path.join(out_dir, "postings.bin"), "wb") as f:
            buf.tofile(f)

        pq.write_table(
            pa.table(
                {
                    "term": sorted_vocab,
                    "df": df,
                    "ttf": ttf,
                    "offset": offsets,
                    "length": lengths,
                }
            ),
            os.path.join(out_dir, "terms.parquet"),
        )
        doc_cols = {
            "doc_id": doc_ids,
            "doc_len": doc_len,
            "norm": norms.astype(np.int32),
        }
        doc_cols.update(extra_doc_cols)
        pq.write_table(pa.table(doc_cols), os.path.join(out_dir, "docs.parquet"))
        if positions_tbl is not None:
            pq.write_table(
                positions_tbl,
                os.path.join(out_dir, "positions.parquet"),
                row_group_size=1 << 17,
            )

        return {
            "segment_id": segment_id,
            "path": os.path.join(self.index_dir, "segments", segment_id),
            "doc_base": base,
            "max_doc_id": max_doc,
            "doc_count": int(doc_ids.shape[0]),
            "sum_total_term_freq": int(doc_len.sum()),
            "n_terms": int(n_terms),
            "postings_bytes": int(off),
            "fingerprint": fingerprint,
            "terms_per_sec": 0.0,
            "build_secs": 0.0,
            "field_ttf_json": json.dumps(field_ttf),
        }

    @staticmethod
    def _manifest_row(meta: dict) -> pa.Table:
        row = {k.name: [meta.get(k.name)] for k in MANIFEST_SCHEMA}
        if row["skipped"][0] is None:
            row["skipped"] = [False]
        if row["field_ttf_json"][0] is None:
            row["field_ttf_json"] = ["{}"]
        return pa.table(row, schema=MANIFEST_SCHEMA)
