"""Index build driver: Dataset -> segments -> global stats -> manifest.

The pipeline shape (SURVEY.md §3.1 Ray translation):

    read_parquet(columns=[id, text])          # prune at the read
      -> map_batches(SegmentBuilder, batch_size=None)   # one segment/partition
      -> (tiny) manifest rows to the driver
    global field stats   = sums over manifest rows
    global term stats    = ray groupby('term').sum over per-segment
                           terms.parquet partials (pre-aggregated: each term
                           appears <= n_segments times -> the shuffle moves
                           only the vocab, not the postings)
    manifest.json written atomically LAST (the segments_N commit point,
    index/SegmentInfos.java:54-133).

Rebuilding over an existing index dir skips segments whose fingerprint
matches (resume from per-partition checkpoints).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.codec.postings import CODEC_VERSION
from lucene_ray.index.segment import SegmentBuilder


def _build_segments(
    source,
    index_dir: str,
    analyzer: Analyzer,
    text_col: str,
    id_col: str,
    num_segments: int | None,
    with_positions: bool,
    extra_fields: dict[str, str] | None = None,
    features: dict[str, str] | None = None,
    field_analyzers: "dict[str, Analyzer] | None" = None,
    string_values: dict[str, str] | None = None,
    field_options: "dict[str | None, str] | None" = None,
) -> list[dict]:
    """Run the SPIMI segment stage; returns one manifest row per segment."""
    cols = [id_col, text_col] + sorted(
        set((extra_fields or {}).values()) | set((features or {}).values())
        | set((string_values or {}).values())
    )
    if isinstance(source, str):
        # one output segment per read block: pin the block count at the read
        # (no repartition pass) — otherwise Ray splits files into ~2x-cpu
        # blocks and the segment count (and all per-segment fixed cost)
        # silently tracks the executor size instead of the data layout
        kw = {"override_num_blocks": num_segments} if num_segments else {}
        ds = ray.data.read_parquet(source, columns=cols, **kw)
        num_segments = None
    else:
        ds = source.select_columns(cols)
    if num_segments is not None:
        ds = ds.repartition(num_segments)

    builder = SegmentBuilder(
        index_dir,
        analyzer=analyzer,
        text_col=text_col,
        id_col=id_col,
        with_positions=with_positions,
        extra_fields=extra_fields,
        features=features,
        field_analyzers=field_analyzers,
        string_values=string_values,
        field_options=field_options,
    )
    return ds.map_batches(
        builder, batch_size=None, batch_format="pyarrow"
    ).take_all()  # tiny: one row per segment


def logical_field_ttf(segments: list[dict]) -> dict[str, int]:
    """ALL per-field sum_ttfs in one pass, counting each logical doc space
    once (shard metas carry the FULL per-field sums of their shared doc
    space, like doc_count); each segment's JSON parses exactly once."""
    grp: dict = {}
    for s in segments:
        grp.setdefault(s.get("docs_path") or s["path"], s)
    out: dict[str, int] = {}
    for g in grp.values():
        for f, v in json.loads(g.get("field_ttf_json") or "{}").items():
            out[f] = out.get(f, 0) + v
    return out


def logical_doc_stats(segments: list[dict]) -> tuple[int, int]:
    """(doc_count, sum_ttf) counting each LOGICAL doc space once: term-range
    shards of one merged doc space share docs_path and each carry the full
    stats — summing per segment would multiply them by the shard count."""
    grp: dict = {}
    for s in segments:
        grp.setdefault(s.get("docs_path") or s["path"], s)
    return (
        sum(g["doc_count"] for g in grp.values()),
        sum(g["sum_total_term_freq"] for g in grp.values()),
    )


def _write_global_stats(index_dir: str, segments: list[dict]) -> str:
    """Global term stats (df/ttf): partial aggregates per segment, then a
    small groupby over (term, df, ttf) rows. The shuffle moves only the
    vocab (<= n_segments rows per term), never postings. Below a row
    threshold the reduce runs as one driver-side pyarrow group_by (C++
    hash agg, ~ms) — a Ray Data groupby has seconds of fixed all-to-all
    cost that would dominate small builds; past the threshold (web-scale
    vocab x many segments) the distributed path takes over.

    The output directory is content-addressed by the segment set
    (``global_terms-<hash>``) and never rewritten in place — commit
    points (index/commits.py) can then reference it immutably, the way
    the reference's per-commit file lists pin stats files; an identical
    segment set reuses the existing dir. Returns the dir NAME (stored
    as ``manifest["stats_dir"]``; resolve with :func:`stats_path`)."""
    import hashlib

    key = hashlib.sha1("|".join(
        sorted(str(r.get("fingerprint") or r.get("segment_id", ""))
               for r in segments)
    ).encode()).hexdigest()[:10]
    name = f"global_terms-{key}"
    stats_dir = os.path.join(index_dir, name)
    if os.path.isdir(stats_dir):
        return name  # content-addressed: same segment set, same stats
    term_files = [os.path.join(r["path"], "terms.parquet") for r in segments]
    tmp_stats = os.path.join(index_dir, f".tmp-global_terms-{uuid.uuid4().hex[:8]}")
    total_term_rows = sum(r["n_terms"] for r in segments)
    os.makedirs(tmp_stats, exist_ok=True)
    if not term_files:
        # empty corpus: a valid, empty global stats table
        pq.write_table(
            pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "ttf": pa.array([], pa.int64())}),
            os.path.join(tmp_stats, "part-0.parquet"),
        )
    elif total_term_rows <= 5_000_000:
        import pyarrow.dataset as pads

        tbl = pads.dataset(term_files, format="parquet").to_table(
            columns=["term", "df", "ttf"]
        )
        agg_tbl = tbl.group_by("term").aggregate([("df", "sum"), ("ttf", "sum")])
        agg_tbl = agg_tbl.rename_columns(["term", "df", "ttf"]).sort_by("term")
        pq.write_table(agg_tbl, os.path.join(tmp_stats, "part-0.parquet"))
    else:
        tds = ray.data.read_parquet(term_files, columns=["term", "df", "ttf"])
        from ray.data.aggregate import Sum

        agg = tds.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf")
        )
        agg = agg.sort("term")
        agg.write_parquet(tmp_stats)
    try:
        os.replace(tmp_stats, stats_dir)
    except OSError:
        # a concurrent writer landed the identical content-addressed dir
        import shutil

        shutil.rmtree(tmp_stats, ignore_errors=True)
    return name


def build_index(
    source: "ray.data.Dataset | str",
    index_dir: str,
    analyzer: Analyzer = StandardAnalyzer,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_segments: int | None = None,
    with_positions: bool = False,
    extra_fields: dict[str, str] | None = None,
    stored_source: str | None = None,
    features: dict[str, str] | None = None,
    field_analyzers: "dict[str, Analyzer] | None" = None,
    string_values: dict[str, str] | None = None,
    field_options: "dict[str | None, str] | None" = None,
) -> dict:
    """Build (or resume) an inverted index; returns the global manifest.

    ``field_options`` is the per-field postings format registry
    (codecs/perfield/PerFieldPostingsFormat.java:71 +
    index/IndexOptions.java:28): field name (None = default field) ->
    "docs" | "docs_and_freqs" | "positions". A "docs_and_freqs" field
    writes no rows into the positions artifact even when
    ``with_positions=True`` (an index whose every field opts out writes
    no positions file at all); a "docs" field additionally flattens term
    freqs to 1, which the codec's freq-1 stream encodes with zero freq
    payload (postings bytes drop measurably; BM25 then scores tf=1 per
    match, the reference's IndexOptions.DOCS contract). Phrase/interval
    queries over a positions-less field match nothing — the reference
    throws on them; recorded in the manifest for introspection.

    ``string_values`` maps per-doc STRING doc-value names to string
    source columns (BinaryDocValuesField / SortedDocValuesField role,
    document/BinaryDocValuesField.java:36); they persist as
    ``sdv_<name>`` docs.parquet columns, read via
    ``SegmentReader.string_values`` with committed update overlays
    applied (IndexWriter.updateBinaryDocValue, IndexWriter.java:1940 —
    index/docvalues.update_string_doc_values).

    ``features`` maps static per-doc feature names to numeric source
    columns (document/FeatureField.java:96 — pagerank-style signals);
    they persist as ``feat_<name>`` docs.parquet columns and score via
    :class:`lucene_ray.search.query.FeatureQuery`.

    ``extra_fields`` maps additional field names to source columns; their
    terms share the segment dictionary under field-prefixed keys with
    per-field norms (index/fields.py) — the multi-field Document model
    (document/Document.java:40).

    ``stored_source``: parquet path whose rows are the index's stored
    fields (Searcher.fetch_docs — the storedFields().document(docid) role);
    defaults to ``source`` when that is a path. Originals stay in Parquet
    rather than being re-written into segments: fetch is a pruned
    predicate-pushdown read, and the index never duplicates the corpus."""
    manifest_rows = _build_segments(
        source, index_dir, analyzer, text_col, id_col, num_segments,
        with_positions, extra_fields, features, field_analyzers,
        string_values, field_options,
    )
    segments = sorted(manifest_rows, key=lambda r: r["doc_base"])
    # Segment doc ranges are contiguous when the input's block layout is
    # (parquet fragments read in order), but Ray's streaming executor may
    # interleave rows across blocks after a repartition — merge.py therefore
    # re-sorts per-term posting runs by actual doc id rather than assuming
    # range-disjoint segments. Duplicate doc ids across segments are caught
    # at merge time.

    doc_count, sum_ttf = logical_doc_stats(segments)

    stats_name = _write_global_stats(index_dir, segments)

    # per-extra-field global sum_ttf (avgdl differs per field)
    fields: dict[str, dict] = {}
    for f, col in sorted((extra_fields or {}).items()):
        fields[f] = {
            "col": col,
            "sum_ttf": sum(
                json.loads(r.get("field_ttf_json") or "{}").get(f, 0)
                for r in segments
            ),
        }
        if field_analyzers and f in field_analyzers:
            fields[f]["analyzer"] = analyzer_dict(field_analyzers[f])

    manifest = {
        "stats_dir": stats_name,
        "codec": CODEC_VERSION,
        "doc_count": doc_count,
        "sum_total_term_freq": sum_ttf,
        "text_col": text_col,
        "id_col": id_col,
        "with_positions": with_positions,
        "field_options": {(k if k is not None else ""): v
                          for k, v in sorted((field_options or {}).items(),
                                             key=lambda kv: kv[0] or "")},
        "fields": fields,
        "features": {n: {"col": c} for n, c in sorted((features or {}).items())},
        "stored_source": stored_source or (source if isinstance(source, str) else None),
        "analyzer": analyzer_dict(analyzer),
        "segments": [
            {k: r.get(k) for k in (
                "segment_id", "path", "doc_base", "max_doc_id", "doc_count",
                "sum_total_term_freq", "n_terms", "postings_bytes",
                "fingerprint", "build_secs", "terms_per_sec", "skipped",
                "field_ttf_json",
            )}
            for r in segments
        ],
    }
    from lucene_ray.index.commits import commit_manifest

    return commit_manifest(index_dir, manifest)


def add_documents(
    source: "ray.data.Dataset | str",
    index_dir: str,
    num_segments: int | None = None,
) -> dict:
    """Incremental indexing: add new docs (ids disjoint from the existing
    index) as NEW segments, recompute global stats over the union, and
    commit an updated manifest — the NRT add/flush model (new segments
    appear, old segments untouched; IndexWriter.addDocument + commit).
    Combined with deletes.delete_docs this gives updateDocument semantics:
    delete old version's ids, add the new rows."""
    m = load_manifest(index_dir)
    analyzer = analyzer_from_manifest(m)
    new_rows = _build_segments(
        source, index_dir, analyzer, m["text_col"], m["id_col"],
        num_segments, m["with_positions"],
        {f: i["col"] for f, i in m.get("fields", {}).items()} or None,
        {n: i["col"] for n, i in m.get("features", {}).items()} or None,
        field_analyzers_from_manifest(m) or None,
    )
    old_keys = {s["segment_id"] for s in m["segments"]}
    combined = list(m["segments"]) + [
        {k: r.get(k) for k in (
            "segment_id", "path", "doc_base", "max_doc_id", "doc_count",
            "sum_total_term_freq", "n_terms", "postings_bytes",
            "fingerprint", "build_secs", "terms_per_sec", "skipped",
            "field_ttf_json",
        )}
        for r in new_rows
        if r["segment_id"] not in old_keys
    ]
    segments = sorted(combined, key=lambda r: r["doc_base"])
    stats_name = _write_global_stats(index_dir, segments)
    manifest = dict(m)
    manifest["stats_dir"] = stats_name
    # keep stored-field fetch complete after incremental adds: record the
    # added rows as an extra stored source (fetch_docs unions them). A
    # Dataset source has no path, so persist it under the index dir —
    # that's the Lucene model anyway (stored fields live in the segment).
    if m.get("stored_source"):
        extra = list(m.get("stored_sources", []))
        if isinstance(source, str):
            if source != m["stored_source"] and source not in extra:
                extra.append(source)
        else:
            add_dir = os.path.join(index_dir, f"stored_add-{uuid.uuid4().hex[:8]}")
            source.write_parquet(add_dir)
            extra.append(add_dir)
        manifest["stored_sources"] = extra
    manifest["doc_count"], manifest["sum_total_term_freq"] = logical_doc_stats(segments)
    _fttf = logical_field_ttf(segments)
    for f in manifest.get("fields", {}):
        manifest["fields"][f]["sum_ttf"] = _fttf.get(f, 0)
    manifest["segments"] = segments
    from lucene_ray.index.commits import commit_manifest

    return commit_manifest(index_dir, manifest)


def ram_index_dir(prefix: str = "lucene_ray_ram_") -> str:
    """A memory-resident index directory — the ByteBuffersDirectory role
    (store/ByteBuffersDirectory.java): segments live in tmpfs (/dev/shm),
    so every read path (mmap included) is RAM-backed with zero disk I/O.
    The directory layout and every API are identical to FS indexes; the
    caller owns cleanup (shutil.rmtree). Falls back to the default temp
    dir when no tmpfs is mounted."""
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def analyzer_dict(analyzer: Analyzer) -> dict:
    """JSON form of an analyzer config (manifest round-trip)."""
    return {
        "lowercase": analyzer.lowercase,
        "stop_words": sorted(analyzer.stop_words),
        "max_token_length": analyzer.max_token_length,
        "stem": analyzer.stem,
        "stem_lang": analyzer.stem_lang,
        "hunspell": list(analyzer.hunspell) if analyzer.hunspell else None,
        "ascii_fold": analyzer.ascii_fold,
        "cjk_width": analyzer.cjk_width,
        "icu_fold": analyzer.icu_fold,
        "icu_normalize": analyzer.icu_normalize,
        "phonetic": analyzer.phonetic,
        "common_grams": (sorted(analyzer.common_grams)
                         if analyzer.common_grams else None),
        "compound_dict": (sorted(analyzer.compound_dict)
                          if analyzer.compound_dict else None),
        "compound_min_word": analyzer.compound_min_word,
        "compound_min_sub": analyzer.compound_min_sub,
        "compound_max_sub": analyzer.compound_max_sub,
        "compound_longest": analyzer.compound_longest,
        "synonyms": [[src, list(dsts)] for src, dsts in analyzer.synonyms],
        "payload_delimiter": analyzer.payload_delimiter,
        "word_delimiter": analyzer.word_delimiter,
        "ja_segment": analyzer.ja_segment,
        "segment_lang": analyzer.segment_lang,
        "cjk_bigrams": analyzer.cjk_bigrams,
        "length_min": analyzer.length_min,
        "length_max": analyzer.length_max,
        "keyword_repeat": analyzer.keyword_repeat,
        "char_filters": [[p, r] for p, r in analyzer.char_filters],
        "discount_overlaps": analyzer.discount_overlaps,
        "elision": sorted(analyzer.elision) if analyzer.elision else None,
        "decimal_digit": analyzer.decimal_digit,
        "scandinavian": analyzer.scandinavian,
        "truncate_length": analyzer.truncate_length,
        "keep_words": (sorted(analyzer.keep_words)
                       if analyzer.keep_words is not None else None),
        "tokenizer": analyzer.tokenizer,
        "tokenizer_pattern": analyzer.tokenizer_pattern,
        "path_delimiter": analyzer.path_delimiter,
        "path_replacement": analyzer.path_replacement,
        "path_skip": analyzer.path_skip,
        "url_email": analyzer.url_email,
        "reverse_tokens": analyzer.reverse_tokens,
        "mapping_char_filter": ([[s, r] for s, r in
                                 analyzer.mapping_char_filter]
                                if analyzer.mapping_char_filter else None),
        "apostrophe": analyzer.apostrophe,
        "capitalization": analyzer.capitalization,
        "keyword_set": (sorted(analyzer.keyword_set)
                        if analyzer.keyword_set is not None else None),
        "stem_overrides": [[t, s] for t, s in analyzer.stem_overrides],
        "limit_token_count": analyzer.limit_token_count,
        "tf_delimiter": analyzer.tf_delimiter,
        "hyphenated_words": analyzer.hyphenated_words,
        "trim": analyzer.trim,
        "pattern_replace": (list(analyzer.pattern_replace)
                            if analyzer.pattern_replace else None),
        "protected_words": (sorted(analyzer.protected_words)
                            if analyzer.protected_words is not None
                            else None),
        "pattern_capture": (list(analyzer.pattern_capture)
                            if analyzer.pattern_capture else None),
        "remove_duplicates": analyzer.remove_duplicates,
        "date_recognizer": analyzer.date_recognizer,
        "english_possessive": analyzer.english_possessive,
        "minimal_stem": analyzer.minimal_stem,
    }


def analyzer_from_dict(a: dict) -> Analyzer:
    return Analyzer(
        lowercase=a["lowercase"],
        stop_words=frozenset(a["stop_words"]),
        max_token_length=a["max_token_length"],
        stem=a.get("stem", False),
        stem_lang=a.get("stem_lang"),
        hunspell=tuple(a["hunspell"]) if a.get("hunspell") else None,
        ascii_fold=a.get("ascii_fold", False),
        cjk_width=a.get("cjk_width", False),
        icu_fold=a.get("icu_fold", False),
        icu_normalize=a.get("icu_normalize"),
        phonetic=a.get("phonetic"),
        common_grams=(tuple(a["common_grams"])
                      if a.get("common_grams") else None),
        compound_dict=(tuple(a["compound_dict"])
                       if a.get("compound_dict") else None),
        compound_min_word=a.get("compound_min_word", 5),
        compound_min_sub=a.get("compound_min_sub", 2),
        compound_max_sub=a.get("compound_max_sub", 15),
        compound_longest=a.get("compound_longest", False),
        synonyms=tuple(
            (src, tuple(dsts)) for src, dsts in a.get("synonyms", [])
        ),
        payload_delimiter=a.get("payload_delimiter"),
        word_delimiter=a.get("word_delimiter", False),
        ja_segment=a.get("ja_segment", False),
        segment_lang=a.get("segment_lang"),
        cjk_bigrams=a.get("cjk_bigrams", False),
        length_min=a.get("length_min", 0),
        length_max=a.get("length_max"),
        keyword_repeat=a.get("keyword_repeat", False),
        char_filters=tuple((p, r) for p, r in a.get("char_filters", [])),
        discount_overlaps=a.get("discount_overlaps", False),
        elision=tuple(a["elision"]) if a.get("elision") else None,
        decimal_digit=a.get("decimal_digit", False),
        scandinavian=a.get("scandinavian"),
        truncate_length=a.get("truncate_length"),
        keep_words=(frozenset(a["keep_words"])
                    if a.get("keep_words") is not None else None),
        tokenizer=a.get("tokenizer"),
        tokenizer_pattern=(tuple(a["tokenizer_pattern"])
                           if a.get("tokenizer_pattern") else None),
        path_delimiter=a.get("path_delimiter", "/"),
        path_replacement=a.get("path_replacement"),
        path_skip=a.get("path_skip", 0),
        url_email=a.get("url_email", False),
        reverse_tokens=a.get("reverse_tokens", False),
        mapping_char_filter=(tuple((s, r) for s, r in
                                   a["mapping_char_filter"])
                             if a.get("mapping_char_filter") else ()),
        apostrophe=a.get("apostrophe", False),
        capitalization=a.get("capitalization", False),
        keyword_set=(frozenset(a["keyword_set"])
                     if a.get("keyword_set") is not None else None),
        stem_overrides=tuple(
            (t, s) for t, s in a.get("stem_overrides", [])),
        limit_token_count=a.get("limit_token_count"),
        tf_delimiter=a.get("tf_delimiter"),
        hyphenated_words=a.get("hyphenated_words", False),
        trim=a.get("trim", False),
        pattern_replace=(tuple(a["pattern_replace"])
                         if a.get("pattern_replace") else None),
        protected_words=(frozenset(a["protected_words"])
                         if a.get("protected_words") is not None else None),
        pattern_capture=(tuple(a["pattern_capture"])
                         if a.get("pattern_capture") else None),
        remove_duplicates=a.get("remove_duplicates", False),
        date_recognizer=a.get("date_recognizer"),
        english_possessive=a.get("english_possessive", False),
        minimal_stem=a.get("minimal_stem", False),
    )


def analyzer_from_manifest(m: dict) -> Analyzer:
    return analyzer_from_dict(m["analyzer"])


def field_analyzers_from_manifest(m: dict) -> "dict[str, Analyzer]":
    """Per-field analyzer overrides (PerFieldAnalyzerWrapper,
    analysis/miscellaneous/PerFieldAnalyzerWrapper.java:51) recorded at
    build time; empty when every field shares the default."""
    return {
        f: analyzer_from_dict(info["analyzer"])
        for f, info in m.get("fields", {}).items()
        if info.get("analyzer")
    }


def load_manifest(index_dir: str, generation: "int | None" = None) -> dict:
    """The live manifest, or — with ``generation`` — a surviving commit
    point's (DirectoryReader.open(IndexCommit): a point-in-time view;
    pin the generation with commits.snapshot first or the next commit
    prunes it)."""
    if generation is not None:
        path = os.path.join(index_dir, "commits", f"segments_{generation}.json")
        if not os.path.exists(path):
            raise ValueError(
                f"commit point {generation} not found under {index_dir!r}")
        with open(path) as f:
            m = json.load(f)
    else:
        with open(os.path.join(index_dir, "manifest.json")) as f:
            m = json.load(f)
    # refuse to mis-decode an index written by a different blob layout
    # (Codec.getName() gate, index/SegmentInfos.java's codec check);
    # pre-v3 manifests carry no "codec" key
    found = m.get("codec", 2)
    if found != CODEC_VERSION:
        raise ValueError(
            f"index at {index_dir} uses codec v{found}, this build reads "
            f"v{CODEC_VERSION} — rebuild the index (cached dirs under "
            f"/tmp/lucene_ray_idx rebuild automatically)"
        )
    return m


def stats_path(index_dir: str, manifest: "dict | None" = None) -> str:
    """Resolve the manifest's global-stats directory (versioned
    ``stats_dir`` when present, legacy ``global_terms`` otherwise)."""
    if manifest is None:
        manifest = load_manifest(index_dir)
    return os.path.join(index_dir, manifest.get("stats_dir", "global_terms"))


def read_global_term_stats(index_dir: str, terms: list[str] | None = None,
                           manifest: "dict | None" = None) -> pa.Table:
    """Global (df, ttf) per term; with ``terms`` given, prunes via parquet
    predicate pushdown (the table is term-sorted, so row groups prune)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(stats_path(index_dir, manifest), format="parquet")
    if terms is None:
        return dset.to_table()
    return dset.to_table(filter=pads.field("term").isin(terms))


def add_indexes(dst_index_dir: str, src_index_dirs: list[str]) -> dict:
    """Import foreign indexes' segments wholesale — metadata + file copy
    with NO re-indexing (IndexWriter.addIndexes(Directory...),
    index/IndexWriter.java:3051 / misc/IndexMergeTool.java): the model for
    a distributed build where N independent builders each produce an index
    shard and one writer ingests them. Doc-id spaces must be disjoint
    (ours are global, so shard builds over disjoint inputs satisfy this);
    duplicate doc ids surface at the next force_merge. Global term stats
    recompute over the union; tombstones union too."""
    import shutil

    from lucene_ray.index.deletes import delete_docs, load_tombstones

    m = load_manifest(dst_index_dir)
    combined = {s["segment_id"]: s for s in m["segments"]}
    seg_parent = os.path.join(dst_index_dir, "segments")
    os.makedirs(seg_parent, exist_ok=True)
    all_tombs = [load_tombstones(dst_index_dir)]
    for src in src_index_dirs:
        sm = load_manifest(src)
        for s in sm["segments"]:
            if s["segment_id"] in combined:
                continue
            dst_path = os.path.join(seg_parent, s["segment_id"])
            if not os.path.isdir(dst_path):
                tmp = dst_path + f".tmp-{uuid.uuid4().hex[:8]}"
                shutil.copytree(s["path"], tmp)
                os.replace(tmp, dst_path)
            combined[s["segment_id"]] = {**s, "path": dst_path}
        all_tombs.append(load_tombstones(src))

    segments = sorted(combined.values(), key=lambda r: r["doc_base"])
    stats_name = _write_global_stats(dst_index_dir, segments)
    import numpy as np

    tombs = np.unique(np.concatenate(all_tombs)) if any(t.size for t in all_tombs) else None
    if tombs is not None and tombs.size:
        # defer the commit: the combined manifest below commits ONE point
        # whose frozen tombstones match its segment set (a mid-operation
        # commit would pair the OLD manifest with the NEW tombstones)
        delete_docs(dst_index_dir, tombs, commit=False)

    manifest = dict(m)
    manifest["stats_dir"] = stats_name
    manifest["doc_count"], manifest["sum_total_term_freq"] = logical_doc_stats(segments)
    manifest["segments"] = segments
    from lucene_ray.index.commits import commit_manifest

    return commit_manifest(dst_index_dir, manifest)
