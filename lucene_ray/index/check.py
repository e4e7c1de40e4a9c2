"""Offline index validator — the CheckIndex role
(lucene/core/src/java/org/apache/lucene/index/CheckIndex.java:113):
re-read a committed index end-to-end and verify every invariant the
custom codec and the manifest promise, WITHOUT trusting any cached stat.

Per segment (each check independent → runs as a Ray task per segment,
the distributable shape; a 100-TB index checks as wide as the cluster):

* term dictionary strictly sorted; (offset, length) table in-bounds and
  gap-free against ``postings.bin``'s size
* every blob bulk-decodes (``decode_many`` cross-checks the skip table
  against the length table); per-term df == decoded posting count,
  ttf == sum of decoded freqs; doc ids strictly increasing, within
  [0, max_doc - doc_base]
* docs table: doc_count rows, ids within [doc_base, max_doc_id],
  ``norm`` == SmallFloat(doc_len) recomputed; postings norms match the
  docs-table norm of their doc (per field section)
* positions (when present): per-term position count == ttf

Index level:

* manifest doc_count / sum_total_term_freq == logical segment stats
  (term-sharded groups sharing one doc space counted ONCE)
* global_terms == per-term df/ttf sums over all segments, and sorted
* shared positions dirs (term-sharded shard groups) validated once per
  group: per-term occurrence count == summed ttf over the group's shards

Raises :class:`CheckIndexError` listing every failure (a pytest corrupts
one byte and sees it caught); returns a stats report when clean.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class CheckIndexError(Exception):
    def __init__(self, problems: list):
        self.problems = problems
        super().__init__(
            f"{len(problems)} problem(s) found:\n" + "\n".join(problems)
        )


def _check_segment(path: str) -> dict:
    """All per-segment invariants; returns stats + problems list."""
    from lucene_ray.codec.postings import decode_many
    from lucene_ray.index.fields import FIELD_MARK, split_key
    from lucene_ray.util.smallfloat import int_to_byte4_array

    problems: list[str] = []
    seg = os.path.basename(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    doc_base = int(meta["doc_base"])
    max_doc = int(meta["max_doc_id"])

    t = pq.read_table(os.path.join(path, "terms.parquet"))
    terms = np.asarray(t["term"].to_pylist(), dtype=object)
    df = t["df"].to_numpy()
    ttf = t["ttf"].to_numpy()
    offsets = t["offset"].to_numpy()
    lengths = t["length"].to_numpy()

    if terms.shape[0] > 1 and not np.all(terms[:-1] < terms[1:]):
        problems.append(f"{seg}: term dictionary not strictly sorted")
    pbin = os.path.join(path, "postings.bin")
    psize = os.path.getsize(pbin)
    if terms.shape[0]:
        if (offsets < 0).any() or (lengths < 0).any():
            problems.append(f"{seg}: negative blob offset/length")
        if (offsets + lengths > psize).any():
            problems.append(f"{seg}: blob table exceeds postings.bin size")

    docs_path = meta.get("docs_path") or os.path.join(path, "docs.parquet")
    dt = pq.read_table(docs_path)
    doc_ids = dt["doc_id"].to_numpy()
    doc_len = dt["doc_len"].to_numpy()
    if doc_ids.shape[0] != int(meta["doc_count"]):
        problems.append(
            f"{seg}: docs table rows {doc_ids.shape[0]} != meta doc_count "
            f"{meta['doc_count']}"
        )
    if doc_ids.shape[0]:
        if int(doc_ids.min()) < doc_base or int(doc_ids.max()) > max_doc:
            problems.append(f"{seg}: doc ids outside [doc_base, max_doc_id]")
        if not np.all(np.diff(doc_ids) > 0):
            problems.append(f"{seg}: docs table not doc_id-sorted")
    want_norm = int_to_byte4_array(doc_len.astype(np.int64))
    got_norm = dt["norm"].to_numpy().astype(np.int64)
    if not np.array_equal(want_norm & 0xFF, got_norm & 0xFF):
        problems.append(f"{seg}: docs-table norm != SmallFloat(doc_len)")

    # decode EVERYTHING (the length/skip cross-check lives in decode_many)
    buf = (
        np.memmap(pbin, dtype=np.uint8, mode="r")
        if psize else np.empty(0, np.uint8)
    )
    decoded_ttf = 0
    if terms.shape[0]:
        try:
            docs, freqs, norms, starts = decode_many(buf, offsets, lengths)
        except Exception as e:  # corrupt framing
            problems.append(f"{seg}: blob decode failed: {e}")
            docs = None
        if docs is not None:
            got_df = np.diff(starts)
            if not np.array_equal(got_df, df):
                bad = terms[got_df != df][:3]
                problems.append(f"{seg}: decoded df != terms.df (e.g. {bad})")
            got_ttf = np.zeros(terms.shape[0], dtype=np.int64)
            np.add.at(got_ttf, np.repeat(np.arange(terms.shape[0]), got_df),
                      freqs.astype(np.int64))
            if not np.array_equal(got_ttf, ttf):
                bad = terms[got_ttf != ttf][:3]
                problems.append(f"{seg}: decoded ttf != terms.ttf (e.g. {bad})")
            decoded_ttf = int(freqs.sum())
            term_of = np.repeat(np.arange(terms.shape[0]), got_df)
            inc = np.diff(docs) > 0
            breaks = np.diff(term_of) != 0
            if not np.all(inc | breaks):
                problems.append(f"{seg}: postings doc ids not strictly increasing")
            if docs.shape[0] and (
                docs.min() < 0 or docs.max() > max_doc - doc_base
            ):
                problems.append(f"{seg}: posting doc ids out of segment range")
            # norms in postings == docs-table norm of that doc, per field
            field_of = np.asarray(
                [split_key(x)[0] if x.startswith(FIELD_MARK) else None
                 for x in terms], dtype=object
            )
            rows = np.searchsorted(doc_ids, docs + doc_base)
            rows = np.clip(rows, 0, max(doc_ids.shape[0] - 1, 0))
            for fld in set(field_of.tolist()):
                col = "norm" if fld is None else f"norm_{fld}"
                if col not in dt.column_names:
                    problems.append(f"{seg}: docs table missing column {col}")
                    continue
                ref = dt[col].to_numpy().astype(np.int64)
                sel = np.isin(term_of, np.nonzero(field_of == fld)[0])
                if not np.array_equal(
                    norms[sel].astype(np.int64), ref[rows[sel]] & 0xFF
                ):
                    problems.append(
                        f"{seg}: posting norms disagree with docs table "
                        f"(field={fld or 'default'})"
                    )

    # positions: per-term count == ttf. A term-sharded (force_merge)
    # segment shares ONE positions dir across the whole shard group
    # (meta.positions_path) holding terms of EVERY shard — per-shard
    # comparison is impossible (a boundary-straddling term owns only a
    # slice of its positions here), so shared dirs are checked ONCE at
    # the index level against the global ttf aggregation instead.
    shared_pos_path = None
    pos_path = meta.get("positions_path")
    local_pos = os.path.join(path, "positions.parquet")
    if os.path.exists(local_pos):
        pos_path = local_pos
    elif pos_path:
        shared_pos_path = pos_path
        pos_path = None
    if pos_path and os.path.exists(pos_path) and terms.shape[0]:
        pt = pq.read_table(pos_path, columns=["term"])
        pterms, pcounts = np.unique(
            np.asarray(pt["term"].to_pylist(), dtype=object), return_counts=True
        )
        idx = np.searchsorted(terms, pterms)
        ok = idx < terms.shape[0]
        known = np.zeros(pterms.shape[0], dtype=bool)
        known[ok] = terms[idx[ok]] == pterms[ok]
        if not known.all():
            problems.append(f"{seg}: positions contain unknown terms")
        elif not np.array_equal(pcounts, ttf[idx]):
            problems.append(f"{seg}: per-term position count != ttf")

    return {
        "segment": seg,
        "problems": problems,
        "n_terms": int(terms.shape[0]),
        "decoded_postings": int(df.sum()) if terms.shape[0] else 0,
        "decoded_ttf": decoded_ttf,
        "term_stats": (terms, df, ttf),
        "shared_pos_path": shared_pos_path,
    }


def check_index(index_dir: str, verbose: bool = False,
                distributed: "bool | None" = None) -> dict:
    """Validate a committed index; raise CheckIndexError on any problem.

    Per-segment checks are independent; with ``distributed=True`` (auto
    when the index has > 16 segments) they fan out as one Ray task per
    segment — a web-scale index validates as wide as the cluster instead
    of serially on the driver."""
    from lucene_ray.index.merge import logical_doc_stats

    with open(os.path.join(index_dir, "manifest.json")) as f:
        m = json.load(f)
    problems: list[str] = []
    segs = sorted(m["segments"], key=lambda s: s["doc_base"])
    missing = [s for s in segs if not os.path.isdir(s["path"])]
    problems.extend(f"missing segment dir {s['path']}" for s in missing)
    present = [s for s in segs if os.path.isdir(s["path"])]
    if distributed is None:
        distributed = len(present) > 16
    if distributed and present:
        import ray

        check_remote = ray.remote(num_cpus=1)(_check_segment)
        reports = ray.get([check_remote.remote(s["path"]) for s in present])
    else:
        reports = [_check_segment(s["path"]) for s in present]
    for r in reports:
        problems.extend(r["problems"])
        if verbose:
            print(f"[check_index] {r['segment']}: {r['n_terms']} terms, "
                  f"{r['decoded_postings']} postings decoded, "
                  f"{len(r['problems'])} problem(s)")

    # shared positions dirs (term-sharded force_merge output): one dir
    # serves a whole shard group, so validate it ONCE against the group's
    # summed per-term ttf (a boundary-straddling term's ttf sums across
    # its shards back to the full per-term occurrence count).
    by_shared: dict = {}
    for r in reports:
        sp = r.get("shared_pos_path")
        if sp:
            by_shared.setdefault(sp, []).append(r)
    for sp, group in by_shared.items():
        if not os.path.exists(sp):
            problems.append(f"shared positions dir missing: {sp}")
            continue
        want: dict = {}
        for r in group:
            terms, _df, ttf = r["term_stats"]
            for i in range(terms.shape[0]):
                want[terms[i]] = want.get(terms[i], 0) + int(ttf[i])
        got: dict = {}
        import pyarrow.dataset as pads

        for frag_batch in pads.dataset(sp, format="parquet").to_batches(
            columns=["term"], batch_size=1 << 20
        ):
            fterms, fcounts = np.unique(
                np.asarray(frag_batch["term"].to_pylist(), dtype=object),
                return_counts=True,
            )
            for i in range(fterms.shape[0]):
                got[fterms[i]] = got.get(fterms[i], 0) + int(fcounts[i])
        unknown = [t_ for t_ in got if t_ not in want]
        if unknown:
            problems.append(
                f"shared positions {sp}: {len(unknown)} unknown term(s), "
                f"e.g. {unknown[0]!r}"
            )
        else:
            bad = [t_ for t_, c in got.items() if want[t_] != c]
            if bad:
                problems.append(
                    f"shared positions {sp}: per-term position count != "
                    f"summed ttf for {len(bad)} term(s), e.g. {bad[0]!r}"
                )

    doc_count, sum_ttf = logical_doc_stats(segs)
    if doc_count != m["doc_count"]:
        problems.append(
            f"manifest doc_count {m['doc_count']} != logical {doc_count}"
        )
    if sum_ttf != m["sum_total_term_freq"]:
        problems.append(
            f"manifest sum_total_term_freq {m['sum_total_term_freq']} "
            f"!= logical {sum_ttf}"
        )

    # global term stats == per-term sums over all segments
    from lucene_ray.index.build import stats_path

    gt = pq.read_table(stats_path(index_dir, m))
    g_terms = np.asarray(gt["term"].to_pylist(), dtype=object)
    if g_terms.shape[0] > 1 and not np.all(g_terms[:-1] < g_terms[1:]):
        problems.append("global_terms not strictly sorted")
    agg: dict = {}
    for r in reports:
        terms, df, ttf = r["term_stats"]
        for i in range(terms.shape[0]):
            cur = agg.get(terms[i])
            if cur is None:
                agg[terms[i]] = [int(df[i]), int(ttf[i])]
            else:
                cur[0] += int(df[i])
                cur[1] += int(ttf[i])
    g_df = gt["df"].to_numpy()
    g_ttf = gt["ttf"].to_numpy()
    if len(agg) != g_terms.shape[0]:
        problems.append(
            f"global_terms has {g_terms.shape[0]} terms, segments have {len(agg)}"
        )
    else:
        for i, term in enumerate(g_terms):
            want = agg.get(term)
            if want is None or want[0] != g_df[i] or want[1] != g_ttf[i]:
                problems.append(f"global_terms stats wrong for {term!r}")
                break

    # numeric DV update generations (index/docvalues.py): readable, schema
    # (doc_id, value), ids within the index's doc id space
    dv_dir = os.path.join(index_dir, "dv_updates")
    if os.path.isdir(dv_dir):
        import glob as _glob

        from lucene_ray.index.docvalues import load_dv_updates

        from lucene_ray.index.docvalues import load_string_dv_updates

        try:
            merged = load_dv_updates(dv_dir)
        except Exception as e:  # noqa: BLE001 — a corrupt overlay is a finding
            problems.append(f"dv_updates unreadable: {e}")
            merged = {}
        try:
            smerged = load_string_dv_updates(dv_dir)
        except Exception as e:  # noqa: BLE001
            problems.append(f"string dv_updates unreadable: {e}")
            smerged = {}
        max_id = max((int(s["doc_base"]) + int(s["doc_count"])
                      for s in m["segments"]), default=0)
        for name, (ids, _vals) in merged.items():
            if ids.shape[0] and (ids.max() >= max_id or ids.min() < 0):
                problems.append(
                    f"dv_updates[{name}]: doc ids outside [0, {max_id})")
        for name, (ids, vals) in smerged.items():
            if ids.shape[0] and (ids.max() >= max_id or ids.min() < 0):
                problems.append(
                    f"string dv_updates[{name}]: doc ids outside [0, {max_id})")
            if vals.null_count:
                problems.append(
                    f"string dv_updates[{name}]: null values")
        n_dv_files = len(_glob.glob(os.path.join(dv_dir, "feat_*.parquet"))) \
            + len(_glob.glob(os.path.join(dv_dir, "bin_*.parquet")))
    else:
        n_dv_files = 0

    if problems:
        raise CheckIndexError(problems)
    return {
        "segments": len(reports),
        "dv_update_files": n_dv_files,
        "doc_count": doc_count,
        "sum_total_term_freq": sum_ttf,
        "n_terms": int(g_terms.shape[0]),
        "postings": int(sum(r["decoded_postings"] for r in reports)),
    }


def _check_segment_safe(path: str) -> dict:
    """_check_segment, but a segment too corrupt to even open (missing
    meta, truncated parquet) reports as a problem instead of raising —
    exorcise must classify it, not die on it."""
    try:
        return _check_segment(path)
    except Exception as e:  # noqa: BLE001 — any failure marks the segment
        return {"segment": os.path.basename(path),
                "problems": [f"unreadable segment: {e}"]}


def exorcise_index(index_dir: str,
                   distributed: "bool | None" = None) -> dict:
    """CheckIndex -exorcise (CheckIndex.java:4079 exorciseIndex): write a
    NEW commit generation whose segment list excludes every segment that
    fails validation, so the index serves again from the surviving docs.

    Like the reference, this LOSES the documents of the dropped segments
    — it repairs availability, not data. Good segments are never
    touched: the repair is one new ``commits/segments_<gen>.json`` (plus
    a rebuilt content-addressed global-stats dir for the surviving set)
    and a manifest swing, both via the commit machinery
    (index/commits.py), so snapshots of the corrupt generation remain
    openable. Term-sharded merge outputs drop as a whole SHARD GROUP
    (the shards share one doc space — serving a partial dictionary
    would silently miss terms). Returns {'dropped': [paths],
    'generation': gen, 'doc_count': n}."""
    with open(os.path.join(index_dir, "manifest.json")) as f:
        m = json.load(f)
    segs = m["segments"]
    present = [s for s in segs if os.path.isdir(s["path"])]
    bad_paths = {s["path"] for s in segs if not os.path.isdir(s["path"])}
    if distributed is None:
        distributed = len(present) > 16
    if distributed and present:
        import ray

        check_remote = ray.remote(num_cpus=1)(_check_segment_safe)
        reports = ray.get([check_remote.remote(s["path"]) for s in present])
    else:
        reports = [_check_segment_safe(s["path"]) for s in present]
    for s, r in zip(present, reports):
        if r["problems"]:
            bad_paths.add(s["path"])

    def group_key(s: dict) -> str:
        return s.get("docs_path") or s["path"]

    bad_groups = {group_key(s) for s in segs if s["path"] in bad_paths}
    good = [s for s in segs if group_key(s) not in bad_groups]
    dropped = [s["path"] for s in segs if group_key(s) in bad_groups]
    if not dropped:
        return {"dropped": [], "generation": m.get("generation"),
                "doc_count": m["doc_count"]}

    from lucene_ray.index.build import _write_global_stats, logical_doc_stats
    from lucene_ray.index.commits import commit_manifest

    new = dict(m)
    new["segments"] = good
    dc, ttf = logical_doc_stats(good)
    new["doc_count"] = dc
    new["sum_total_term_freq"] = ttf
    new["stats_dir"] = _write_global_stats(index_dir, good)
    new.pop("generation", None)
    committed = commit_manifest(index_dir, new)
    return {"dropped": sorted(dropped),
            "generation": committed.get("generation"),
            "doc_count": dc}


def check_vector_index(index_dir: str) -> dict:
    """Offline validation for the persisted VECTOR index families — the
    CheckIndex role extended to hnsw/ivf/pq/ivfpq/sq artifacts
    (manifests written by index/vector.py). Verifies, per kind, every
    invariant a searcher assumes without re-deriving it:

    * manifest present and self-consistent (dims, counts, paths exist)
    * hnsw: every shard dir loads; ids unique across shards; vector rows
      == manifest n per shard
    * ivf / ivfpq: every stored ``bucket_id`` < n_centroids and equal to
      its hive partition; ids unique
    * pq / ivfpq / sq: code width == m (or dim for sq); codes decode (a
      uint8 read of the fixed-size list round-trips); centroid/codebook
      arrays have the manifested shapes

    Raises :class:`CheckIndexError` listing every failure; returns a
    small stats report when clean.
    """
    import glob as _glob
    import json as _json

    import pyarrow.parquet as _pq

    problems: list[str] = []
    report: dict = {"dir": index_dir}

    def _codes_ok(files, width, label):
        seen = []
        for f in files:
            t = _pq.read_table(f)
            codes = t["code"]
            if isinstance(codes, pa.ChunkedArray):
                codes = codes.combine_chunks()
            flat = codes.flatten()
            if len(flat) != t.num_rows * width:
                problems.append(
                    f"{label}: {f}: code width != {width}")
            seen.append(t)
        return seen

    manifests = {
        "hnsw": "vector_manifest.json",
        "pq": "pq_manifest.json",
        "ivfpq": "ivfpq_manifest.json",
        "sq": "sq_manifest.json",
    }
    found = None
    for kind, name in manifests.items():
        p = os.path.join(index_dir, name)
        if os.path.exists(p):
            with open(p) as f:
                man = _json.load(f)
            found = man.get("kind", kind)
            break
    if found is None:
        raise CheckIndexError([f"{index_dir}: no vector manifest found"])
    report["kind"] = found

    if found == "hnsw":
        from lucene_ray.pipelines.hnsw import HnswGraph

        all_ids = []
        for sh in man["shards"]:
            try:
                g = HnswGraph.load(sh["path"])
            except Exception as e:  # noqa: BLE001 — report, don't crash
                problems.append(f"shard {sh['path']}: load failed: {e}")
                continue
            if g.ids.shape[0] != sh["n"]:
                problems.append(
                    f"shard {sh['path']}: {g.ids.shape[0]} ids != "
                    f"manifest n {sh['n']}")
            all_ids.append(g.ids)
        if all_ids:
            ids = np.concatenate(all_ids)
            if np.unique(ids).shape[0] != ids.shape[0]:
                problems.append("duplicate vec ids across shards")
            report["n_vectors"] = int(ids.shape[0])
    elif found in ("ivf", "ivfpq"):
        cent_file = ("ivfpq_centroids.npy" if found == "ivfpq"
                     else "centroids.npy")
        cent = np.load(os.path.join(index_dir, cent_file))
        if cent.shape[0] != man["n_centroids"]:
            problems.append("centroids.npy shape != manifest n_centroids")
        bdir = man["buckets_dir"]
        if not os.path.isdir(bdir):
            bdir = os.path.join(
                index_dir, "pq_buckets" if found == "ivfpq" else "buckets")
        ids = []
        for d in sorted(_glob.glob(os.path.join(bdir, "bucket=*"))):
            want = int(d.rsplit("=", 1)[1])
            for f in sorted(_glob.glob(os.path.join(d, "*.parquet"))):
                t = _pq.read_table(f)
                b = t["bucket_id"].to_numpy()
                if (b != want).any():
                    problems.append(f"{f}: bucket_id != partition {want}")
                if (b >= man["n_centroids"]).any():
                    problems.append(f"{f}: bucket_id >= n_centroids")
                ids.append(t[man["id_col"]].to_numpy())
                if found == "ivfpq":
                    _codes_ok([f], man["m"], "ivfpq")
        if found == "ivfpq":
            books = np.load(os.path.join(index_dir, "ivfpq_codebooks.npy"))
            if books.shape[0] != man["m"]:
                problems.append("codebooks.npy m != manifest m")
        if ids:
            allv = np.concatenate(ids)
            if np.unique(allv).shape[0] != allv.shape[0]:
                problems.append("duplicate vec ids across buckets")
            report["n_vectors"] = int(allv.shape[0])
    elif found in ("pq", "sq"):
        width = man["m"] if found == "pq" else man["dim"]
        files = sorted(_glob.glob(os.path.join(man["codes_dir"], "*.parquet")))
        if not files:
            problems.append("no code files")
        n = 0
        idparts = []
        for t in _codes_ok(files, width, found):
            n += t.num_rows
            idparts.append(t[man["id_col"]].to_numpy())
        if idparts:
            allv = np.concatenate(idparts)
            if np.unique(allv).shape[0] != allv.shape[0]:
                problems.append("duplicate vec ids")
        report["n_vectors"] = n
        if found == "pq":
            books = np.load(os.path.join(index_dir, "codebooks.npy"))
            if books.shape[0] != man["m"]:
                problems.append("codebooks.npy m != manifest m")
        else:
            if not (man["scale"] > 0):
                problems.append("sq scale <= 0")

    if problems:
        raise CheckIndexError(problems)
    return report


def index_info(index_dir: str) -> dict:
    """Luke-style index overview (the luke module's Overview/Documents
    tab roles, lucene/luke/src/java/org/apache/lucene/luke/models/
    overview/OverviewImpl.java): one summary dict from the manifest plus
    tombstone/commit/DV-overlay facts — segment count, live/deleted
    docs, term and postings totals, per-field options, analyzer knobs
    that differ from defaults, commit generations, update-overlay
    generations. Reads ONLY metadata files (no postings decode) so it is
    instant on any index size."""
    import dataclasses
    import glob as _glob
    import json
    import os

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import load_manifest
    from lucene_ray.index.deletes import load_tombstones

    m = load_manifest(index_dir)
    segs = m["segments"]
    tombs = load_tombstones(index_dir)
    defaults = {f.name: getattr(Analyzer(), f.name)
                for f in dataclasses.fields(Analyzer)}
    an = m.get("analyzer", {})

    def _norm(x):
        # JSON round-trips tuples/frozensets to lists and () to [] —
        # compare shape-insensitively
        if isinstance(x, (list, tuple, set, frozenset)):
            x = tuple(sorted(
                (tuple(e) if isinstance(e, (list, tuple)) else e
                 for e in x), key=repr))
        return None if x == () else x

    non_default = {k: v for k, v in an.items()
                   if k in defaults and _norm(v) != _norm(defaults[k])}
    commits = sorted(
        int(os.path.basename(p).split("_")[1].split(".")[0])
        for p in _glob.glob(os.path.join(index_dir, "commits",
                                         "segments_*.json")))
    dv_gens = len(_glob.glob(os.path.join(index_dir, "dv_updates",
                                          "*_gen*.parquet")))
    vec = os.path.join(index_dir, "vector_manifest.json")
    info = {
        "codec": m.get("codec"),
        "generation": m.get("generation"),
        "n_segments": len(segs),
        "doc_count": m.get("doc_count"),
        "deleted_docs": int(tombs.shape[0]),
        "live_docs": int(m.get("doc_count", 0)) - int(tombs.shape[0]),
        "sum_total_term_freq": m.get("sum_total_term_freq"),
        "n_terms": int(sum(s.get("n_terms", 0) for s in segs)),
        "postings_bytes": int(sum(s.get("postings_bytes", 0)
                                  for s in segs)),
        "with_positions": m.get("with_positions", False),
        "fields": sorted(m.get("fields", {})),
        "features": sorted(m.get("features", {})),
        "field_options": m.get("field_options", {}),
        "analyzer_non_default": non_default,
        "commit_points": commits,
        "dv_update_files": dv_gens,
        "has_vector_index": os.path.exists(vec),
    }
    return info
