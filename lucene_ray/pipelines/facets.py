"""Faceting / grouping / sorting pipelines (SURVEY §2.6-§2.7):

* facet counts       — FacetsCollector + taxonomy counts
  (facet/FacetsCollector.java, FastTaxonomyFacetCounts.java:40):
  ``groupby(field).count()`` over (optionally query-filtered) docs.
* value histograms   — LongValueFacetCounts / range facets.
* distinct values    — DistinctValuesCollector.
* sampled facets     — RandomSamplingFacetsCollector via random_sample.
* top-k by field     — TopFieldCollector / Sort (search/TopFieldCollector.java:37).
* grouped top-k      — grouping module two-pass search
  (grouping/GroupingSearch.java:46): groupby(key).map_groups(head k).
* high-freq terms    — misc/HighFreqTerms.java:43 off the index's global
  term stats (already aggregated — no extra shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def facet_counts(ds, field: str):
    """Count per category value; result sorted by field for determinism."""
    return ds.groupby(field).count().sort(field)


def range_facets(ds, field: str, edges: list[float]):
    """Histogram over explicit bin edges (LongValueFacetCounts ranges)."""
    e = np.asarray(edges, dtype=np.float64)

    def bucketize(b: pa.Table) -> pa.Table:
        v = b[field].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(np.searchsorted(e, v, side="right") - 1, 0, len(e) - 2)
        return pa.table({"bucket": idx.astype(np.int64)})

    return ds.map_batches(bucketize, batch_format="pyarrow").groupby("bucket").count().sort("bucket")


def dynamic_range_facets(ds, field: str, n_buckets: int) -> pa.Table:
    """Equal-weight dynamic ranges — DynamicRangeUtil
    (facet/src/java/org/apache/lucene/facet/range/DynamicRangeUtil.java:41)
    with unit weights: split the value distribution into ``n_buckets``
    buckets of (as near as possible) equal doc count, NTILE semantics —
    the first ``total % n`` buckets take the extra row. Returns per
    bucket (1-based): count, min/max value, value sum.

    Distributed shape: ONE ``groupby(field).count()`` (only DISTINCT
    values shuffle — for a bounded-cardinality numeric field the
    histogram is tiny however large the corpus), then pure arithmetic on
    the cumulative histogram; tied values split across a boundary by
    count, which is exact for every per-bucket aggregate here since the
    split rows all carry the same value."""
    hist = ds.groupby(field).count().sort(field).to_pandas()
    vals = hist[field].to_numpy().astype(np.float64)
    cnts = hist["count()"].to_numpy().astype(np.int64)
    total = int(cnts.sum())
    sizes = np.full(n_buckets, total // n_buckets, dtype=np.int64)
    sizes[: total % n_buckets] += 1
    ends = np.cumsum(sizes)  # 1-based end rank per bucket
    cum = np.cumsum(cnts)
    wsum = np.cumsum(vals * cnts)  # value-weighted prefix sums

    def sum_to_rank(r: int) -> float:
        """Sum of the first r values in sorted order (ties interpolate
        exactly: identical values on both sides of the cut)."""
        if r <= 0:
            return 0.0
        i = int(np.searchsorted(cum, r, side="left"))
        prev_cum = int(cum[i - 1]) if i else 0
        prev_sum = float(wsum[i - 1]) if i else 0.0
        return prev_sum + vals[i] * (r - prev_cum)

    rows = {"bucket": [], "count": [], "vmin": [], "vmax": [], "vsum": []}
    start = 0
    for b in range(n_buckets):
        end = int(ends[b])
        rows["bucket"].append(b + 1)
        rows["count"].append(end - start)
        if end == start:
            rows["vmin"].append(None)
            rows["vmax"].append(None)
            rows["vsum"].append(0.0)
        else:
            i0 = int(np.searchsorted(cum, start, side="right"))
            i1 = int(np.searchsorted(cum, end, side="left"))
            rows["vmin"].append(float(vals[i0]))
            rows["vmax"].append(float(vals[i1]))
            rows["vsum"].append(sum_to_rank(end) - sum_to_rank(start))
        start = end
    return pa.table({
        "bucket": pa.array(rows["bucket"], pa.int64()),
        "count": pa.array(rows["count"], pa.int64()),
        "vmin": pa.array(rows["vmin"], pa.float64()),
        "vmax": pa.array(rows["vmax"], pa.float64()),
        "vsum": pa.array(rows["vsum"], pa.float64()),
    })


def distinct_values(ds, field: str):
    """Distinct values of one column as a sorted Dataset — distributed
    groupby (only distinct values shuffle), never a driver-side
    ``ds.unique`` list (which would OOM on a high-cardinality field)."""
    return (
        ds.groupby(field).count()
        .map_batches(lambda b: b.drop_columns(["count()"]), batch_format="pyarrow")
        .sort(field)
    )


def sampled_facet_counts(ds, field: str, fraction: float = 0.1, seed: int = 7):
    return ds.random_sample(fraction, seed=seed).groupby(field).count().sort(field)


def top_k_by_field(ds, field: str, k: int, descending: bool = True,
                   tie_col: str | None = None):
    """TopFieldCollector: global top-k by a column (Ray sort + limit)."""
    keys = [(field, "descending" if descending else "ascending")]
    if tie_col:
        keys.append((tie_col, "ascending"))
    return ds.sort([kk for kk, _ in keys], descending=[d == "descending" for _, d in keys]).limit(k)


def grouped_top_k(ds, group_col: str, sort_col: str, k: int, descending: bool = True):
    """Top-k rows per group (grouping/GroupingSearch.java:46 two-pass
    search) with NO per-group UDF: one global ``sort([group, sort])``
    range-partitions the rows so each group is a contiguous run, then a
    vectorized per-block run scan keeps each run's first k rows. A run
    spanning a block boundary may contribute more than k rows total
    (first-k of each fragment), so a final single-block pass — over the
    already-globally-ordered, ≤(groups + blocks)·k-row survivors — runs
    the same scan once more for the exact answer. (At extreme group
    cardinality, repeat the reduction tree-wise before the final block;
    one level suffices for ≤10^7 groups · small k.)"""
    keys = [group_col, sort_col]
    desc = [False, descending]
    if "doc_id" in ds.schema().names:  # deterministic tie-break
        keys.append("doc_id")
        desc.append(False)
    sorted_ds = ds.sort(keys, descending=desc)

    def head_runs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        import pyarrow.compute as pc
        neq = pc.fill_null(
            pc.not_equal(g.slice(1), g.slice(0, n - 1)), True
        ).to_numpy(zero_copy_only=False)
        start_flags = np.concatenate(([True], neq))
        starts = np.nonzero(start_flags)[0]
        run_id = np.cumsum(start_flags) - 1
        pos_in_run = np.arange(n) - starts[run_id]
        return b.filter(pa.array(pos_in_run < k))

    reduced = sorted_ds.map_batches(head_runs, batch_format="pyarrow")
    # blocks stay in global key order through filter, so one concatenated
    # pass over the survivors is exact
    return reduced.repartition(1).map_batches(
        head_runs, batch_size=None, batch_format="pyarrow"
    )


def high_freq_terms(
    index_dir: str, k: int = 20, by: str = "df", field: str | None = None
) -> pa.Table:
    """Global top-k terms by df or ttf from the index's aggregated term
    stats (HighFreqTerms semantics) — reads the tiny global_terms table.
    ``field`` selects one field's dictionary section (None = default field,
    excluding \\x01-prefixed field keys); terms return unprefixed."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from lucene_ray.index.fields import FIELD_MARK, field_prefix

    from lucene_ray.index.build import stats_path

    t = pq.read_table(stats_path(index_dir))
    if field is None:
        t = t.filter(pc.invert(pc.starts_with(t["term"], FIELD_MARK)))
    else:
        pref = field_prefix(field)
        t = t.filter(pc.starts_with(t["term"], pref))
        t = t.set_column(
            t.schema.get_field_index("term"), "term",
            pc.utf8_slice_codeunits(t["term"], len(pref), 2**31 - 1),
        )
    order = np.lexsort((np.asarray(t["term"].to_pylist(), dtype=object), -t[by].to_numpy()))[:k]
    return t.take(pa.array(order))


def taxonomy_counts(ds, level_cols: list[str], sep: str = "/"):
    """Hierarchical facet counts — the FacetField("dim", "a", "b") +
    FastTaxonomyFacetCounts role (facet/FastTaxonomyFacetCounts.java:40,
    taxonomy/FacetLabel.java): each doc's path explodes to ALL ancestor
    prefixes (a, a/b, a/b/c) in one vectorized pass, then ONE groupby
    counts every taxonomy node. Returns (path, n) sorted by path."""
    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        cols = []
        for c in level_cols:
            arr = b[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols.append(pc.cast(arr, pa.string()))
        parts = []
        prefix = None
        for arr in cols:
            prefix = (
                arr if prefix is None
                else pc.binary_join_element_wise(prefix, arr, sep)
            )
            parts.append(prefix)
        return pa.table({"path": pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts]
        )})

    return ds.map_batches(explode, batch_format="pyarrow").groupby("path").count().sort("path")


def long_value_counts(ds, field: str, k: int | None = None):
    """Numeric-value facet counts — LongValueFacetCounts
    (facet/LongValueFacetCounts.java:48): count per distinct value of a
    numeric doc column. One groupby-count; with ``k`` returns the top-k
    ordered (count desc, value asc) — the getTopChildren contract."""
    t = ds.groupby(field).count()
    if k is None:
        return t.sort(field)
    # top-k stays distributed: one sort over the (value, count) rows —
    # cardinality of a numeric facet can be millions at web scale, so
    # nothing materializes on the driver before the limit
    import pyarrow as _pa

    rows = t.sort(["count()", field], descending=[True, False]).limit(k)
    tbl = _pa.concat_tables(rows.iter_batches(batch_format="pyarrow"))
    return _pa.table({field: tbl[field], "n": tbl["count()"]})


def taxonomy_sum_associations(ds, level_cols: list[str], value_col: str,
                              sep: str = "/"):
    """Association facets — FloatAssociationFacetField +
    TaxonomyFacetSumFloatAssociations
    (facet/taxonomy/TaxonomyFacetSumFloatAssociations.java:31): every
    taxonomy node aggregates the SUM of a per-doc numeric association
    instead of a count. Same ancestor-explode shape as
    :func:`taxonomy_counts` (each doc contributes its value to every
    prefix of its path), one groupby-sum. Returns (path, sum) by path."""
    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        cols = []
        for c in level_cols:
            arr = b[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols.append(pc.cast(arr, pa.string()))
        val = pc.cast(b[value_col], pa.float64())
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        paths, vals = [], []
        prefix = None
        for arr in cols:
            prefix = (
                arr if prefix is None
                else pc.binary_join_element_wise(prefix, arr, sep)
            )
            paths.append(prefix)
            vals.append(val)
        return pa.table({
            "path": pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in paths]),
            "value": pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                 for v in vals]),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("value", alias_name="sum_value"))
        .sort("path")
    )


def taxonomy_max_associations(ds, level_cols: list[str], value_col: str,
                              sep: str = "/"):
    """MAX-aggregated association facets — the
    AssociationAggregationFunction.MAX variant
    (facet/taxonomy/AssociationAggregationFunction.java:31,
    TaxonomyFacetFloatAssociations.java): every taxonomy node keeps the
    MAX of the per-doc association over docs under it. Same
    ancestor-explode + one small groupby as the SUM variant (max is a
    combiner-friendly aggregate — partials merge exactly)."""
    from ray.data.aggregate import Max

    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        cols = []
        for c in level_cols:
            arr = b[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols.append(pc.cast(arr, pa.string()))
        val = pc.cast(b[value_col], pa.float64())
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        paths, vals = [], []
        prefix = None
        for arr in cols:
            prefix = (
                arr if prefix is None
                else pc.binary_join_element_wise(prefix, arr, sep)
            )
            paths.append(prefix)
            vals.append(val)
        return pa.table({
            "path": pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in paths]),
            "value": pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                 for v in vals]),
        })

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Max("value", alias_name="max_value"))
        .sort("path")
    )


def drill_sideways_counts(ds, selections: dict, dims: "list[str] | None" = None):
    """DrillSideways (facet/DrillSideways.java:71): for every dim, facet
    counts under the drill-down query with THAT dim's own selection
    removed and every other selection applied (so the UI can show the
    sibling values the user could still pick).

    ONE pass: per batch, a boolean mask per selected dim; a row
    contributes to dim d's counts iff it satisfies all selections except
    d's. Only (dim, value) pairs shuffle into the final groupby.
    Returns (dim, value, n) sorted."""
    import pyarrow.compute as pc

    dims = dims or list(selections)

    def expand(b: pa.Table) -> pa.Table:
        masks = {}
        for d, v in selections.items():
            arr = b[d]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # null dim values compare to null -> fill False or the numpy
            # mask degrades to object dtype and `&=` raises
            masks[d] = pc.fill_null(pc.equal(arr, v), False).to_numpy(
                zero_copy_only=False)
        out_dim, out_val = [], []
        for d in dims:
            others = np.ones(b.num_rows, dtype=bool)
            for od, m in masks.items():
                if od != d:
                    others &= m
            arr = b[d]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # rows missing the dim produce no label (facets skip nulls)
            vals = pc.drop_null(pc.cast(arr, pa.string()).filter(
                pa.array(others)))
            out_dim.append(
                pa.array([d] * len(vals), pa.string())
            )
            out_val.append(vals)
        return pa.table({
            "dim": pa.concat_arrays(out_dim),
            "value": pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                 for v in out_val]
            ),
        })

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["dim", "value"]).count().sort(["dim", "value"])
    )


def drill_down_counts(ds, doc_ids: np.ndarray, field: str, id_col: str = "doc_id"):
    """Facet counts restricted to a query's matching doc set — the
    drill-down half of facet/DrillSideways.java: search produces doc ids,
    the matching rows facet with a plain groupby. The doc set is broadcast
    once via ray.put and membership-filtered per batch (sorted
    searchsorted), so only (field) values of matching rows shuffle."""
    import ray

    ref = ray.put(np.sort(np.asarray(doc_ids, dtype=np.int64)))

    def filt(b: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(ids, v), 0, max(ids.shape[0] - 1, 0))
        mask = ids[pos] == v if ids.shape[0] else np.zeros(v.shape[0], bool)
        return b.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow").groupby(field).count().sort(field)


def facet_set_counts(ds, dim_cols: list[str], matchers: list[dict]):
    """FacetSets counting — the facet/facetset module
    (facetset/MatchingFacetSetsCounts.java:40, ExactFacetSetMatcher.java,
    RangeFacetSetMatcher.java + DimRange.java): each doc carries ONE
    multi-dimensional point (its ``dim_cols`` tuple); every matcher
    counts the docs whose point it accepts. Matchers:

    * ``{"label": L, "exact": (v1, v2, ...)}`` — exact per-dim equality
      (ExactFacetSetMatcher);
    * ``{"label": L, "ranges": ((lo, hi) | None, ...)}`` — inclusive
      per-dim ranges, ``None`` = unconstrained (RangeFacetSetMatcher).

    One vectorized pass per batch (a boolean mask per matcher), one
    tiny groupby-sum — the reference iterates matchers per doc the same
    way, just row-at-a-time. Returns (label, count) sorted by label."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        cols = {}
        for c in dim_cols:
            arr = b[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[c] = arr.to_numpy(zero_copy_only=False)
        labels, counts = [], []
        for m in matchers:
            mask = np.ones(b.num_rows, dtype=bool)
            if "exact" in m:
                for c, v in zip(dim_cols, m["exact"]):
                    mask &= cols[c] == v
            else:
                for c, r in zip(dim_cols, m["ranges"]):
                    if r is None:
                        continue
                    lo, hi = r
                    if lo is not None:
                        mask &= cols[c] >= lo
                    if hi is not None:
                        mask &= cols[c] <= hi
            labels.append(m["label"])
            counts.append(int(mask.sum()))
        return pa.table({"label": pa.array(labels, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("label").aggregate(Sum("n", alias_name="count"))
            .sort("label"))


def range_on_range_counts(ds, min_col: str, max_col: str,
                          ranges: list) -> "object":
    """Range-on-range faceting — the facet/rangeonrange module
    (rangeonrange/RangeOnRangeFacetCounts.java:38 over
    rangeonrange/DoubleRange.java): every doc carries a [min, max]
    RANGE; each facet range counts the docs whose range INTERSECTS it
    (the module's queryType=INTERSECTS default). ``ranges`` =
    [{"label": L, "lower": lo, "upper": hi}, ...]. One vectorized mask
    per facet range per batch + one tiny groupby-sum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        dmin = b[min_col].to_numpy(zero_copy_only=False)
        dmax = b[max_col].to_numpy(zero_copy_only=False)
        labels, counts = [], []
        for r in ranges:
            m = (dmax >= r["lower"]) & (dmin <= r["upper"])
            labels.append(r["label"])
            counts.append(int(m.sum()))
        return pa.table({"label": pa.array(labels, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("label").aggregate(Sum("n", alias_name="count"))
            .sort("label"))
