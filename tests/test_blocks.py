"""Regression tests for the zero-row-block join hazard (round-4 verdict #1/#2).

Ray's hash-shuffle join broadcasts each side's schema via the FIRST
shuffled block; ``_shuffle_block`` returns early for zero-row blocks, so
a zero-row first block silently loses the broadcast and any aggregator
partition that receives no real rows for that side finalizes an
empty-schema table → ``ArrowInvalid`` in acero. These tests manufacture
schema-less empty blocks DETERMINISTICALLY (first in block order, on
both sides, at high partition counts) instead of relying on
slice-distribution luck.
"""

import numpy as np
import pyarrow as pa
import pytest

EMPTY = pa.Table.from_arrays([], names=[])


def _hostile(tables, n_empty=6):
    """A dataset whose FIRST blocks are schema-less and empty — the exact
    shape Ray's hash aggregates emit and map_batches forwards."""
    import ray.data

    return ray.data.from_arrow([EMPTY] * n_empty + list(tables) + [EMPTY] * n_empty)


def test_scrub_drops_empty_blocks(ray_session):
    import ray

    from lucene_ray.data.blocks import scrub_empty_blocks

    ds = _hostile([pa.table({"x": [1, 2]}), pa.table({"x": [3]})])
    out = scrub_empty_blocks(ds)
    blocks = [
        ray.get(ref)
        for bundle in out.iter_internal_ref_bundles()
        for ref, _ in bundle.blocks
    ]
    assert all(t.num_rows > 0 and t.num_columns > 0 for t in blocks)
    assert sorted(out.to_pandas()["x"]) == [1, 2, 3]


def test_scrub_all_empty_uses_schema(ray_session):
    from lucene_ray.data.blocks import scrub_empty_blocks

    ds = _hostile([])
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    out = scrub_empty_blocks(ds, schema=schema)
    assert out.count() == 0
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow")) \
        if out.count() else schema.empty_table()
    assert t.schema.names == ["k", "v"]


def test_safe_join_empty_schema_blocks_both_sides(ray_session):
    """Both join sides lead with schema-less blocks at high partition counts —
    the deterministic form of the dedup_clusters crash."""
    from lucene_ray.data.blocks import safe_inner_join

    left = _hostile([pa.table({"k": [1, 2, 3], "x": [10, 20, 30]})])
    right = _hostile([pa.table({"k": [2, 3, 4], "y": [5, 6, 7]})])
    out = safe_inner_join(left, right, on=("k",), num_partitions=16)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    got = sorted(zip(t["k"].to_pylist(), t["x"].to_pylist(), t["y"].to_pylist()))
    assert got == [(2, 20, 5), (3, 30, 6)]


def test_safe_join_all_empty_side_short_circuits(ray_session):
    """An entirely-empty side ALWAYS crashes Ray's join (the schema
    broadcast never happens) — safe_inner_join must short-circuit to an
    empty result with the joined schema instead."""
    import ray.data

    from lucene_ray.data.blocks import safe_inner_join

    left = ray.data.from_arrow(pa.table({"k": [1, 2], "x": [10, 20]}))
    right = _hostile([])
    out = safe_inner_join(
        left, right, on=("k",), num_partitions=16,
        right_schema=pa.schema([("k", pa.int64()), ("y", pa.int64())]),
    )
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "x", "y"}


def test_safe_join_chained_zero_row_intermediate(ray_session):
    """A first join's output contains zero-row (schema-full) blocks;
    feeding it unscrubbed into a second join loses that join's schema
    broadcast. The jaccard/ANN double-join shape."""
    from lucene_ray.data.blocks import safe_inner_join

    left = _hostile([pa.table({"a": [1, 2, 3], "x": [10, 20, 30]})])
    mid = _hostile([pa.table({"a": [2, 3], "y": [5, 6]})])
    right = _hostile([pa.table({"x": [20], "z": [99]})])
    j1 = safe_inner_join(left, mid, on=("a",), num_partitions=16)
    j2 = safe_inner_join(j1, right, on=("x",), num_partitions=16)
    t = pa.concat_tables(j2.iter_batches(batch_format="pyarrow"))
    assert t.num_rows == 1
    row = {c: t[c][0].as_py() for c in t.schema.names}
    assert row == {"a": 2, "x": 20, "y": 5, "z": 99}


def test_dedup_clusters_hostile_empty_blocks(ray_session):
    """dedup_clusters fed a pairs dataset that LEADS with schema-less
    empty blocks (what shared_window_pairs' sorted-run scan emits for
    pairless slices) — must still converge at high partition counts."""
    import ray.data

    from lucene_ray.pipelines.dedup import dedup_clusters

    pairs = _hostile([pa.table({
        "a": pa.array([0, 1, 2, 50], pa.int64()),
        "b": pa.array([1, 2, 3, 51], pa.int64()),
    })], n_empty=10)
    out = dedup_clusters(pairs)
    got = {r["doc_id"]: r["cluster"] for r in out.take_all()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 50: 50, 51: 50}


def test_dedup_clusters_empty_input(ray_session):
    from lucene_ray.pipelines.dedup import dedup_clusters

    out = dedup_clusters(_hostile([]))
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "cluster"}


def test_dedup_exact_join_strategy_hostile(ray_session):
    """dedup_exact's semi-join path with zero-row blocks leading the
    corpus side (upstream-filter shape) and a hash-aggregate keepers
    side."""
    import ray.data

    from lucene_ray.pipelines.dedup import dedup_exact

    t = pa.table({
        "url": ["u1", "u1", "u2", "u3", "u3", "u3"],
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "warc_ts": pa.array([1000, 2000, 1000, 3000, 1000, 2000], pa.int64()),
    })
    pages = _hostile([t])
    out = dedup_exact(pages, key="url", strategy="join", num_partitions=16)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    kept = sorted(got["doc_id"].to_pylist())
    assert kept == [2, 3, 4]  # newest warc_ts per url


def test_jaccard_join_strategy_hostile(ray_session):
    """jaccard_pairs' double size-join path under leading empty blocks."""
    from lucene_ray.pipelines.dedup import jaccard_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the cat sat on the mat",
                 "the cat sat on the mat",
                 "entirely different words here now"],
    })
    out = jaccard_pairs(_hostile([t]), threshold=0.9, strategy="join",
                        num_partitions=16)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    pairs = sorted(zip(got["a"].to_pylist(), got["b"].to_pylist()))
    assert pairs == [(1, 2)]
