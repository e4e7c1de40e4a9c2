"""Block-level hygiene for Ray Data hash-shuffle joins.

Ray's hash-shuffle join (``Dataset.join``) broadcasts each input's schema
to every aggregator partition by tagging the FIRST shuffled block
(``hash_shuffle.py``: ``send_empty_blocks=should_broadcast_schemas``).
``_shuffle_block`` returns early for a zero-row block, so when the first
submitted block of a side happens to have zero rows the broadcast is
silently lost — and every aggregator partition that then receives no
real rows for that side finalizes an EMPTY-schema table, which acero
rejects with ``ArrowInvalid: No match or multiple matches for key field
reference FieldRef.Name(...)``.

Zero-row blocks are endemic upstream of joins here: Ray's hash
aggregates emit them for empty partitions, and ``map_batches`` forwards
them untouched (the UDF is never invoked on a zero-row block — it even
strips the schema off a schema-full zero-row block), so no in-UDF guard
can ever fire. The only reliable fix is block-level: drop zero-row
blocks from a join input before the shuffle sees them. Dropping a
zero-row block never changes a join/groupby result.

These helpers are the shared hardening applied at every
``Dataset.join`` call site in the repo (near-dup clustering, exact-dedup
semi-join, Jaccard size joins, ANN verify joins).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["scrub_empty_blocks", "safe_inner_join"]


def _ray_schema_to_arrow(schema) -> pa.Schema | None:
    """Best-effort conversion of ray.data.Schema → pyarrow.Schema."""
    if schema is None:
        return None
    if isinstance(schema, pa.Schema):
        return schema
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    names = getattr(schema, "names", None)
    types = getattr(schema, "types", None)
    if names and types and all(isinstance(t, pa.DataType) for t in types):
        return pa.schema(list(zip(names, types)))
    return None


def scrub_empty_blocks(ds, schema: pa.Schema | None = None):
    """Rebuild ``ds`` from only its non-empty blocks.

    Executes (and pins) the input — the blocks land in the object store,
    exactly as ``materialize()`` would — so call it on datasets that are
    already materialized, aggregate outputs, or side tables. A hash join
    is a barrier that holds its inputs in aggregator partitions anyway,
    so scrubbing a join input adds one store pass, not a new barrier.

    If every block is empty, returns a one-empty-block Dataset carrying
    the best known schema (``schema`` if given, else whatever the plan
    knows) so downstream schemas survive; a caller that needs to
    short-circuit the all-empty case should ``count()`` the result
    (cheap — metadata only).
    """
    import ray
    import ray.data

    refs = [
        block_ref
        for bundle in ds.iter_internal_ref_bundles()
        for block_ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    if refs:
        return ray.data.from_arrow_refs(refs)
    if schema is None:
        schema = _ray_schema_to_arrow(ds.schema(fetch_if_missing=False))
    if schema is None or len(schema) == 0:
        raise ValueError(
            "scrub_empty_blocks: dataset is entirely empty and its schema "
            "is unknown — pass an explicit `schema` so downstream joins "
            "can short-circuit with the right columns"
        )
    return ray.data.from_arrow(schema.empty_table())


def _dataset_arrow_schema(ds, hint: pa.Schema | None) -> pa.Schema | None:
    if hint is not None:
        return hint
    return _ray_schema_to_arrow(ds.schema(fetch_if_missing=True))


def safe_inner_join(left, right, on, num_partitions: int, *,
                    scrub_left: bool = True, scrub_right: bool = True,
                    left_schema: pa.Schema | None = None,
                    right_schema: pa.Schema | None = None):
    """``Dataset.join(join_type="inner")`` hardened against Ray's
    zero-row-block schema-broadcast loss (see module docstring).

    Both sides are scrubbed by default. ``scrub_left=False`` /
    ``scrub_right=False`` skip the store pass for a side that is
    guaranteed free of zero-row blocks (e.g. a raw parquet read that no
    filter has touched) — the escape hatch for a streaming 100-TB probe
    side. An entirely-empty scrubbed side short-circuits to an empty
    result with the joined schema, because Ray's join cannot execute at
    all when one side never broadcasts a schema (deterministic crash,
    not a partitioning-luck one).
    """
    import ray
    import ray.data

    # a partition count far above the CPU pool deadlocks Ray's hash
    # shuffle outright on a small cluster (48 partitions on 4 CPUs hangs
    # even for a 3-row join — the aggregator actors starve their own
    # upstream); 4x the CPU budget is measured-safe and keeps skew
    # headroom on big clusters
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", num_partitions))
        num_partitions = max(2, min(num_partitions, 4 * cpus))

    on = tuple(on) if not isinstance(on, str) else (on,)
    if scrub_left:
        left = scrub_empty_blocks(left, left_schema)
    if scrub_right:
        right = scrub_empty_blocks(right, right_schema)

    left_empty = scrub_left and left.count() == 0
    right_empty = scrub_right and right.count() == 0
    if left_empty or right_empty:
        ls = _dataset_arrow_schema(left, left_schema)
        rs = _dataset_arrow_schema(right, right_schema)
        if ls is None or rs is None:
            raise ValueError(
                "safe_inner_join: cannot short-circuit an empty side "
                "without both schemas — pass left_schema/right_schema"
            )
        fields = list(ls)
        have = {f.name for f in fields}
        fields += [f for f in rs if f.name not in have]
        return ray.data.from_arrow(pa.schema(fields).empty_table())

    return left.join(right, join_type="inner",
                     num_partitions=num_partitions, on=on)
