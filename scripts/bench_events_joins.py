"""One-off evidence for the round-5 AS-OF/RANGE join rework: sorted-run
scan (events.py) vs the round-4 per-key ``groupby().map_groups`` shape,
on a high-cardinality-key fixture (default 100k keys, 1M rows/side).

Usage: python scripts/bench_events_joins.py [n_keys] [n_rows]
Prints one JSON line with both wall times and the speedup.
"""

import json
import sys
import time

import numpy as np
import pyarrow as pa


def _fixture(n_keys: int, n_rows: int):
    rng = np.random.default_rng(42)
    mk = lambda base: pa.table({
        "user_id": rng.integers(0, n_keys, n_rows),
        "event_id": np.arange(n_rows, dtype=np.int64) + base,
        "ts": rng.integers(0, 10**9, n_rows),
        "value": rng.random(n_rows),
    })
    return mk(0), mk(10**9)


def _mapgroups_asof(left, right, on="user_id"):
    """The round-4 shape: co-locate by key, one Python UDF call PER KEY
    (kept here only as the comparison baseline)."""
    import pyarrow.compute as pc

    from lucene_ray.pipelines.events import _tag_union

    both = _tag_union(left, right, on, "ts", "event_id", "value")

    def per_key(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        ts = g["_ts_us"].to_numpy(zero_copy_only=False)
        val = g["_val"].to_numpy(zero_copy_only=False)
        ids = g["_id"].to_numpy(zero_copy_only=False)
        lmask = side == 1
        lts, lids = ts[lmask], ids[lmask]
        rmask = ~lmask
        order = np.lexsort((val[rmask], ts[rmask]))
        rts, rval = ts[rmask][order], val[rmask][order]
        if rts.shape[0]:
            idx = np.searchsorted(rts, lts, side="right") - 1
            ok = idx >= 0
            idx_c = np.clip(idx, 0, rts.shape[0] - 1)
            mt, mv = rts[idx_c], rval[idx_c]
        else:
            ok = np.zeros(lts.shape[0], bool)
            mt = np.zeros(lts.shape[0], np.int64)
            mv = np.zeros(lts.shape[0], np.float64)
        key = g[on].to_numpy(zero_copy_only=False)[lmask]
        return pa.table({
            on: pa.array(key), "left_id": pa.array(lids),
            "left_ts_us": pa.array(lts),
            "right_ts_us": pc.if_else(pa.array(ok), pa.array(mt, pa.int64()),
                                      pa.scalar(None, pa.int64())),
            "right_value": pc.if_else(pa.array(ok),
                                      pa.array(mv, pa.float64()),
                                      pa.scalar(None, pa.float64())),
        })

    return both.groupby(on).map_groups(per_key, batch_format="pyarrow")


def main():
    import ray
    import ray.data

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from lucene_ray.pipelines.events import asof_join

    lt, rt = _fixture(n_keys, n_rows)
    left = ray.data.from_arrow(lt).repartition(32).materialize()
    right = ray.data.from_arrow(rt).repartition(32).materialize()

    t0 = time.perf_counter()
    n1 = asof_join(left, right).count()
    t_sorted = time.perf_counter() - t0

    t0 = time.perf_counter()
    n2 = _mapgroups_asof(left, right).count()
    t_mapgroups = time.perf_counter() - t0

    assert n1 == n2 == n_rows, (n1, n2, n_rows)
    print(json.dumps({
        "metric": "asof_join_highcard", "n_keys": n_keys, "n_rows": n_rows,
        "sorted_run_sec": round(t_sorted, 2),
        "map_groups_sec": round(t_mapgroups, 2),
        "speedup": round(t_mapgroups / t_sorted, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
