"""Driver-style correctness harness: run every queries() entry and its
oracle_sql() side-by-side on a sf dir, compare row-count + schema +
order-insensitive value hash (columns sorted by name), print a report.

Usage: python scripts/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update("|".join(df.columns).encode())
    h.update(pd.util.hash_pandas_object(df, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            mine = canonical(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: engine error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            oracle = canonical(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_rows = len(mine) == len(oracle)
        ok_schema = list(mine.columns) == list(oracle.columns)
        ok_hash = ok_rows and ok_schema and value_hash(mine) == value_hash(oracle)
        if ok_hash:
            print(f"PASS  {name}: {len(mine)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(
                f"FAIL  {name}: rows {len(mine)}/{len(oracle)} schema "
                f"{list(mine.columns)}/{list(oracle.columns)}"
            )
            if ok_rows and ok_schema:
                neq = (mine != oracle) & ~(mine.isna() & oracle.isna())
                bad = neq.any(axis=1)
                print("   first diffs:")
                print(pd.concat([mine[bad].head(3), oracle[bad].head(3)], axis=1))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
