"""Mirror of the driver's correctness gate: run each queries() entry and
its oracle_sql() side-by-side on an sf dir; compare row-count, schema
kinds, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype(np.int64)
        elif k == "f":
            df[c] = df[c].astype(np.float64)
        elif k == "O":
            df[c] = df[c].astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        print(f"  [{name}] COLUMN MISMATCH ray={list(a.columns)} sql={list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  [{name}] ROWCOUNT MISMATCH ray={len(a)} sql={len(b)}")
        return False
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        return True
    except AssertionError as e:
        print(f"  [{name}] VALUE MISMATCH: {str(e)[:500]}")
        bad = (a != b).any(axis=1)
        print(pd.concat([a[bad].head(5).add_prefix("ray_"), b[bad].head(5).add_prefix("sql_")], axis=1))
        return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"  [{name}] RAY ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"  [{name}] rows-only: {len(ray_df)} rows OK")
            n_pass += 1
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"  [{name}] SQL ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if compare(name, ray_df, sql_df):
            print(f"  [{name}] OK ({len(ray_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
