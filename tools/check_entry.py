"""Local replica of the driver's correctness gate.

Runs every queries() entry at the given sf_dir, runs the matching
oracle_sql() in DuckDB over the same parquet tables, and compares
row count + schema(column names) + order-insensitive values.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount {len(spark_df)} vs {len(oracle_df)}")
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
        )
        return problems
    if problems:
        return problems
    a, b = canon(spark_df), canon(oracle_df)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
            b[c].dtype, np.floating
        ):
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
            )
        else:
            ok = (av == bv).all()
        if not ok:
            idx = next(
                i for i in range(len(av))
                if not _eq(av[i], bv[i])
            )
            problems.append(
                f"col {c} first diff at row {idx}: {av[idx]!r} vs {bv[idx]!r}"
            )
    return problems


def _eq(x, y):
    try:
        return bool(np.isclose(float(x), float(y), rtol=0, atol=1e-9))
    except (TypeError, ValueError):
        return x == y


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from crawl4ai_spark.session import get_spark

    cpus = int(os.environ.get("CHECK_CPUS", "8"))
    spark = get_spark("check_entry", cpus=cpus, shuffle_partitions=cpus)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({took:.1f}s) [rows-only]")
            if len(sdf) == 0:
                print(f"WARN  {name}: empty result")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(sdf)} rows ({took:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
