#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, then compare row count, column names, and
(sorted) values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    s = normalize(spark_df)
    o = normalize(oracle_df)
    n = min(len(s), len(o))
    mismatches = 0
    for col in s.columns:
        sv, ov = s[col].tolist()[:n], o[col].tolist()[:n]
        for i in range(n):
            a, b = sv[i], ov[i]
            a = None if (isinstance(a, float) and math.isnan(a)) else a
            b = None if (isinstance(b, float) and math.isnan(b)) else b
            if not values_equal(a, b):
                mismatches += 1
                if mismatches <= 3:
                    problems.append(f"value diff row {i} col {col}: spark={a!r} oracle={b!r}")
    if mismatches > 3:
        problems.append(f"... {mismatches} total value mismatches")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from amazon_personalize_connectors_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            spark.catalog.clearCache()
        except Exception as ex:
            print(f"[FAIL] {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle error: {ex}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"[FAIL] {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"       {p}")
            failed.append(name)
        else:
            print(f"[ OK ] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failed of {len(only) or len(qs)}: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
