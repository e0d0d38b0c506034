#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate: load each
SparkEntry query result (parquet written by graft.Verify), run the paired
oracle SQL in DuckDB over the same fixture tables, and diff.

Usage: python3 dev/compare.py <sfDir> <outDir> [query ...]

Not part of the shipped library (driver-side python is allowed for dev).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        return list(a) == list(b)
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    s, o = norm(spark_df), norm(oracle_df)
    if list(s.columns) != list(o.columns):
        return f"SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}"
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not cells_equal(a, b):
                return (f"VALUE MISMATCH col={col} row={i} "
                        f"spark={a!r} ({type(a).__name__}) oracle={b!r} ({type(b).__name__})")
    # dtype report (driver may hash typed values; flag divergence)
    dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(o[c].dtype)]
    return "OK" + (f"  [dtype diff: {dt}]" if dt else "")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle_sql = json.load(f)
    fails = 0
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name}: NO SPARK OUTPUT ({e})")
            fails += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR ({e})")
            fails += 1
            continue
        verdict = compare(name, spark_df, oracle_df)
        print(f"{name}: {verdict}   [{len(spark_df)} rows]")
        if not verdict.startswith("OK"):
            fails += 1
    print(f"--- {len(oracle_sql)} oracle queries, {fails} failing")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
