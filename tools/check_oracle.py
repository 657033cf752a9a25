#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
corresponding SQL from oracle_sql.json in DuckDB against the parquet tables
in <sfDir>, sorts columns by name and rows by all columns, and compares
values. Prints PASS/FAIL per query. Dev tool only — NOT part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    # timestamps: compare as pandas
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).endswith("ndarray'>"):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    return a == b


def frames_equal(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"SCHEMA colnames spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWS spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    # The driver's gate hashes exact value representations, so an int64
    # column on one side and float64 on the other (DuckDB's sum(BIGINT) →
    # HUGEINT → float64 promotion) hash-mismatches even when every value
    # compares equal under tolerance. Mirror that here: a dtype-KIND split
    # between two non-object columns is a FAIL before any value is read.
    # KIND-level deliberately, not exact-dtype: 18 same-kind width/unit
    # splits exist across the suite (int32 vs int64 ranks/counts,
    # datetime64[ns] vs [us]) and every one is hash-GREEN at the driver —
    # q39's own int32-vs-int64 `rn` passed every round while its
    # float64-vs-int64 `rev_cents` failed, so the driver normalizes
    # within a kind and exact-dtype strictness here would false-FAIL
    # 18 green queries.
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if ka != kb and "O" not in (ka, kb):
            return (f"DTYPE col={col} spark={a[col].dtype} "
                    f"oracle={b[col].dtype}")
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            if not values_equal(x, y):
                return f"VALUE col={col} row={i} spark={x!r} oracle={y!r}"
    return ""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle_sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_weak = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(d.glob("*.parquet"))],
            ignore_index=True) if list(d.glob("*.parquet")) else pd.DataFrame()
        if name not in oracle_sql:
            status = "WEAK-OK" if len(spark_df) > 0 else "WEAK-EMPTY"
            n_weak += 1
            print(f"{status:10s} {name} rows={len(spark_df)} (no oracle)")
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).df()
        except Exception as e:
            print(f"FAIL       {name} oracle error: {e}")
            n_fail += 1
            continue
        diff = frames_equal(spark_df, oracle_df)
        if diff:
            print(f"FAIL       {name} {diff}")
            n_fail += 1
        else:
            print(f"PASS       {name} rows={len(spark_df)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
