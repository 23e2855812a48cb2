#!/usr/bin/env python3
"""Dev harness mirroring the driver's DuckDB-oracle compare.

Usage: scripts/oracle_check.py [sfdir] [verify_outdir]

For every query dumped by graft.Verify, runs the declared oracle SQL in
DuckDB over the same parquet tables and diffs: columns (sorted by name),
row counts, and values (rows sorted by all columns). Exact match required —
this is intentionally at least as strict as the driver's hash compare.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes: ints → int64 (nullable-safe), floats → float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_nosql = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"SKIP {name}: no oracle SQL (rows-only: {len(spark_df)} rows)")
            n_nosql += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        diffs = []
        for c in a.columns:
            # Bit-exact equality, floats included: the driver HASH-compares,
            # so a tolerance here would hide real gate failures. The rounding
            # conventions (Num.rnd / ROUND(1e-9+x, n)) make identical
            # decimals, hence identical doubles, on both engines.
            if pd.api.types.is_float_dtype(a[c]):
                ae, be = a[c].fillna(-1e308), b[c].fillna(-1e308)
                bad = ae != be
            else:
                bad = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
            if bad.any():
                i = bad.idxmax()
                diffs.append(f"{c}[{int(bad.sum())} rows, e.g. {a[c][i]!r} vs {b[c][i]!r}]")
        if diffs:
            print(f"FAIL {name}: value diffs: {'; '.join(diffs)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows x {len(a.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
