#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (Spark parquet result) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views
named after the tables in <sfDir>, and compares: sort columns by name, sort
rows by all columns, hash canonical values.  Purely a dev tool — the engine
itself (Scala) never depends on this.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value formatting
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: None if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").map(lambda v: None if pd.isna(v) else v.isoformat())
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver layout = single file; ScaleUp layout = Spark directory
        p = f"{sf_dir}/{t}.parquet"
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # optional 3rd arg: comma-separated query subset — lets a wrapper fan the
    # (embarrassingly parallel) per-query compares across processes; the
    # heavy sf1 oracles are single-thread-bound in DuckDB's row-wise list
    # comprehensions, so one serial pass wastes 30 idle cores
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        names = [n for n in names if n in only]
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}" + (" (EMPTY!)" if len(spark_df)==0 else "")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        a, b = canon(spark_df.copy()), canon(duck_df.copy())
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1).idxmax()
            results[name] = (f"VALUE_MISMATCH cols={bad_cols} firstrow={idx} "
                             f"spark={a.loc[idx, bad_cols].to_dict()} duck={b.loc[idx, bad_cols].to_dict()}")
        else:
            results[name] = f"OK rows={len(a)}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY rows=") and "EMPTY" not in v)
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') or (results[k].startswith('ROWS_ONLY') and 'EMPTY' not in results[k]) else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
