#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/localcheck.py <verify_out_dir> [query ...]

Reads <verify_out_dir>/<name>/ parquet (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle statement in DuckDB over
the same sf parquet tables, and compares: row count, column names (sorted),
and exact values (rows sorted by all columns). Exit 0 iff all green.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value form: lists -> tuples for sortability; NaN -> None
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              (hasattr(v, "tolist") and not isinstance(v, (str, bytes)))
                              else v)
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    out_dir = Path(sys.argv[1])
    only = set(sys.argv[2:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"[FAIL] {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            failures += 1
            continue
        sdf = pd.concat(
            [pd.read_parquet(f) for f in sorted(spark_dir.glob("*.parquet"))],
            ignore_index=True) if list(spark_dir.glob("*.parquet")) else pd.DataFrame()
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"[FAIL] {name}: schema spark={list(s.columns)} oracle={list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"[FAIL] {name}: rows spark={len(s)} oracle={len(o)}")
            failures += 1
            continue
        bad = None
        for i in range(len(s)):
            for c in s.columns:
                if not values_equal(s.at[i, c], o.at[i, c]):
                    bad = (i, c, s.at[i, c], o.at[i, c])
                    break
            if bad:
                break
        if bad:
            print(f"[FAIL] {name}: value mismatch row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            failures += 1
        else:
            print(f"[ ok ] {name}: {len(s)} rows")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
