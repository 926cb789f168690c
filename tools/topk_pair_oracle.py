#!/usr/bin/env python3
"""Sharded external ground truth for q53 (top-k n-gram-Jaccard pairs).

The committed q53 oracle evaluates list-Jaccard over every block-bucketed
candidate pair and takes the global top-20 — DuckDB runs the pair
evaluation single-threaded for ~1.5 h at sf1. Same trick as
closure_oracle.py: the pair SQL is lifted VERBATIM from the committed
oracle in oracle_sql.json (never re-authored), sharded by the blocking key
(`a.blk % N = i` — legal because the join requires a.blk = b.blk, so
shards partition the candidate space), and the per-shard top-20s are
merged with the same global ORDER BY jac DESC, a, b LIMIT 20 — exact,
because the global top-20 is contained in the union of per-shard top-20s
over a disjoint partition of the pairs.

Usage: topk_pair_oracle.py <sfDir> <verifyOutDir> [nshards]
"""
import sys, os, glob, json
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon

QUERY = "q53_ngram_jaccard"


def shard_sql(oracle_sql: str, nshards: int, shard: int) -> str:
    marker = "FROM sh a JOIN sh b ON a.blk = b.blk"
    if marker not in oracle_sql:
        raise SystemExit("q53 oracle SQL shape changed; update topk_pair_oracle.py")
    return oracle_sql.replace(
        marker, marker + f" AND a.blk % {nshards} = {shard} AND b.blk % {nshards} = {shard}")


def run_shard(args):
    sf_dir, oracle_sql, nshards, shard = args
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 2")
    p = f"{sf_dir}/documents.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
    return con.execute(shard_sql(oracle_sql, nshards, shard)).fetchall()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nshards = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    import pandas as pd
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)[QUERY]

    tasks = [(sf_dir, oracle_sql, nshards, i) for i in range(nshards)]
    rows = []
    with ProcessPoolExecutor(max_workers=nshards) as ex:
        for i, part in enumerate(ex.map(run_shard, tasks)):
            rows.extend(part)
            print(f"[topk_pair_oracle] shard {i}: top-{len(part)} "
                  f"(pool {len(rows)})", flush=True)
    # the committed oracle's global order + limit, replayed over the pool.
    # NULL jac (degenerate sub-3-token docs: 0/0 -> NULL in DuckDB) sorts
    # LAST like DuckDB's default NULLS LAST, instead of crashing unary minus
    rows.sort(key=lambda r: (r[2] is None, -(r[2] or 0.0), r[0], r[1]))
    truth = pd.DataFrame(rows[:20], columns=["a", "b", "jac"])

    files = glob.glob(os.path.join(out_dir, QUERY, "*.parquet"))
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    a, b = canon(spark_df.copy()), canon(truth.copy())
    if list(a.columns) != list(b.columns):
        print(f"{QUERY}: SCHEMA_MISMATCH spark={list(a.columns)} truth={list(b.columns)}")
    elif len(a) != len(b):
        print(f"{QUERY}: ROWCOUNT_MISMATCH spark={len(a)} truth={len(b)}")
    elif not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        idx = neq.any(axis=1).idxmax()
        print(f"{QUERY}: VALUE_MISMATCH firstrow={idx} "
              f"spark={a.loc[idx].to_dict()} truth={b.loc[idx].to_dict()}")
    else:
        print(f"{QUERY}: OK rows={len(a)}")
        sys.exit(0)
    sys.exit(1)


if __name__ == "__main__":
    main()
