#!/usr/bin/env python3
"""External sf-scale ground truth for q53_ngram_jaccard (top-20 near-dup
pairs by Jaccard).

The committed DuckDB oracle is the FULL same-block pair join ordered by
jac — measured 75 minutes single-connection at sf1 (why fan_oracle
excludes it). But the top-20 of a union is the top-20 of the merged
per-shard top-20s when the shards PARTITION the pair space, and the
block-equality join key makes `a.blk % N = i` such a partition. So this
tool lifts q53's committed SQL verbatim, pushes the shard predicate into
the join, takes each shard's `ORDER BY jac DESC, a, b LIMIT 20`, merges,
re-sorts with the same key, and compares the global top-20 to the engine
parquet. Exact — no sampling, no threshold assumptions.

Usage: q53_oracle.py <sfDir> <verifyOutDir> [nshards]

Purely a dev/audit tool — the engine never depends on it.
"""
import sys, os, glob, json
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon


def shard_sql(oracle_sql: str, nshards: int, shard: int) -> str:
    marker = "FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id"
    if marker not in oracle_sql:
        raise SystemExit("q53 oracle SQL shape changed; update q53_oracle.py")
    return oracle_sql.replace(
        marker, marker + f" AND a.blk % {nshards} = {shard}")


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
    import pandas as pd
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nshards = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        sql = json.load(f)["q53_ngram_jaccard"]
    rows = []
    tasks = [(sf_dir, sql, nshards, i) for i in range(nshards)]
    with ProcessPoolExecutor(max_workers=nshards) as ex:
        for i, part in enumerate(ex.map(run_shard, tasks)):
            rows.extend(part)
            print(f"[q53_oracle] shard {i}: top-{len(part)} "
                  f"(pool {len(rows)})", flush=True)
    # same ordering as the committed SQL: jac DESC, a, b — ties included
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    truth = pd.DataFrame(rows[:20], columns=["a", "b", "jac"])
    truth["a"] = truth["a"].astype("int64")
    truth["b"] = truth["b"].astype("int64")
    files = glob.glob(os.path.join(out_dir, "q53_ngram_jaccard", "*.parquet"))
    if not files:
        print("q53_ngram_jaccard: NO_SPARK_OUTPUT"); sys.exit(1)
    eng = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    a, b = canon(eng.copy()), canon(truth.copy())
    if list(a.columns) != list(b.columns):
        print(f"q53_ngram_jaccard: SCHEMA_MISMATCH {list(a.columns)} vs {list(b.columns)}")
        sys.exit(1)
    if len(a) != len(b) or (len(a) > 0 and not a.equals(b)):
        print("q53_ngram_jaccard: MISMATCH")
        print("engine:\n", a.head(25)); print("truth:\n", b.head(25))
        sys.exit(1)
    print(f"q53_ngram_jaccard: OK rows={len(a)}")
    sys.exit(0)


if __name__ == "__main__":
    main()
