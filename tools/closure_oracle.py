#!/usr/bin/env python3
"""Fast external ground truth for q58/q87 (connected-component clustering).

The committed oracle for these queries is a DuckDB recursive-CTE transitive
closure.  That is fine at sf0.01 (seconds) but at sf1 the recursion is
single-thread-bound and materializes an O(nodes x component-size) `reach`
relation — the round-7 sweep had it still running after 2h10m per query.
This tool keeps the EXPENSIVE-TO-GET-WRONG part of the oracle byte-identical
(the thresholded edge set: the `pr` clause is lifted verbatim from the
committed q58 SQL in oracle_sql.json, never re-authored here) and replaces
only the closure step — a textbook graph algorithm — with a Python
union-find, labelling each component by its minimum member id, which is
exactly what `min(r) GROUP BY node` over the reachability relation computes.

Edge extraction is sharded by the blocking key (`a.blk % N = i`, legal
because the join requires a.blk = b.blk) and fanned across processes, since
DuckDB's list_intersect Jaccard evaluation is the dominant cost and is
per-pair independent.

Usage: closure_oracle.py <sfDir> <verifyOutDir> [nshards]

Compares the computed (node, label) frame against the engine parquet in
<verifyOutDir>/{q58_dedup_clusters,q87_incremental_clusters} using the same
canonicalization as check_oracle.py.  Purely a dev/audit tool — the engine
never depends on it.
"""
import sys, os, glob, json
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon  # same canon => same verdict semantics

QUERIES = ["q58_dedup_clusters", "q87_incremental_clusters",
           "q110_cluster_deletion"]


def edge_sql(oracle_sql: str, nshards: int, shard: int) -> str:
    """Truncate the committed q58 SQL after the `pr` CTE and select its
    edges, with a shard predicate pushed into pr's WHERE clause.  Both sides
    get the predicate explicitly (a.blk = b.blk makes them equivalent) so
    DuckDB prunes each join input before the expensive Jaccard evaluation."""
    cut = oracle_sql.find(" und AS")
    marker = "WHERE round(len(list_intersect"
    if cut < 0 or marker not in oracle_sql[:cut]:
        raise SystemExit("q58 oracle SQL shape changed; update closure_oracle.py")
    prefix = oracle_sql[:cut].rstrip().rstrip(",")
    shard_pred = f"WHERE a.blk % {nshards} = {shard} AND b.blk % {nshards} = {shard} AND round(len(list_intersect"
    prefix = prefix.replace(marker, shard_pred)
    return prefix + "\nSELECT a, b FROM pr"


def run_shard(args):
    sf_dir, oracle_sql, nshards, shard = args
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 2")
    p = f"{sf_dir}/documents.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
    rows = con.execute(edge_sql(oracle_sql, nshards, shard)).fetchall()
    return rows


def union_find_labels(edges):
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the component label
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {n: find(n) for n in parent}


def truth_for(sf_dir, oracle_sql, nshards):
    """Edges (sharded DuckDB, lifting the committed SQL's pr clause verbatim
    — including any document filter in its t CTE, e.g. q110's
    `WHERE doc_id % 17 <> 0`) → union-find labels → (node, label) frame."""
    import pandas as pd
    tasks = [(sf_dir, oracle_sql, nshards, i) for i in range(nshards)]
    edges = []
    with ProcessPoolExecutor(max_workers=nshards) as ex:
        for i, rows in enumerate(ex.map(run_shard, tasks)):
            edges.extend(rows)
            print(f"[closure_oracle] shard {i}: +{len(rows)} edges "
                  f"(total {len(edges)})", flush=True)
    labels = union_find_labels(edges)
    # explicit int64 dtypes so a zero-edge run compares cleanly against the
    # engine's (possibly empty) long-typed parquet instead of object-vs-int64
    truth = pd.DataFrame(
        {"node": pd.array(list(labels.keys()), dtype="int64"),
         "label": pd.array(list(labels.values()), dtype="int64")})
    print(f"[closure_oracle] {len(edges)} edges, {len(truth)} labelled nodes, "
          f"{truth['label'].nunique()} components", flush=True)
    return truth


def main():
    import pandas as pd
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nshards = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        all_sql = json.load(f)

    # per-query truth from THAT query's committed SQL (q110 filters the
    # document set before pair generation — its closure differs from
    # q58/q87's); identical SQL strings share one computed truth
    truths = {}
    ok = True
    for name in QUERIES:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO_SPARK_OUTPUT"); ok = False; continue
        sql = all_sql[name]
        if sql not in truths:
            truths[sql] = truth_for(sf_dir, sql, nshards)
        truth = truths[sql]
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        a, b = canon(spark_df.copy()), canon(truth.copy())
        if list(a.columns) != list(b.columns):
            print(f"{name}: SCHEMA_MISMATCH spark={list(a.columns)} "
                  f"truth={list(b.columns)}"); ok = False
        elif len(a) != len(b):
            print(f"{name}: ROWCOUNT_MISMATCH spark={len(a)} truth={len(b)}")
            ok = False
        elif len(a) > 0 and not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            idx = neq.any(axis=1).idxmax()
            print(f"{name}: VALUE_MISMATCH firstrow={idx} "
                  f"spark={a.loc[idx].to_dict()} truth={b.loc[idx].to_dict()}")
            ok = False
        else:
            print(f"{name}: OK rows={len(a)}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
