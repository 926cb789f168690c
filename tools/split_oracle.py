#!/usr/bin/env python3
"""External sf-scale ground truth for the split family: the sticky
assignment queries q117/q118 plus the durable q119/q120/q121 and the
planted q123/q124 quarantine analytics.

Both queries' committed DuckDB oracles are recursive-CTE closures —
intractable above sf0.1 (see closure_oracle.py). This tool lifts the
thresholded edge set VERBATIM from the committed q120 SQL (the expensive-
to-get-wrong part, same `pr` clause as q58's) via closure_oracle's sharded
extraction, then replays the cheap parts in Python:

 - FULL closure (all edges, union-find, min-id labels) and CORPUS-ONLY
   closure (edges with b <= mx; a < b makes that both-endpoints) from the
   SAME one extraction;
 - the 80/10/10 md5 bucket, byte-identical to Md5Lower64 / DuckDB's
   md5_number_lower (lower 8 digest bytes, little-endian, logical >> 1,
   % 100) — parity with the engine is asserted against q117's singleton
   rows before any verdict;
 - q119 = corpus rows from the corpus closure + batch rows via the
   inherit/quarantine/hash CASE over full-closure components;
 - q120 = the ORIGINAL full-closure assignment restricted to the %5
   takedown survivors.

Usage: split_oracle.py <sfDir> <verifyOutDir> [nshards]

Purely a dev/audit tool — the engine never depends on it.
"""
import sys, os, glob, json, hashlib
from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon
from closure_oracle import run_shard, union_find_labels


def split_of(rep: int) -> str:
    d = hashlib.md5(f"split:{rep}".encode()).digest()
    b = (int.from_bytes(d[8:16], "little") >> 1) % 100
    return "train" if b < 80 else ("valid" if b < 90 else "test")


def extract_edges(sf_dir, oracle_sql, nshards):
    tasks = [(sf_dir, oracle_sql, nshards, i) for i in range(nshards)]
    edges = []
    with ProcessPoolExecutor(max_workers=nshards) as ex:
        for i, rows in enumerate(ex.map(run_shard, tasks)):
            edges.extend(rows)
            print(f"[split_oracle] shard {i}: +{len(rows)} edges "
                  f"(total {len(edges)})", flush=True)
    return edges


def main():
    import pandas as pd
    import duckdb
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nshards = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        all_sql = json.load(f)

    p = f"{sf_dir}/documents.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
    con = duckdb.connect()
    ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM {src} ORDER BY doc_id").fetchall()]
    mx = int(con.execute(
        f"SELECT CAST(floor(max(doc_id) * 0.9) AS BIGINT) FROM {src}"
    ).fetchone()[0])

    # one extraction serves both closures (q120's SQL = the full-corpus
    # closure shape; its pr clause is q58's verbatim); SPLIT_ORACLE_EDGES
    # caches the edge list across runs on the same corpus
    cache = os.environ.get("SPLIT_ORACLE_EDGES")
    if cache and os.path.exists(cache):
        with open(cache) as f:
            edges = [tuple(e) for e in json.load(f)]
        print(f"[split_oracle] {len(edges)} edges from cache {cache}")
    else:
        edges = extract_edges(sf_dir, all_sql["q120_split_resolve"], nshards)
        if cache:
            with open(cache, "w") as f:
                json.dump(edges, f)
    full = union_find_labels(edges)
    corpus = union_find_labels([(a, b) for a, b in edges if b <= mx])

    # engine-parity gate for the md5 bucket: q117's singletons hash their
    # own id — any byte-order or shift mismatch dies here, not in a verdict
    q117 = glob.glob(os.path.join(out_dir, "q117_cluster_split", "*.parquet"))
    if q117:
        eng = pd.concat([pd.read_parquet(f) for f in q117], ignore_index=True)
        single = eng[eng.doc_id == eng.rep].head(200)
        for _, r in single.iterrows():
            assert split_of(int(r.rep)) == r.split, \
                f"md5 parity broken at rep {r.rep}: {split_of(int(r.rep))} vs {r.split}"
        print(f"[split_oracle] md5 parity OK on {len(single)} q117 singletons")

    csplit = {i: split_of(corpus.get(i, i)) for i in ids if i <= mx}
    members = defaultdict(list)
    for i in ids:
        members[full.get(i, i)].append(i)

    def batch_split(i):
        comp = full.get(i, i)
        s = {csplit[m] for m in members[comp] if m <= mx}
        if len(s) >= 2:
            return "quarantine"
        if len(s) == 1:
            return next(iter(s))
        return split_of(comp)

    state = {i: (csplit[i] if i <= mx else batch_split(i)) for i in ids}

    def status(a, b):
        sa, sb = state[a], state[b]
        if sa == "quarantine" or sb == "quarantine":
            return "pending"
        return "ok" if sa == sb else "leak"

    se = sorted(edges)
    # q123/q124: the planted dispute family — k-th train component bridged
    # to k-th test component (k <= 3, components ordered by rep id; a
    # component's rep IS its minimum member). Pure arithmetic once the
    # corpus closure is in hand.
    corpus_comps = sorted({corpus.get(i, i) for i in ids if i <= mx})
    trains = [c for c in corpus_comps if split_of(c) == "train"][:3]
    tests = [c for c in corpus_comps if split_of(c) == "test"][:3]
    kk = min(len(trains), len(tests))
    truths = {
        # q117/q118 (r15, VERDICT r14 item 7): the closure-shaped DuckDB
        # oracles are multi-CPU-hour at sf1, but their truths are pure
        # reads off the SAME two closures this tool already builds —
        # q117 = full-closure rep + md5 bucket over every doc, q118 =
        # the batch rows' sticky inherit/quarantine/hash verdict with
        # the component rep carried along.
        "q117_cluster_split": pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "rep": pd.array([full.get(i, i) for i in ids], dtype="int64"),
            "split": [split_of(full.get(i, i)) for i in ids]}),
        "q118_split_apply": pd.DataFrame({
            "doc_id": pd.array([i for i in ids if i > mx], dtype="int64"),
            "rep": pd.array([full.get(i, i) for i in ids if i > mx],
                            dtype="int64"),
            "split": [batch_split(i) for i in ids if i > mx]}),
        "q119_split_state": pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "split": [state[i] for i in ids]}),
        "q120_split_resolve": pd.DataFrame({
            "doc_id": pd.array([i for i in ids if i % 5 != 0], dtype="int64"),
            "split": [split_of(full.get(i, i)) for i in ids if i % 5 != 0]}),
        "q121_wall_audit": pd.DataFrame({
            "a": pd.array([a for a, _ in se], dtype="int64"),
            "b": pd.array([b for _, b in se], dtype="int64"),
            "split_a": [state[a] for a, _ in se],
            "split_b": [state[b] for _, b in se],
            "status": [status(a, b) for a, b in se]}),
        "q123_quarantine_aging": pd.DataFrame({
            "doc_id": pd.array([mx + 1000000 + k for k in range(1, kk + 1)],
                               dtype="int64"),
            "entered_seq": pd.array([1] * kk, dtype="int64"),
            "drained_seq": pd.array([2] * kk, dtype="int64"),
            "age": pd.array([1] * kk, dtype="int64")}),
        "q124_quarantine_pool": pd.DataFrame({
            "seq": pd.array([0, 1, 2], dtype="int64"),
            "pool": pd.array([0, kk, 0], dtype="int64")}),
    }

    ok = True
    for name, truth in truths.items():
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO_SPARK_OUTPUT"); ok = False; continue
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
