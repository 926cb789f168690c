#!/usr/bin/env python3
"""Derived ground truth for the clustering family on a ScaleUp-replicated
corpus (the sf10 = 100x run).

The full DuckDB closure oracle is quadratic-per-block in documents and
infeasible at sf10 (the sf1 truth already costs ~20 min x 16 processes;
sf10 is ~10x that per replica x 10 replicas).  ScaleUp's construction
licenses a cheaper exact check:

 1. REPLICA 0 IS THE SOURCE CORPUS, byte-identical (ids, text, n_chars
    unchanged) — and cross-replica shingle overlap is ZERO by construction
    (every token of replica r >= 1 carries a `~r` suffix), so no verified
    pair (jac >= 0.5 >> 0) ever crosses replicas and replica 0's component
    structure in the scaled corpus EQUALS the source corpus's.  The scaled
    output restricted to node < span must therefore hash-equal the
    source-scale output that the sharded DuckDB closure oracle
    (closure_oracle.py) already validated.

 2. NO edge crosses replicas => every node's label lives in its own
    replica band: floor(node / span) == floor(label / span) for ALL rows.
    A single spill of label propagation across a replica boundary (the
    failure mode a buggy incremental path would produce) breaks this.

Together: an exact hash check on 1/10th of the corpus against a
DuckDB-backed truth, plus a structural invariant over the whole corpus.
Replicas 1..k-1's INTERNAL structure differs from the source (the token
suffix changes n_chars and hence the length-bucket blocking), so it is
checked by invariant (2), not derived from (1).

CAVEAT — the scaled corpus must come from ONE ScaleUp application over the
corpus `srcVerifyDir` was validated on.  NESTED applications break the
zero-cross-overlap premise: ScaleUp(ScaleUp(sf0.1, 10), 10) suffixes
sf1-replica-0's docs with `~1`, producing text byte-identical to
sf1-replica-1's (`t~1` via both paths) — real cross-band near-dup pairs,
caught as BAND_VIOLATIONs on the first attempt of the r9 sf10 run.  Use
ScaleUp(sf0.1, 100) instead (suffixes ~1..~99, pairwise distinct).

Usage: replica_oracle.py <srcVerifyDir> <scaledVerifyDir> <span>
  span = source corpus doc-id span (max doc_id + 1), the ScaleUp shift.

Checks every query in QUERIES present in both dirs.  Purely a dev/audit
tool — the engine never depends on it.
"""
import sys, os, glob

QUERIES = ["q58_dedup_clusters", "q87_incremental_clusters",
           "q110_cluster_deletion"]


def read_labels(d, name):
    import pandas as pd
    files = glob.glob(os.path.join(d, name, "*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df[["node", "label"]].astype("int64")


def main():
    src_dir, scaled_dir, span = sys.argv[1], sys.argv[2], int(sys.argv[3])
    ok = True
    for name in QUERIES:
        src = read_labels(src_dir, name)
        scaled = read_labels(scaled_dir, name)
        if src is None or scaled is None:
            print(f"{name}: SKIPPED (missing output)")
            continue
        # invariant 2: labels never cross replica bands
        crossers = scaled[(scaled["node"] // span) != (scaled["label"] // span)]
        if len(crossers):
            print(f"{name}: BAND_VIOLATION {len(crossers)} rows, first="
                  f"{crossers.iloc[0].to_dict()}")
            ok = False
            continue
        # invariant 1: replica 0 == the validated source-scale output
        rep0 = scaled[scaled["node"] < span].sort_values("node").reset_index(drop=True)
        src_s = src.sort_values("node").reset_index(drop=True)
        if not rep0.equals(src_s):
            merged = rep0.merge(src_s, on="node", how="outer", indicator=True,
                                suffixes=("_scaled", "_src"))
            bad = merged[(merged["_merge"] != "both") |
                         (merged["label_scaled"] != merged["label_src"])]
            print(f"{name}: REPLICA0_MISMATCH {len(bad)} rows, first="
                  f"{bad.iloc[0].to_dict() if len(bad) else '?'}")
            ok = False
            continue
        n_reps = (scaled["node"] // span).nunique()
        print(f"{name}: OK rows={len(scaled)} replica0={len(rep0)} "
              f"replicas={n_reps} (replica0 hash-equal to validated source; "
              f"zero cross-band labels)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
