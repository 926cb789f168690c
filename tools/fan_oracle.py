#!/usr/bin/env python3
"""Fan tools/check_oracle.py across processes, one query per task.

The sf1 oracle compares are embarrassingly parallel but wildly skewed
(q53's n-gram Jaccard runs ~75 min single-threaded in DuckDB while most
queries take seconds), so a fixed chunking wastes cores. This driver runs
a process pool with one query per task, LONGEST-FIRST so the heavy poles
start immediately, and streams verdict lines as they land.

q58/q87/q110 are excluded by default: their ground truth is the recursive-CTE
closure, intractable in DuckDB above sf0.1 — tools/closure_oracle.py is
the fast external oracle for those two (run it separately).

Usage: fan_oracle.py <sfDir> <verifyOutDir> [workers] [--include-closure]
                     [--skip q53_ngram_jaccard,...]

--skip hands named queries to their own sharded external oracle (e.g. q53's
top-k pairs via topk_pair_oracle.py) instead of the serial DuckDB compare.
"""
import sys, os, json, subprocess
from concurrent.futures import ProcessPoolExecutor, as_completed

CLOSURE = {"q58_dedup_clusters", "q87_incremental_clusters",
           "q110_cluster_deletion",
           # the split/quarantine family's oracles are recursive-CTE
           # closures too — tools/split_oracle.py is their sf-scale truth
           "q119_split_state", "q120_split_resolve", "q121_wall_audit",
           "q123_quarantine_aging", "q124_quarantine_pool",
           # q117/q118 embed the same closure CTEs (multi-CPU-hour in
           # DuckDB at sf1, measured r14); their sf-scale truth is
           # derived from q58's closure-oracle validation (BUILDLOG r11)
           # — gate them at sf0.01 + specs, never through this fan
           "q117_cluster_split", "q118_split_apply",
           # q122/q125's committed oracles pair EXHAUSTIVELY (sig × sig,
           # r14 — independent of the candidate path), O(N²) above
           # sf0.01 — tools/media_sf1_oracle.py is their sf-scale truth
           # (radius-2 enumeration replay, same exact answer)
           "q122_media_neardup", "q125_media_vs_index"}
# longest-observed-first (sf1 sweep telemetry); everything else after
HEAVY_ORDER = ["q53_ngram_jaccard", "q51_minhash_lsh", "q74_incremental_dedup",
               "q97_cross_source_dups", "q52_simhash", "q63_embedding_neardup",
               "q66_sim_join_lsh", "q83_semantic_dedup", "q50_dedup_exact"]


def run_one(args):
    sf_dir, out_dir, name = args
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "check_oracle.py"), sf_dir, out_dir, name],
        capture_output=True, text=True)
    verdict = [l for l in p.stdout.splitlines() if l.startswith(("PASS", "FAIL"))]
    return name, (verdict[0] if verdict else f"NO_VERDICT rc={p.returncode} "
                  f"{p.stdout[-200:]} {p.stderr[-200:]}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else 10
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        names = set(json.load(f))
    if "--include-closure" not in sys.argv:
        names -= CLOSURE
    for i, a in enumerate(sys.argv):
        if a == "--skip" and i + 1 < len(sys.argv):
            names -= set(sys.argv[i + 1].split(","))
    ordered = [q for q in HEAVY_ORDER if q in names] + \
              sorted(names - set(HEAVY_ORDER))
    npass = nfail = 0
    with ProcessPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(run_one, (sf_dir, out_dir, n)) for n in ordered]
        for fut in as_completed(futs):
            name, verdict = fut.result()
            print(verdict, flush=True)
            if verdict.startswith("PASS"):
                npass += 1
            else:
                nfail += 1
    print(f"\n{npass}/{npass + nfail} pass"
          + (" (+ q58/q87/q110 via closure_oracle.py)" if CLOSURE - names else ""))
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
