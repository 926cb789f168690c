#!/usr/bin/env python3
"""sf1 leg for the media near-dup queries (VERDICT r13 demand 5).

At sf0.01 the committed oracles for q122/q125 pair EXHAUSTIVELY
(sig x sig bit_count — independent of any candidate machinery). That
form is O(N^2) in DuckDB and infeasible at sf1 (~60k signatures), so
this tool patches those oracles' `pairs` CTE into the radius-2
chunk-variant enumeration (137 masks per 16-bit chunk, one side) —
pigeonhole-COMPLETE for Hamming <= 11 > the verify threshold 10, so it
computes the SAME exact Hamming-range answer with banded-join cost —
and then runs the standard check_oracle comparison. q126's oracle is
fixed-size (500 docs x 13 grades) and runs unpatched at any sf.

Usage: python3 tools/media_sf1_oracle.py <sfDir> <verifyOutDir>
  (expects <verifyOutDir> to hold Verify output incl. oracle_sql.json
   for q122_media_neardup, q125/q127 variants, q126_media_lsh_recall)
"""
import sys, os, json, subprocess

EXHAUSTIVE_TAIL = (
    " pairs AS (SELECT x.doc_id AS a, y.doc_id AS b,\n"
    "   CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming\n"
    "   FROM sig x JOIN sig y ON x.doc_id < y.doc_id)"
)

ENUMERATED_TAIL = (
    " chunksq AS (SELECT doc_id, lo, hi, c,\n"
    "   CASE c WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535\n"
    "        WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS ch\n"
    "   FROM sig CROSS JOIN range(4) t(c)),\n"
    " masks AS (SELECT m FROM range(65536) t(m) WHERE bit_count(m) <= 2),\n"
    " vars AS (SELECT doc_id, lo, hi, c, xor(ch, m) AS ch\n"
    "          FROM chunksq CROSS JOIN masks),\n"
    " pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,\n"
    "   CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming\n"
    "   FROM vars x JOIN chunksq y\n"
    "   ON x.c = y.c AND x.ch = y.ch AND x.doc_id < y.doc_id\n"
    "   WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= 11)"
)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    path = os.path.join(out_dir, "oracle_sql.json")
    with open(path) as f:
        oracles = json.load(f)
    patched = 0
    for q in ("q122_media_neardup", "q125_media_vs_index", "q127_media_neardup_h7"):
        if q in oracles:
            if ENUMERATED_TAIL in oracles[q]:
                # idempotent re-run (ADVICE r14): a previous invocation
                # already rewrote this oracle in place — count it as
                # patched and move on instead of tripping the shape assert
                patched += 1
                continue
            assert EXHAUSTIVE_TAIL in oracles[q], \
                f"{q}: exhaustive pairs CTE not found — oracle shape changed?"
            oracles[q] = oracles[q].replace(EXHAUSTIVE_TAIL, ENUMERATED_TAIL)
            patched += 1
    assert patched, "nothing to patch — run Verify for the media queries first"
    with open(path, "w") as f:
        json.dump(oracles, f)
    print(f"[media_sf1_oracle] patched {patched} oracles -> enumeration form")
    # restrict check_oracle to the media queries: an unfiltered run walks
    # the WHOLE oracle list, including the closure-shaped q53/q58/q117/...
    # oracles that are multi-CPU-hours at sf1 (r15 — the r14 run was
    # watched and killed by hand after the media lines printed)
    media = "q122_media_neardup,q125_media_vs_index,q127_media_neardup_h7,q126_media_lsh_recall"
    sys.exit(subprocess.call([sys.executable,
        os.path.join(os.path.dirname(__file__), "check_oracle.py"),
        sf_dir, out_dir, media]))


if __name__ == "__main__":
    main()
