#!/usr/bin/env python3
"""Fuzz the q107 ORACLE SQL itself against an independent re-derivation.

The Scala property test (AuditSpec "random NULL-heavy histories") covers the
SPARK side of q107; this covers the DUCKDB side: generate random NULL-heavy
order histories, run the COMMITTED oracle SQL verbatim (read from a Verify
dump's oracle_sql.json), and compare against a plain-Python run-fold. A
shared mistake between the Spark plan and its oracle SQL is the one failure
mode the hash gate can't see — this tool and that spec check the two sides
against the same independent semantics. Purely a dev tool.

Usage: python3 tools/scd2_oracle_fuzz.py <verifyOutDir> [cases=200]
"""
import sys, json, random, datetime
import duckdb


def reference(rows):
    """rows: (custkey, orderkey, orderdate, prio, status) — run-fold per key.
    First observation always opens version 1 (the engine contract)."""
    out = []
    bykey = {}
    for r in rows:
        bykey.setdefault(r[0], []).append(r)
    for k, rs in bykey.items():
        rs.sort(key=lambda r: (r[2], r[1]))
        runs = []
        for _, _, t, p, st in rs:
            if runs and runs[-1][0] == (p, st):
                runs[-1][1].append(t)
            else:
                runs.append([(p, st), [t]])
        for i, ((p, st), times) in enumerate(runs):
            valid_to = runs[i + 1][1][0] if i + 1 < len(runs) else None
            out.append((k, i + 1, p, st, times[0], valid_to, len(times)))
    return sorted(out, key=lambda r: (r[0], r[1]))


def main():
    out_dir = sys.argv[1]
    cases = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)["q107_scd2_multi"]
    rng = random.Random(42)
    day0 = datetime.date(2024, 1, 1)
    for case in range(cases):
        n = rng.randrange(0, 15)
        rows = [(rng.randrange(1, 4), i, day0 + datetime.timedelta(days=rng.randrange(0, 7)),
                 rng.choice([None, "A", "B"]), rng.choice([None, "X", "Y"]))
                for i in range(n)]
        if not rows:
            continue
        con = duckdb.connect()
        con.execute("""CREATE TABLE orders (o_custkey BIGINT, o_orderkey BIGINT,
            o_orderdate DATE, o_orderpriority VARCHAR, o_orderstatus VARCHAR)""")
        con.executemany("INSERT INTO orders VALUES (?,?,?,?,?)", rows)
        got = [(r[0], r[1], r[2], r[3],
                r[4].date() if hasattr(r[4], "date") else r[4],
                r[5].date() if r[5] is not None and hasattr(r[5], "date") else r[5],
                r[6]) for r in con.execute(sql).fetchall()]
        got = sorted(got, key=lambda r: (r[0], r[1]))
        expect = reference(rows)
        if got != expect:
            print(f"FAIL case {case}: rows={rows}")
            print(f"  oracle: {got}")
            print(f"  expect: {expect}")
            sys.exit(1)
        con.close()
    print(f"PASS: q107 oracle SQL matches the independent run-fold on {cases} random NULL-heavy histories")


if __name__ == "__main__":
    main()
