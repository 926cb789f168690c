#!/usr/bin/env python3
"""Compare two Bench records (base scale vs k-times scale) and emit the
scaling table for BENCH_SF1.md.

Usage: python3 tools/scale_report.py <base.json> <scaled.json> <k>

Per query: ratio = scaled_min / base_min (trial MINIMA — the contention
floor; medians inherit sandbox noise). A query is flagged super-linear when
ratio > k * MARGIN; sub-second base times get an absolute floor so fixed
overhead (session setup, tiny-table scans) doesn't read as super-linear
scaling. Purely a dev tool — the engine itself never depends on this.

Caveat when reading ratios near the flag line: k counts ROWS. The sf1/sf10
inputs derive from ScaleUp, whose per-replica dedup-preserving token
suffixes lengthen every document (sf0.1 -> sf1 is 10x rows but 13.3x
characters: 1.49M -> 19.7M), so a chars-linear text query legitimately
reads ~13x at "10x"; and single-row-group test files cap scan parallelism,
so pre-shuffle per-row work cannot spread over cores the way a multi-file
100 TB layout would. Check sum(n_chars) and row-group counts before calling
a 10-14x ratio super-linear (see BUILDLOG round 10, q33/q35 adjudication).
"""
import sys, json

MARGIN = 1.5      # ratio above k*MARGIN => flagged (tightened from 2.0, r10)
ABS_FLOOR = 0.35  # base seconds below which fixed overhead dominates

def main():
    base_f, scaled_f, k = sys.argv[1], sys.argv[2], float(sys.argv[3])
    base = json.load(open(base_f))
    scaled = json.load(open(scaled_f))
    bq = base.get("queries_min") or base["queries"]
    sq = scaled.get("queries_min") or scaled["queries"]
    rows = []
    for name in sorted(bq):
        if name not in sq:
            continue
        b, s = bq[name], sq[name]
        if b <= 0 or s <= 0:
            rows.append((name, b, s, None, "FAILED"))
            continue
        ratio = s / b
        flag = ""
        if ratio > k * MARGIN and b >= ABS_FLOOR:
            flag = "SUPER-LINEAR"
        elif ratio > k * MARGIN:
            flag = "overhead-dominated base"
        rows.append((name, b, s, ratio, flag))
    print(f"| query | base s | {int(k)}x s | ratio | note |")
    print("|---|---|---|---|---|")
    for name, b, s, ratio, flag in rows:
        r = f"{ratio:.1f}x" if ratio else "-"
        print(f"| {name} | {b:.3f} | {s:.3f} | {r} | {flag} |")
    ok = [r for r in rows if r[3]]
    flagged = [r for r in rows if r[4] == "SUPER-LINEAR"]
    failed = [r for r in rows if r[4] == "FAILED"]
    tot_b = sum(r[1] for r in ok)
    tot_s = sum(r[2] for r in ok)
    print()
    print(f"Total (min-sum, both-present): {tot_b:.1f} s -> {tot_s:.1f} s "
          f"= {tot_s/tot_b:.1f}x at {int(k)}x data")
    # box-speed normalization (VERDICT r17 item 4): calib_sec is a fixed
    # single-threaded CPU probe each record carries; a ratio of calibs != 1
    # means the two records ran on differently-loaded/speced boxes and the
    # raw total ratio is polluted by exactly that factor
    cb, cs = base.get("calib_sec"), scaled.get("calib_sec")
    if cb and cs and cb > 0 and cs > 0:
        print(f"Box calibration: base calib {cb:.2f} s, scaled calib {cs:.2f} s "
              f"(box-speed ratio {cs/cb:.2f}x); calib-normalized total "
              f"= {tot_s/tot_b/(cs/cb):.1f}x at {int(k)}x data")
    else:
        print("Box calibration: calib_sec absent from one or both records — "
              "raw ratios only (pre-r18 record)")
    print(f"Median per-query ratio: "
          f"{sorted(r[3] for r in ok)[len(ok)//2]:.1f}x")
    print(f"Flagged super-linear (> {k*MARGIN:.0f}x, base >= {ABS_FLOOR}s): "
          f"{[r[0] for r in flagged] or 'none'}")
    print(f"Failed: {[r[0] for r in failed] or 'none'}")
    sys.exit(1 if failed or flagged else 0)

if __name__ == "__main__":
    main()
