#!/usr/bin/env python3
"""Registry-wide scaling report: compare two bench per-query JSON files
(cs-int values, bare numeric keys) taken at two data scales and print the
per-query growth ratio table. Used for the sf0.1 -> sfx10 (sf1-equivalent)
certification (SCALING.md, round 12).

Usage: scaling_report.py <small.json> <big.json> [scale_factor=10]

Ratios below ~1.0 and tiny absolute times mean constant-dominated queries
(JVM/planning overhead), not sublinear miracles; the interesting tail is
ratio >> scale_factor on non-trivial absolute times.
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d["queries"] if "queries" in d else d


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for k in sorted(set(small) & set(big), key=lambda x: int(x)):
        s, b = small[k], big[k]
        if s < 0 or b < 0:
            rows.append((float("inf"), k, s, b, "FAILED"))
            continue
        ratio = (b / s) if s > 0 else float(b)
        rows.append((ratio, k, s, b, ""))
    rows.sort(reverse=True)
    print(f"{'q':>4} {'small_cs':>9} {'big_cs':>8} {'ratio':>7}  note")
    for ratio, k, s, b, note in rows:
        flag = ""
        if note:
            flag = note
        elif ratio > sf * 1.5 and b >= 100:
            flag = "SUPERLINEAR?"
        elif ratio > sf * 1.5:
            flag = "small-abs"
        print(f"{k:>4} {s:>9} {b:>8} {ratio:>7.2f}  {flag}")
    ok = [r for r in rows if r[4] == ""]
    tot_s = sum(r[2] for r in ok)
    tot_b = sum(r[3] for r in ok)
    print(f"\ncommon {len(ok)} queries: {tot_s/100:.2f}s -> {tot_b/100:.2f}s "
          f"(x{tot_b/max(tot_s,1):.2f} at {sf:g}x data)")
    sup = [r for r in rows if r[4] == "" and r[0] > sf * 1.5 and r[3] >= 100]
    print(f"superlinear candidates (ratio>{sf*1.5:g}, big>=1s): "
          f"{[r[1] for r in sup] or 'none'}")
    missing = sorted(set(small) ^ set(big), key=int)
    if missing:
        print(f"only in one file: {missing}")


if __name__ == "__main__":
    main()
