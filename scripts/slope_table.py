#!/usr/bin/env python3
"""Build the BASELINE.md scale-slope table from two bench JSONs.

Usage: slope_table.py <bench_small.json> <bench_big.json> <factor_label>

Prints a markdown table of per-query medians and wall slopes, sorted
by slope descending, plus the total slope line.
"""
import sys, json

def load(p):
    with open(p) as f:
        return json.loads(f.read().strip().splitlines()[-1])

def main():
    small, big, label = sys.argv[1], sys.argv[2], sys.argv[3]
    a, b = load(small), load(big)
    qa, qb = a["queries"], b["queries"]
    names = [n for n in qb if n in qa and qa[n] > 0 and qb[n] > 0]
    rows = sorted(((n, qa[n], qb[n], qb[n] / qa[n]) for n in names),
                  key=lambda r: -r[3])
    print(f"| Query | {label} small | {label} big | wall slope |")
    print("| --- | ---: | ---: | ---: |")
    for n, x, y, s in rows:
        print(f"| {n} | {x:.2f} | {y:.2f} | {s:.1f}x |")
    ta = sum(qa[n] for n in names)
    tb = sum(qb[n] for n in names)
    print(f"| **total ({len(names)} shared)** | **{ta:.2f}** "
          f"| **{tb:.2f}** | **{tb/ta:.2f}x** |")
    for k in ("queries_attached",):
        if k in a and k in b:
            sa, sb = a[k], b[k]
            shared = [n for n in sb if n in sa and sa[n] > 0 and sb[n] > 0]
            print(f"\nattached: " + ", ".join(
                f"{n} {sa[n]:.2f}->{sb[n]:.2f}s" for n in shared))
    print(f"\nloadavg: small {a.get('loadavg_start')}, "
          f"big {b.get('loadavg_start')}")

if __name__ == "__main__":
    main()
