#!/usr/bin/env python3
"""Bench regression check against BOTH baselines (r11 verdict #4).

Usage: python3 scripts/check_bench.py <bench_json> [--stat median|min]

Compares a bench artifact (target/bench.json or a committed
BENCH_r*_local.json) against:

1. BASELINE.md — the reference engine's historical round-1 table
   (39 scenarios). Gate: each overlapping scenario must be < 2x the
   reference number (the driver's original rule).
2. BASELINE_r11.md — the forward-binding full-suite reference
   (all scenarios, medians from BENCH_r11_local.json). Gate: each
   scenario must be < 1.5x its r11 median + 0.5 s absolute slack
   (sub-2 s scenarios whipsaw under load; the slack keeps noise-band
   flips out of the report, per the r10/r11 adjudications).

Exit code 0 = all green; 1 = any breach. Breaches are a to-investigate
list, not an automatic fail: re-measure isolated (SPARK_GRAFT_BENCH_ONLY)
before calling a regression real.
"""
import json
import re
import sys


def parse_md_table(path):
    """name -> seconds from a `| name | 1.23 |` markdown table."""
    out = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    stat = "median"
    if "--stat" in sys.argv:
        i = sys.argv.index("--stat")
        if i + 1 >= len(sys.argv) or sys.argv[i + 1] not in ("median", "min"):
            sys.exit("usage: check_bench.py <bench_json> [--stat median|min]")
        stat = sys.argv[i + 1]
    with open(bench_path) as f:
        bench = json.load(f)
    queries = bench.get("queries_median" if stat == "median" else "queries",
                        bench.get("queries", {}))
    # sliced gates measure a data subset; their numbers are not
    # baseline-comparable (the artifact names them)
    sliced = set(bench.get("sliced_gates", []))

    ref = parse_md_table("BASELINE.md")
    fwd = parse_md_table("BASELINE_r11.md")

    breaches = []

    # Bench records a crashed scenario family as -1.0 (guarded()'s
    # sentinel); a negative "time" beats every baseline, so without this
    # check an OOMed scenario reads as a pass
    failed = sorted(n for n, v in queries.items() if v < 0)
    for name in failed:
        breaches.append(f"scenario FAILED in bench (recorded {queries[name]}): {name}")

    n_ref = 0
    for name, base in sorted(ref.items()):
        if name not in queries or name in sliced:
            continue
        n_ref += 1
        ours = queries[name]
        if ours >= 2.0 * base:
            breaches.append(
                f"vs BASELINE.md   {name}: {ours:.2f}s >= 2x {base:.2f}s")
    print(f"BASELINE.md   : {n_ref} overlapping scenarios checked (2x gate)")

    n_fwd = 0
    for name, base in sorted(fwd.items()):
        if name not in queries or name in sliced:
            continue
        n_fwd += 1
        ours = queries[name]
        if ours >= 1.5 * base + 0.5:
            breaches.append(
                f"vs BASELINE_r11 {name}: {ours:.2f}s >= 1.5x {base:.2f}s + 0.5s")
    print(f"BASELINE_r11.md: {n_fwd} scenarios checked (1.5x + 0.5s gate)")

    new = sorted(set(queries) - set(fwd) - sliced)
    if new:
        print(f"new since r11 (no forward baseline yet): {', '.join(new)}")

    if breaches:
        print(f"\n{len(breaches)} breach(es) to investigate:")
        for b in breaches:
            print("  " + b)
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
