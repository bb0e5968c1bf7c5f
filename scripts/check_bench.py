#!/usr/bin/env python3
"""Bench regression check against BOTH baselines (r11 verdict #4,
refreshed r13 per r12 verdict #2/#3).

Usage: python3 scripts/check_bench.py <bench_json> [--stat median|min]

Compares a bench artifact (target/bench.json or a committed
BENCH_r*_local.json) against:

1. BASELINE.md — the reference engine's historical round-1 table
   (39 scenarios). Gate: each overlapping scenario must be < 2x the
   reference number (the driver's original rule).
2. The NEWEST forward baseline per scenario — BASELINE_r12.md where the
   scenario is listed there, else BASELINE_r11.md (each file is the
   full-suite medians of its round, with known load artifacts replaced
   by their isolated re-measurements). Gate: < 1.5x the baseline
   median + 0.5 s absolute slack (sub-2 s scenarios whipsaw under
   load; the slack keeps noise-band flips out of the report, per the
   r10/r11 adjudications).

Self-adjudication (r12 verdict #2): Bench re-runs in-sweep breaches
isolated at the end of the sweep and records them in the artifact's
"isolated" map. A breach whose isolated number sits INSIDE the gate is
a load artifact, reported as cleared and NOT counted against the exit
code — the 6-flags-vs-2-flags contradiction of r12 resolved in the
artifact itself instead of in SCALING.md prose.

Exit code 0 = all green (cleared load artifacts included); 1 = any
breach whose isolated number also breaches (or that has no isolated
re-measurement).
"""
import json
import re
import sys


def parse_md_table(path, required=False):
    """name -> seconds from a `| name | 1.23 |` markdown table.

    Required tables fail LOUDLY when absent — a wrong-cwd invocation
    must not pass vacuously with '0 scenarios checked'. Optional tables
    (waivers, not-yet-committed baselines) return {}.
    """
    out = {}
    try:
        f = open(path)
    except FileNotFoundError:
        if required:
            sys.exit(f"required baseline table {path} not found "
                     "(run from the repo root)")
        return out
    with f:
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
    # end-of-sweep isolated re-measurements of in-sweep breaches
    # (written by Bench's self-adjudication pass)
    isolated = bench.get("isolated", {})

    ref = parse_md_table("BASELINE.md", required=True)
    # newest forward baseline wins per scenario
    fwd = parse_md_table("BASELINE_r11.md", required=True)
    fwd.update(parse_md_table("BASELINE_r12.md"))
    # adjudicated intentional regressions: the waiver bound replaces the
    # forward gate for listed scenarios (each row cites its adjudication
    # in BASELINE_WAIVERS.md; absorbed at the next baseline rebase)
    waivers = parse_md_table("BASELINE_WAIVERS.md")

    breaches = []
    cleared = []

    def check(name, ours, gate, label):
        """Record a breach, unless the isolated re-run clears it."""
        if ours < gate:
            return
        iso = isolated.get(name)
        if iso is not None and 0 <= iso < gate:
            cleared.append(
                f"{label} {name}: in-sweep {ours:.2f}s, isolated "
                f"{iso:.2f}s < gate {gate:.2f}s — load artifact")
        else:
            extra = "" if iso is None else f" (isolated {iso:.2f}s also breaches)"
            breaches.append(
                f"{label} {name}: {ours:.2f}s >= gate {gate:.2f}s{extra}")

    # Bench records a crashed scenario family as -1.0 (guarded()'s
    # sentinel); a negative "time" beats every baseline, so without this
    # check an OOMed scenario reads as a pass
    failed = sorted(n for n, v in queries.items() if v < 0)
    for name in failed:
        breaches.append(f"scenario FAILED in bench (recorded {queries[name]}): {name}")

    n_ref = 0
    for name, base in sorted(ref.items()):
        if name not in queries or name in sliced or queries[name] < 0:
            continue
        n_ref += 1
        # a waiver bound supersedes BOTH gates — an adjudicated
        # intentional regression must not stay red via the historical
        # table after the forward gate was waived
        gate = waivers[name] if name in waivers else 2.0 * base
        label = "vs WAIVER bound " if name in waivers else "vs BASELINE.md  "
        check(name, queries[name], gate, label)
    print(f"BASELINE.md    : {n_ref} overlapping scenarios checked (2x gate)")

    n_fwd = 0
    n_waived = 0
    for name, base in sorted(fwd.items()):
        if name not in queries or name in sliced or queries[name] < 0:
            continue
        n_fwd += 1
        if name in waivers:
            n_waived += 1
            check(name, queries[name], waivers[name], "vs WAIVER bound ")
        else:
            check(name, queries[name], 1.5 * base + 0.5, "vs fwd baseline ")
    print(f"forward baseline: {n_fwd} scenarios checked (1.5x + 0.5s gate, "
          f"newest of r12/r11 per scenario; {n_waived} on waiver bounds)")

    new = sorted(set(queries) - set(fwd) - sliced)
    if new:
        print(f"new since r12 (no forward baseline yet): {', '.join(new)}")

    if cleared:
        print(f"\n{len(cleared)} in-sweep breach(es) cleared by isolated re-run:")
        for c in cleared:
            print("  " + c)

    if breaches:
        print(f"\n{len(breaches)} breach(es) to investigate:")
        for b in breaches:
            print("  " + b)
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
