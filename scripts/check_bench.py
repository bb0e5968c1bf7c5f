#!/usr/bin/env python3
"""Bench regression check against BOTH baselines (r11 verdict #4,
refreshed r13 per r12 verdict #2/#3, driver-artifact support r14 per
r13 verdict #1).

Usage: python3 scripts/check_bench.py <bench_json> [--stat median|min]

Accepts EITHER artifact shape:

* a full bench artifact (target/bench.json or a committed
  BENCH_r*_local.json): top-level "queries"/"queries_median" maps;
* the driver-wrapped per-round artifact (BENCH_r*.json, shape
  {n, rc, cpus, sf, tail, parsed}): "parsed" is the driver's parse of
  Bench's compact final line — the BASELINE.md-overlap subset at the
  min statistic (the full map cannot ride in the ~2 KB stdout tail).
  The wrapped subset is checked directly, and if a sibling
  BENCH_r*_local.json exists next to it, that full artifact is checked
  too so every scenario gets a gate. An artifact that resolves to an
  EMPTY queries map fails loudly — the r13 verdict's vacuous-pass bug.

Gates per scenario (each applied exactly once):

1. BASELINE_WAIVERS.md — an adjudicated intentional regression's max_s
   bound REPLACES both gates below for the listed scenario (absorbed at
   the next BASELINE_r* rebase). One gate, checked once (the r13 advice
   double-count: a waived name in both baseline tables was previously
   gated — and on breach, reported — twice).
2. BASELINE.md — the reference engine's historical round-1 table.
   Gate: < 2x the reference number (the driver's original rule).
3. The NEWEST forward baseline per scenario — BASELINE_r13.md, else
   r12, else r11 (each file is the full-suite medians of its round,
   with known load artifacts replaced by their isolated
   re-measurements). Gate: < 1.5x the baseline median + 0.5 s absolute
   slack (sub-2 s scenarios whipsaw under load; the slack keeps
   noise-band flips out of the report, per the r10/r11 adjudications).

Self-adjudication (r12 verdict #2): Bench re-runs in-sweep breaches
isolated at the end of the sweep and records them in the artifact's
"isolated" map. A breach whose isolated number sits INSIDE the gate is
a load artifact, reported as cleared and NOT counted against the exit
code.

Exit code 0 = all green (cleared load artifacts included); 1 = any
breach whose isolated number also breaches (or that has no isolated
re-measurement), a non-empty "unadjudicated" list (r15: breach flags
Bench's own adjudication pass could not isolate), or an artifact with
no resolvable queries.
"""
import json
import os
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


def resolve_artifact(bench, stat):
    """(queries, sliced, isolated, breached, unadjudicated, note) from
    either artifact shape."""
    if "parsed" in bench and "queries" not in bench:
        # driver-wrapped shape: {n, rc, cpus, sf, tail, parsed}. parsed
        # is Bench's compact summary line (baseline-overlap subset, min
        # stat). Prefer a full-map JSON line recoverable from the tail,
        # should the tail window ever grow enough to hold one.
        best = bench.get("parsed") or {}
        for line in (bench.get("tail") or "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if len(cand.get("queries", {})) > len(best.get("queries", {})):
                best = cand
        queries = best.get("queries_median" if stat == "median" else "queries",
                           best.get("queries", {})) or {}
        # the compact line's documented stat is min; don't echo the whole
        # stat_note sentence as if it were the stat name (r14 advice)
        m = re.search(r"\b(median|min)\b", best.get("stat_note", "") or "")
        note = ("driver-wrapped artifact: baseline-overlap subset, "
                f"stat={(m.group(1) if m else 'min')!r}")
        return (queries, set(best.get("sliced_gates", [])),
                best.get("isolated", {}), best.get("breached", []),
                best.get("unadjudicated", []), note)
    queries = bench.get("queries_median" if stat == "median" else "queries",
                        bench.get("queries", {})) or {}
    return (queries, set(bench.get("sliced_gates", [])),
            bench.get("isolated", {}), bench.get("breached", []),
            bench.get("unadjudicated", []), None)


def check_one(bench_path, stat, ref, fwd, waivers):
    """Gate one artifact; returns the number of breaches."""
    with open(bench_path) as f:
        bench = json.load(f)
    (queries, sliced, isolated, flagged, unadjudicated,
     note) = resolve_artifact(bench, stat)
    print(f"== {bench_path} ==")
    if note:
        print(note)
    if not queries:
        print("FATAL: artifact resolves to an EMPTY queries map — "
              "nothing was checked (vacuous pass forbidden)")
        return 1

    breaches = []
    cleared = []

    # r15 verdict #1: Bench records how many baseline gate rows its
    # self-adjudication pass resolved; zero means the in-run gating was
    # vacuous (wrong cwd / missing tables) and the artifact cannot be
    # trusted to have self-cleared anything
    rows_gated = bench.get("baseline_rows_gated",
                           (bench.get("parsed") or {}).get(
                               "baseline_rows_gated", -1))
    if rows_gated == 0:
        breaches.append("bench self-adjudication gated against ZERO "
                        "baseline rows (wrong cwd or missing tables) — "
                        "in-run breach/isolated lists are vacuous")

    # Bench names breach flags its adjudication pass could not isolate
    # (r14 verdict #2) — a non-empty list is a failure, not a footnote
    for name in unadjudicated:
        breaches.append(f"breach flag NEVER isolated (bench budget/"
                        f"failure): {name}")
    # a breached name with no isolated entry and no gate coverage in the
    # resolved queries map would otherwise vanish entirely (r14 verdict
    # #6: the wrapped artifact's subset map can omit the flagged name)
    for name in flagged:
        if (name not in isolated and name not in queries
                and name not in unadjudicated):
            print(f"WARNING: breached scenario {name!r} has no isolated "
                  "re-run and is outside this artifact's queries map — "
                  "adjudicate it against the sibling full artifact")

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
    for name in sorted(n for n, v in queries.items() if v < 0):
        breaches.append(f"scenario FAILED in bench (recorded {queries[name]}): {name}")

    # each scenario meets each of its gates exactly ONCE: a waiver bound
    # supersedes BOTH the historical and forward gates (checked once);
    # otherwise the 2x historical gate and the 1.5x+0.5s forward gate
    # both apply where their tables list the scenario
    n_ref = n_fwd = n_waived = 0
    for name in sorted(queries):
        if name in sliced or queries[name] < 0:
            continue
        if name in waivers:
            # the waiver bound binds even when NO baseline table lists
            # the scenario — skipping it would leave the name neither
            # gated nor reported as new (r14 advice)
            n_waived += 1
            if name not in ref and name not in fwd:
                print(f"note: waived scenario {name!r} has no baseline "
                      "entry — gated on its waiver bound alone")
            check(name, queries[name], waivers[name], "vs WAIVER bound ")
            continue
        if name in ref:
            n_ref += 1
            check(name, queries[name], 2.0 * ref[name], "vs BASELINE.md  ")
        if name in fwd:
            n_fwd += 1
            check(name, queries[name], 1.5 * fwd[name] + 0.5, "vs fwd baseline ")
    print(f"BASELINE.md     : {n_ref} overlapping scenarios checked (2x gate)")
    print(f"forward baseline: {n_fwd} scenarios checked (1.5x + 0.5s gate, "
          f"newest BASELINE_r* per scenario); {n_waived} on waiver bounds")

    new = sorted(set(queries) - set(fwd) - set(waivers) - sliced)
    if new:
        print(f"new (no forward baseline yet): {', '.join(new)}")

    if cleared:
        print(f"{len(cleared)} in-sweep breach(es) cleared by isolated re-run:")
        for c in cleared:
            print("  " + c)

    if breaches:
        print(f"{len(breaches)} breach(es) to investigate:")
        for b in breaches:
            print("  " + b)
    else:
        print("all green")
    return len(breaches)


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    stat = "median"
    if "--stat" in sys.argv:
        i = sys.argv.index("--stat")
        if i + 1 >= len(sys.argv) or sys.argv[i + 1] not in ("median", "min"):
            sys.exit("usage: check_bench.py <bench_json> [--stat median|min]")
        stat = sys.argv[i + 1]

    ref = parse_md_table("BASELINE.md", required=True)
    # newest forward baseline wins per scenario: glob every committed
    # BASELINE_r*.md in round order so a new rebase binds without a
    # code change here
    import glob
    fwd_files = sorted(glob.glob("BASELINE_r[0-9]*.md"),
                       key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not fwd_files:
        sys.exit("no BASELINE_r*.md forward baseline found "
                 "(run from the repo root)")
    fwd = {}
    for path in fwd_files:
        fwd.update(parse_md_table(path))
    waivers = parse_md_table("BASELINE_WAIVERS.md")

    n_breaches = check_one(bench_path, stat, ref, fwd, waivers)

    # a driver-wrapped BENCH_rN.json carries only the compact subset;
    # the committed sibling BENCH_rN_local.json is the same HEAD's full
    # 300+-scenario artifact — check it too so every scenario is gated
    m = re.match(r"(.*BENCH_r\d+)\.json$", bench_path)
    if m:
        sibling = m.group(1) + "_local.json"
        if os.path.exists(sibling):
            print()
            n_breaches += check_one(sibling, stat, ref, fwd, waivers)
        else:
            print(f"\n(no sibling {sibling} — full-map coverage unchecked)")

    sys.exit(1 if n_breaches else 0)


if __name__ == "__main__":
    main()
