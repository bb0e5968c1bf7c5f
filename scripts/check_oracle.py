#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <out>/<name>/ parquet (the Spark result), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables, and
compares: row count, column names (sorted), and exact values (rows sorted
by all columns, like a hash compare would see them).
"""
import sys, os, json, math, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    import datetime
    df = df[sorted(df.columns)]
    # pyarrow surfaces parquet DATE as object(datetime.date) while duckdb
    # gives datetime64 — same value, reader artifact (the driver's compare
    # accepts it: calendar_dim passes there); normalize to datetime64
    for c in df.columns:
        if df[c].dtype.kind == "O":
            nn = df[c].dropna()
            if len(nn) and all(isinstance(v, datetime.date) and
                               not isinstance(v, datetime.datetime)
                               for v in nn.head(5)):
                df[c] = pd.to_datetime(df[c])
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: queries are designed to be bit-deterministic
    return a == b

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        # read the Spark result via pyarrow, NOT duckdb: duckdb coerces
        # decimal columns to float64 on fetchdf, which made decimal(38,0)
        # vs HUGEINT gates look equal locally while the driver's compare
        # (pyarrow-side Decimal objects) hash-failed them (rounds 8-9)
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            # a result dir with zero part files (write died mid-flight)
            # must fail THAT query, not crash the whole sweep in pd.concat
            print(f"  FAIL {name}: result dir has no parquet part files")
            n_fail += 1
            continue
        mine = pd.concat([pd.read_parquet(p) for p in parts],
                         ignore_index=True)
        if name not in oracle:
            print(f"  ?? {name}: no oracle (rows={len(mine)})")
            n_noracle += 1
            continue
        try:
            theirs = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  !! {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        a, b = norm(mine), norm(theirs)
        if list(a.columns) != list(b.columns):
            print(f"  FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"  FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        # dtype kinds must agree (int vs float hashes differently in the
        # driver's compare even when values are numerically equal)
        kind_bad = [(c, a[c].dtype, b[c].dtype) for c in a.columns
                    if a[c].dtype.kind != b[c].dtype.kind]
        if kind_bad:
            c, ka, kb = kind_bad[0]
            print(f"  FAIL {name}: dtype mismatch col={c}: {ka} vs {kb}")
            n_fail += 1
            continue
        bad = None
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = values_equal(x, y)
                if not ok:
                    # pandas may deliver numpy types; retry numerically —
                    # but ONLY within the same representation family.
                    # Cross-family (Decimal vs str vs float) must FAIL:
                    # the driver hashes representations, and the float
                    # fallback here masked the decimal(38,0)-vs-HUGEINT
                    # gates for two rounds
                    num = (int, float, bool)
                    if isinstance(x, num) and isinstance(y, num):
                        try:
                            ok = float(x) == float(y)
                        except (TypeError, ValueError):
                            ok = False
                    elif isinstance(x, str) and isinstance(y, str):
                        ok = x == y
                    else:
                        ok = str(x) == str(y) and type(x) is type(y)
                if not ok:
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"  FAIL {name}: value mismatch col={col} row={i}: {x!r} vs {y!r}")
            n_fail += 1
        else:
            print(f"  PASS {name} ({len(a)} rows)")
            n_pass += 1
    # queries that ERRORED in Verify write no result dir, so they would
    # silently vanish from this report (round 7 lost 12 gates that way);
    # treat an oracle entry with no result as a failure
    missing = sorted(set(oracle) - set(names))
    for name in missing:
        print(f"  FAIL {name}: no result written (query errored in Verify?)")
    n_fail += len(missing)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
