#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet from <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB against views over <sfDir>/*.parquet
  - sort columns by name, sort rows, compare values exactly
Reports per-query: rows / schema / exact match, and max float deviation.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        return a == b, abs(a - b)
    return a == b, 0.0 if a == b else float("inf")

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            continue
        rows_ok = len(got) == len(exp)
        schema_ok = list(got.columns) == list(exp.columns)
        if not rows_ok or not schema_ok:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; "
                  f"cols {list(got.columns)} vs {list(exp.columns)}")
            continue
        bad, maxdev = 0, 0.0
        for c in got.columns:
            for a, b in zip(got[c].tolist(), exp[c].tolist()):
                ok, dev = cmp_cell(a, b)
                if not ok:
                    bad += 1
                    maxdev = max(maxdev, dev)
                    if bad <= 3:
                        print(f"  {name}.{c}: got {a!r} exp {b!r}")
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells, maxdev {maxdev:.3g} "
                  f"({len(got)} rows)")
        else:
            n_ok += 1
            print(f"OK   {name}: {len(got)} rows exact")
    print(f"== {n_ok}/{len(oracle)} queries exact ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
