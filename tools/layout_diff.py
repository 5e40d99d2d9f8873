#!/usr/bin/env python3
"""Dual-layout determinism gate (SURVEY §4, round-13).

Usage: python3 tools/layout_diff.py <verifyDirA> <verifyDirB>

Compares two graft.Verify output directories produced under DIFFERENT
partition layouts (e.g. SPARK_GRAFT_CPUS=8 direct read vs
SPARK_GRAFT_CPUS=3 with SPARK_GRAFT_LAYOUT_JITTER): any oracled query
whose canonicalized result (columns sorted by name, rows sorted,
NaN==NaN) differs between the two Spark runs is an order-dependence
defect — exactly the class that flipped embed_covariance and
pipeline_length_buckets on the driver's host in round 12 while the
single-layout local gate stayed green.

Semantics mirror the driver's compare: queries WITH an oracle entry are
value-compared cell by cell; declared rows-only queries (no oracle SQL —
RNG/sketch/library/timing surfaces) are row-count-compared only.

Exit 0 = every query layout-invariant; exit 1 otherwise.
"""
import sys, json, glob, math, os
import duckdb

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def read(con, d, name):
    files = sorted(glob.glob(f"{d}/{name}/*.parquet"))
    if not files:
        return None
    return con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()

def main(dira, dirb):
    con = duckdb.connect()
    oracle = json.load(open(f"{dira}/oracle_sql.json"))
    names_a = {os.path.basename(d.rstrip("/"))
               for d in glob.glob(f"{dira}/*/")}
    names_b = {os.path.basename(d.rstrip("/"))
               for d in glob.glob(f"{dirb}/*/")}
    failures = []
    if names_a != names_b:
        failures.append(f"query sets differ: only-A={sorted(names_a - names_b)} "
                        f"only-B={sorted(names_b - names_a)}")
    n_val, n_cnt = 0, 0
    for name in sorted(names_a & names_b):
        a, b = read(con, dira, name), read(con, dirb, name)
        if a is None or b is None:
            failures.append(f"{name}: missing parquet in one layout")
            continue
        if name not in oracle:
            if len(a) != len(b):
                failures.append(f"{name}: rows-only count {len(a)} vs {len(b)}")
            else:
                n_cnt += 1
            continue
        if len(a) != len(b) or list(a.columns) != list(b.columns):
            failures.append(f"{name}: shape {len(a)}x{list(a.columns)} vs "
                            f"{len(b)}x{list(b.columns)}")
            continue
        a, b = norm(a), norm(b)
        bad = []
        for c in a.columns:
            for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
                if not cell_eq(x, y):
                    bad.append(f"{c}[{i}]: {x!r} vs {y!r}")
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            failures.append(f"{name}: LAYOUT-DEPENDENT — " + "; ".join(bad))
        else:
            n_val += 1
    for f in failures:
        print(f"LAYOUT-DIFF FAIL {f}")
    print(f"== layout sweep: {n_val} value-identical, {n_cnt} rows-only "
          f"count-identical, {len(failures)} failures ==")
    return 1 if failures else 0

if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2]))
