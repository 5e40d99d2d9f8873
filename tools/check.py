#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [artifactPath]

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet from <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB against views over <sfDir>/*.parquet
  - sort columns by name, sort rows, compare values exactly
Reports per-query: rows / schema / exact match, and max float deviation.

Also persists the per-query results as CORRECTNESS_local.json (same
schema as the driver's CORRECTNESS_r{N}.json), covering BOTH oracled
queries and the declared rows-only set (any query directory in
<verifyOutDir> without an oracle entry -> err "no_oracle"), so the
round's hard correctness signal exists even if the driver artifact
arrives empty (the round-9 failure mode). Default artifact path is the
repo root next to tools/; pass a third arg to override.
"""
import sys, json, glob, math, os, time
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

def entry(rows_match=None, schema_match=None, hash_match=None,
          spark_rows=None, oracle_rows=None, err=None):
    return {"rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

def spark_row_count(con, files):
    try:
        return con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
    except Exception:
        return None

def read_stamp(path):
    try:
        with open(path) as f:
            return f.read().strip()
    except OSError:
        return None

def main(sfdir, outdir, artifact=None):
    if artifact is None:
        artifact = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "CORRECTNESS_local.json")
    # Freshness handshake (round-14 gate): graft.Verify stamps one run
    # id into <outdir>/run_stamp.json and into every query dir it
    # (re)writes. A query dir whose stamp is absent or different was
    # NOT produced by this Verify run — compare it anyway, but mark it
    # stale so a stale-artifact compare can never read as a clean
    # verdict (the r12/r13 pipeline_length_buckets ambiguity).
    run_meta = {}
    try:
        run_meta = json.load(open(f"{outdir}/run_stamp.json"))
    except Exception:
        pass
    run_id = run_meta.get("run_id")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    # declared rows-only queries: output dir present, no oracle entry
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        results[name] = entry(spark_rows=spark_row_count(con, files) if files else None,
                              err="no_oracle")
    n_ok = 0
    for name in sorted(oracle):
        t0 = time.time()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = entry(err="no_spark_output")
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            results[name] = entry(err=str(e)[:200])
            continue
        rows_ok = len(got) == len(exp)
        schema_ok = list(got.columns) == list(exp.columns)
        if not rows_ok or not schema_ok:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; "
                  f"cols {list(got.columns)} vs {list(exp.columns)}")
            results[name] = entry(rows_match=rows_ok, schema_match=schema_ok,
                                  hash_match=False, spark_rows=len(got),
                                  oracle_rows=len(exp), err="shape_mismatch")
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
        results[name] = entry(rows_match=True, schema_match=True,
                              hash_match=bad == 0, spark_rows=len(got),
                              oracle_rows=len(exp),
                              err=None if bad == 0 else "value_mismatch")
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells, maxdev {maxdev:.3g} "
                  f"({len(got)} rows)")
        else:
            n_ok += 1
            # per-oracle wall time: the expensive DuckDB oracles are the
            # prime suspect for the driver's empty-correctness timeouts
            print(f"OK   {name}: {len(got)} rows exact ({time.time()-t0:.1f}s)")
    stale = []
    if run_id is not None:
        for name in results:
            if not os.path.isdir(f"{outdir}/{name}"):
                continue  # already reported as no_spark_output
            ok = read_stamp(f"{outdir}/{name}/_RUN_STAMP") == run_id
            results[name]["run_stamp_ok"] = ok
            if not ok:
                stale.append(name)
        if stale:
            shown = ", ".join(stale[:8]) + (" …" if len(stale) > 8 else "")
            print(f"STALE dirs not stamped by run {run_id}: {shown}")
    with open(artifact, "w") as f:
        json.dump(dict(sorted(results.items())), f, indent=2)
    meta = {"run_id": run_id, "run_meta": run_meta, "stale": sorted(stale),
            "checked_at_ms": int(time.time() * 1000), "n_entries": len(results)}
    with open(os.path.splitext(artifact)[0] + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"== {n_ok}/{len(oracle)} queries exact ==")
    if run_id is None:
        print("== WARNING: no run_stamp.json in verify output — freshness unchecked ==")
    elif stale:
        print(f"== STALE: {len(stale)} query dirs not from run {run_id} ==")
    else:
        n_dirs = sum(1 for n in results if os.path.isdir(f"{outdir}/{n}"))
        print(f"== freshness OK: all {n_dirs} present dirs stamped by run {run_id} ==")
    print(f"== artifact: {os.path.normpath(artifact)} "
          f"({len(results)} entries) ==")

if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(*sys.argv[1:4])
