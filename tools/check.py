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
import datetime, decimal, hashlib, struct
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

# ---- canonical compare-side hash (round-14 verdict demand #2) -------------
# EXACT mirror of graft.Canonical (Scala): same cell rendering, same
# sorted-column / UTF-8-sorted-row canonical string, same sha256 — but
# computed through a completely different reader stack (DuckDB+Python).
# graft.Verify writes its hash to <query>/_CANONICAL.sha256; equality
# here proves both stacks read the same values from the same bytes.

_EPOCH = datetime.datetime(1970, 1, 1)

def canon_cell(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return "d" + struct.pack(">d", v).hex()
    if isinstance(v, str):
        return f"s{len(v)}:{v}"
    if isinstance(v, decimal.Decimal):
        return "m" + format(v.normalize(), "f")
    if isinstance(v, datetime.datetime):
        # UTC-adjusted parquet timestamps surface tz-aware in DuckDB;
        # Spark's java.sql.Timestamp is the same instant — epoch micros
        # agree either way
        epoch = (datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                 if v.tzinfo is not None else _EPOCH)
        return "t" + str((v - epoch) // datetime.timedelta(microseconds=1))
    if isinstance(v, datetime.date):
        return "D" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "b" + bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(e) for e in v) + "]"
    if isinstance(v, dict):  # struct: field order as returned
        return "{" + ",".join(canon_cell(e) for e in v.values()) + "}"
    return "u" + str(v)

def canon_hash(cols, rows):
    """cols: names in the SELECT order (must already be sorted);
    rows: sequence of tuples in that column order."""
    rendered = sorted(
        ("\x1f".join(canon_cell(c) for c in r) for r in rows),
        key=lambda s: s.encode("utf-8"))
    body = "\x1f".join(cols) + "\x1e" + "\x1e".join(rendered)
    return hashlib.sha256(body.encode("utf-8")).hexdigest()

def canon_hash_parquet(con, files):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
    sel = ", ".join('"' + c + '"' for c in sorted(cols))
    rows = con.execute(
        f"SELECT {sel} FROM read_parquet({files!r})").fetchall()
    return canon_hash(sorted(cols), rows)

def canon_hash_sql(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return canon_hash([cols[i] for i in order],
                      [tuple(r[i] for i in order) for r in rows])

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
    canon_bad = []
    def canon_check(name, files):
        """Recompute the canonical hash from the on-disk parquet via
        DuckDB+Python and verify it equals the one graft.Verify wrote
        from the same bytes via Spark — records canon_spark and
        canon_stamp_ok on the result row."""
        try:
            h = canon_hash_parquet(con, files)
        except Exception as e:
            results[name]["canon_spark"] = None
            results[name]["canon_stamp_ok"] = False
            canon_bad.append((name, f"canon error: {str(e)[:120]}"))
            return
        results[name]["canon_spark"] = h
        stamped = read_stamp(f"{outdir}/{name}/_CANONICAL.sha256")
        ok = stamped == h
        results[name]["canon_stamp_ok"] = ok
        if not ok:
            canon_bad.append((name, f"verify-side {stamped} != checker-side {h}"))
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        results[name] = entry(spark_rows=spark_row_count(con, files) if files else None,
                              err="no_oracle")
        if files:
            canon_check(name, files)
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
        canon_check(name, files)
        try:
            results[name]["canon_oracle"] = canon_hash_sql(con, oracle[name])
        except Exception:
            results[name]["canon_oracle"] = None
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
    if canon_bad:
        for name, why in canon_bad[:8]:
            print(f"CANON MISMATCH {name}: {why}")
    with open(artifact, "w") as f:
        json.dump(dict(sorted(results.items())), f, indent=2)
    meta = {"run_id": run_id, "run_meta": run_meta, "stale": sorted(stale),
            "canon_mismatch": sorted(n for n, _ in canon_bad),
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
    n_canon = sum(1 for v in results.values() if v.get("canon_stamp_ok"))
    if canon_bad:
        print(f"== CANON: {len(canon_bad)} hash disagreements between the "
              f"Spark and DuckDB readings of the same parquet ==")
    else:
        print(f"== canon OK: {n_canon} query dirs cross-stack hash-verified ==")
    print(f"== artifact: {os.path.normpath(artifact)} "
          f"({len(results)} entries) ==")

if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(*sys.argv[1:4])
