#!/usr/bin/env python3
"""Self-test for tools/layout_diff.py: the gate must FAIL on a
deliberately order-sensitive result (one flipped round-6 cell — the
exact signature of a layout-dependent rounded sum) and PASS on
identical layouts. Fixtures are built with DuckDB COPY TO parquet.

Usage: python3 tools/test_layout_diff.py
"""
import json, os, shutil, subprocess, sys, tempfile
import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))

def mkdump(root, cov_value):
    con = duckdb.connect()
    os.makedirs(f"{root}/q_sorted", exist_ok=True)
    os.makedirs(f"{root}/q_rowsonly", exist_ok=True)
    # an "oracled" query result with one float cell we can flip
    con.execute(f"""COPY (SELECT i, round(0.1 * i, 6) AS v,
                      CASE WHEN i = 3 THEN {cov_value} ELSE 0.5 END AS cov
                    FROM range(0, 5) t(i))
                   TO '{root}/q_sorted/part-0.parquet' (FORMAT PARQUET)""")
    # a rows-only query (no oracle entry): only the count matters
    con.execute(f"""COPY (SELECT i, random() AS r FROM range(0, 7) t(i))
                   TO '{root}/q_rowsonly/part-0.parquet' (FORMAT PARQUET)""")
    with open(f"{root}/oracle_sql.json", "w") as f:
        json.dump({"q_sorted": "SELECT 1"}, f)

def run(a, b):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "layout_diff.py"), a, b],
        capture_output=True, text=True)

def main():
    tmp = tempfile.mkdtemp(prefix="layoutdiff-test-")
    try:
        a, b, c = f"{tmp}/a", f"{tmp}/b", f"{tmp}/c"
        # identical layouts -> pass (rows-only content MAY differ; only count checked)
        mkdump(a, 0.123457)
        mkdump(b, 0.123457)
        r = run(a, b)
        assert r.returncode == 0, f"identical dumps must pass:\n{r.stdout}{r.stderr}"
        # one 1e-6 rounding flip (the order-dependent-sum signature) -> fail
        mkdump(c, 0.123456)
        r = run(a, c)
        assert r.returncode == 1, f"flipped cell must fail:\n{r.stdout}{r.stderr}"
        assert "LAYOUT-DEPENDENT" in r.stdout, r.stdout
        print("test_layout_diff: OK (pass on identical, fail on 1e-6 flip)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

if __name__ == "__main__":
    main()
