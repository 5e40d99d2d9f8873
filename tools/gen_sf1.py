#!/usr/bin/env python3
"""Generate the sf1 scaling-checkpoint dataset at bench_sf1/:
documents at 10x sf0.1 (copies with shifted ids and a per-copy text
perturbation, so duplicate families become NEAR-dups — the hard case
for the dedup chains), every other table copied from sf0.1.
Driver-side tooling only (duckdb); the Scala library never reads this
script, just the parquet."""
import duckdb, os, shutil

con = duckdb.connect()
src = '/root/testdata/sf0.1'
dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'bench_sf1')
os.makedirs(dst, exist_ok=True)
sel = " UNION ALL ".join(
    f"SELECT doc_id + {i}*100000000 AS doc_id, "
    f"text || ' copyvariant{i}' AS text, lang, source, "
    f"n_chars + 13 AS n_chars "
    f"FROM read_parquet('{src}/documents.parquet')"
    for i in range(10))
con.execute(f"COPY ({sel}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
for t in ['region', 'nation', 'customer', 'supplier', 'part',
          'orders', 'lineitem', 'events', 'embeddings']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
print(con.execute(
    f"SELECT count(*), count(DISTINCT doc_id) FROM read_parquet('{dst}/documents.parquet')"
).fetchall())
