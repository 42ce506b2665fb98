#!/usr/bin/env python3
"""Dev-only driver mimic: run each SparkEntry oracle SQL in DuckDB over the
sf tables and compare with the Verify parquet dumps (exact values, columns
sorted by name, rows sorted). Not part of the Scala library.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [sorted(cols)] + out

fails = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
    if not os.path.isdir(qdir):
        continue
    name = os.path.basename(qdir)
    rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    spark_cols = [c.lower() for c in rel.columns]
    spark_rows = rel.fetchall()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(spark_rows)} rows "
              f"{'OK' if len(spark_rows) > 0 else 'EMPTY!'}")
        continue
    try:
        orel = con.sql(oracle[name])
        o_cols = [c.lower() for c in orel.columns]
        o_rows = orel.fetchall()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {str(e)[:200]}")
        fails += 1
        continue
    a, b = canon(spark_rows, spark_cols), canon(o_rows, o_cols)
    if a[0] != b[0]:
        print(f"{name:24s} COLUMN MISMATCH spark={a[0]} oracle={b[0]}")
        fails += 1
    elif len(a) != len(b):
        print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)-1} oracle={len(b)-1}")
        fails += 1
    elif a != b:
        diffs = [(x, y) for x, y in zip(a[1:], b[1:]) if x != y]
        print(f"{name:24s} VALUE MISMATCH {len(diffs)} rows; first: "
              f"spark={diffs[0][0]} oracle={diffs[0][1]}")
        fails += 1
    else:
        print(f"{name:24s} MATCH ({len(a)-1} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
