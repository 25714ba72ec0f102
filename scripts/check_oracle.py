#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Compares each <out>/<q>.parquet (Spark result) against the oracle SQL in
<out>/oracle_sql.json run by DuckDB over <sfDir>/*.parquet tables.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for q in sorted(os.listdir(out)):
    d = os.path.join(out, q)
    if not os.path.isdir(d):
        continue
    spark_df = pd.read_parquet(d)
    if q not in oracle:
        print(f"{q:24s} NO-ORACLE rows={len(spark_df)}")
        continue
    try:
        duck_df = con.execute(oracle[q]).fetchdf()
    except Exception as e:
        print(f"{q:24s} ORACLE-SQL-ERROR {e}")
        fails += 1
        continue
    # driver-style: sort columns by name, then compare values
    a = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    b = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if sorted(a.columns) != sorted(b.columns):
        print(f"{q:24s} SCHEMA-MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"{q:24s} ROWCOUNT spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    # driver-style strict compare: dtypes must be hash-compatible (same
    # family) and value string representations must be identical — decimal
    # vs float64, or int64 vs HUGEINT-as-float64, is what broke round 1.
    try:
        eq = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype != bv.dtype:
                print(f"{q:24s} DTYPE-MISMATCH col={c} "
                      f"spark={av.dtype} duck={bv.dtype}")
                eq = False
                continue
            ok = (av.astype(str) == bv.astype(str)).all()
            if not ok:
                bad = (av.astype(str) != bv.astype(str))
                idx = bad[bad].index[:3].tolist()
                print(f"{q:24s} VALUE-MISMATCH col={c} rows={idx} "
                      f"spark={av.iloc[idx].tolist()} duck={bv.iloc[idx].tolist()}")
                eq = False
        if eq:
            print(f"{q:24s} OK rows={len(a)}")
        else:
            fails += 1
    except Exception as e:
        print(f"{q:24s} COMPARE-ERROR {e}")
        fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
