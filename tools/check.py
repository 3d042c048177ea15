#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the parquet tables in <sfDir>, load the Spark parquet result, and
compare rows / schema (sorted column names) / value hash (columns sorted by
name, rows sorted by the stringified tuple).
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, pd.Timestamp) and v == v.normalize():
            return str(v.date())
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.9g}"
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = []
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        try:
            sdf = pd.read_parquet(spark_path)
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: spark result unreadable: {e}"); continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif canon(sdf) != canon(odf):
            problems.append("hash mismatch")
        if problems:
            fails.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} green" + (f"; FAILURES: {fails}" if fails else ""))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
