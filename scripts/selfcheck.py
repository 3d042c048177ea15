#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/selfcheck.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already written
<outDir>/<query>.parquet and <outDir>/oracle_sql.json. For each query:
registers every fixture table as a DuckDB view, runs the oracle SQL, and
compares against the Spark result with columns sorted by name and rows
sorted by all columns — strict equality, so anything that passes here
should hash-match under the driver too.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify for a total order (NaN/None/mixed types sort-safe)
    key = df.astype(str)
    idx = key.sort_values(by=list(df.columns)).index
    return df.loc[idx].reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # partial fixture dirs (stress corpora carry only documents +
        # embeddings) register what they have; a query touching a missing
        # table then fails loudly at exec time instead of here
        import os
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            want = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exec error: {e}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        mismatched = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = pd.Series([False] * len(a))
            if not eq.all():
                mismatched.append((c, int((~eq).sum())))
        if mismatched:
            failures.append(name)
            print(f"FAIL {name}: value mismatches {mismatched}")
            for c, _ in mismatched[:2]:
                bad = (g[c].astype(str) != w[c].astype(str))
                print("  spark:", g.loc[bad, c].head(3).tolist())
                print("  duck :", w.loc[bad, c].head(3).tolist())
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
