#!/usr/bin/env python3
"""Local mimic of the harness driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Runs every SQL in <verifyOutDir>/oracle_sql.json against DuckDB views of
the sfDir parquet tables and value-compares (columns sorted by name,
rows sorted) against the Spark parquet dumps. Dev tool only — the real
gate is driver-side.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["orders", "lineitem", "customer", "supplier", "nation",
          "region", "part", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name:24s} MISSING spark output")
            failures += 1
            continue
        s = pd.read_parquet(files[0])
        o = con.sql(sql).df()
        s = s[sorted(s.columns)].sort_values(sorted(s.columns)).reset_index(drop=True)
        o = o[sorted(o.columns)].sort_values(sorted(o.columns)).reset_index(drop=True)
        ok = list(s.columns) == list(o.columns) and len(s) == len(o)
        if ok and len(s):
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False)
            except AssertionError as e:
                ok = False
                print(f"  diff for {name}: {str(e).splitlines()[-1]}")
        print(f"{name:24s} rows {len(s):>8}/{len(o):>8} "
              f"dtypes {list(map(str, s.dtypes))} vs {list(map(str, o.dtypes))} "
              f"{'OK' if ok else 'MISMATCH'}")
        failures += 0 if ok else 1
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
