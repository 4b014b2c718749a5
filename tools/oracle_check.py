#!/usr/bin/env python3
"""Local mimic of the harness driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [jsonOut]

Runs every SQL in <verifyOutDir>/oracle_sql.json against DuckDB views of
the sfDir parquet tables and value-compares (columns sorted by name,
rows sorted) against the Spark parquet dumps. Dev tool only — the real
gate is driver-side. With jsonOut, additionally writes a per-query
artifact in the driver's CORRECTNESS shape (rows/schema/hash match) —
used for the committed off-scale passes (e.g. the sf0.1 sweep).
"""
import os, sys, json, glob
import duckdb
import pandas as pd

TABLES = ["orders", "lineitem", "customer", "supplier", "nation",
          "region", "part", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, json_out: str | None = None) -> int:
    # DUCKDB_THREADS caps the oracle's parallelism so a long compare can
    # run beside a timed Spark drive without stealing its cores; unset or
    # malformed (e.g. an empty string exported by a wrapper) = duckdb's
    # default (all cores) — a bad value must not fail the sweep before
    # any query runs.
    threads = os.environ.get("DUCKDB_THREADS")
    try:
        threads = int(threads) if threads else None
    except ValueError:
        print(f"DUCKDB_THREADS={threads!r} is not an int; "
              "using duckdb's default thread count", file=sys.stderr)
        threads = None
    con = duckdb.connect(
        config={"threads": threads} if threads else {})
    for t in TABLES:
        # driver testdata ships one file per table; Spark-written
        # tables (e.g. the MakeSf 10x replica set) are DIRECTORIES of
        # part files — glob those for DuckDB
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name:24s} MISSING spark output")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": -1,
                            "oracle_rows": -1, "err": "missing spark output"}
            continue
        s = pd.read_parquet(files[0])
        try:
            o = con.sql(sql).df()
        except Exception as e:  # oracle-side failure is its own signal
            print(f"{name:24s} ORACLE SQL FAILED: {e}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(s),
                            "oracle_rows": -1, "err": f"oracle: {e}"}
            continue
        s = s[sorted(s.columns)].sort_values(sorted(s.columns)).reset_index(drop=True)
        o = o[sorted(o.columns)].sort_values(sorted(o.columns)).reset_index(drop=True)
        schema_ok = list(s.columns) == list(o.columns)
        rows_ok = len(s) == len(o)
        ok = schema_ok and rows_ok
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
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": ok, "spark_rows": len(s),
                        "oracle_rows": len(o), "err": None}
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=0, sort_keys=True)
            f.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
