"""Ad-hoc per-query oracle verification (the /verify recipe's core).

Usage: python -m tools.verify_queries [--sf DIR] name [name ...]
       python -m tools.verify_queries --sf /root/testdata/sf0.01 --all
       python -m tools.verify_queries --new   # the never-driver-proven set

Runs each named catalog query against its DuckDB oracle via
tests.oracle.compare and prints PASS/FAIL per name. Rows-only queries
(no oracle) report row count only.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--new",
        action="store_true",
        dest="new_only",
        help="verify exactly the oracle-bearing queries with NO "
        "driver-green ledger entry yet (the judge's per-round "
        "first-proof check, VERDICT r12 task 8)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from stock_market_etl_spark.catalog import all_oracles, all_queries
    from tests.oracle import compare, duckdb_connect

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("verify_queries")
        .getOrCreate()
    )
    queries, oracles = all_queries(), all_oracles()
    if args.new_only:
        from tools.proof_ledger import load_ledger

        ledger = load_ledger()
        names = [
            n for n in queries if n in oracles and n not in ledger
        ]
        print(f"never-driver-proven oracle-bearing set: {names}")
    elif args.all:
        names = list(queries)
    else:
        names = args.names
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    fails = 0
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf)
            if name in oracles:
                con = duckdb_connect(args.sf)
                problems = compare(df, con, oracles[name])
                con.close()
                if problems:
                    fails += 1
                    print(f"FAIL {name} ({time.time() - t0:.1f}s): {problems}")
                else:
                    print(f"PASS {name} ({time.time() - t0:.1f}s)")
            else:
                n = df.count()
                print(f"ROWS {name}: {n} rows ({time.time() - t0:.1f}s)")
        except Exception as exc:  # keep going; report every failure
            fails += 1
            print(f"ERR  {name} ({time.time() - t0:.1f}s): {exc}")
        finally:
            spark.catalog.clearCache()
    print(f"done: {len(names)} queries, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
