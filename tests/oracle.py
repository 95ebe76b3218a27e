"""Local DuckDB-oracle harness mirroring the driver's correctness gate.

Compares, for each named query: row count, column names/ordering-insensitive
schema, and an order-insensitive value comparison (sorted rows). Stricter
than a hash: on mismatch it prints the first differing rows for debugging.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from stock_market_etl_spark.io import TABLE_NAMES

REL_TOL = 0.0  # exact match after both sides round


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    try:  # date, Decimal, etc.
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    oracle = con.sql(sql)
    ocols = [c.lower() for c in oracle.columns]
    scols = [c.lower() for c in spark_df.columns]
    if sorted(ocols) != sorted(scols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems

    srows = [
        tuple(_canon_value(v) for v in row)
        for row in spark_df.collect()
    ]
    # reorder spark columns to oracle order for value comparison
    idx = [scols.index(c) for c in ocols]
    srows = [tuple(r[i] for i in idx) for r in srows]
    orows = [tuple(_canon_value(v) for v in row) for row in oracle.fetchall()]

    if len(srows) != len(orows):
        problems.append(f"row count: spark={len(srows)} oracle={len(orows)}")

    srows.sort(key=_sort_key)
    orows.sort(key=_sort_key)
    n_bad = 0
    for s, o in zip(srows, orows):
        if s != o:
            n_bad += 1
            if n_bad <= 5:
                problems.append(f"row mismatch:\n  spark : {s}\n  oracle: {o}")
    if n_bad:
        problems.append(f"total mismatching rows: {n_bad}/{len(srows)}")
    return problems
