"""Serving-store sinks (SURVEY §2.B3-B6): JDBC append/overwrite, Spark
warehouse tables, predicate delete, CSV snapshot.

The reference serves from Postgres via SQLAlchemy
(`scripts/load_stock_metrics.py:89`, `scripts/load_sp500.py:51`). The
engine's self-contained serving store is a Spark SQL table; the JDBC
wrappers carry the same semantics to an external RDBMS when one exists
(not exercisable in this container — no database — but the call shape
is the production one: partition-parallel writes, bounded batch sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict | None = None
) -> None:
    """B3: append rows to an RDBMS table (reference
    `scripts/load_stock_metrics.py:89`). Each Spark partition opens one
    connection and writes batched inserts — cap parallelism with
    ``df.coalesce(n)`` so a 1000-task job doesn't open 1000 connections.
    """
    df.write.mode("append").jdbc(url, table, properties=properties or {})


def jdbc_overwrite(
    df: DataFrame, url: str, table: str, properties: dict | None = None
) -> None:
    """B4: replace an RDBMS table wholesale (reference
    `scripts/load_sp500.py:51` — the ~503-row dimension)."""
    df.write.mode("overwrite").jdbc(url, table, properties=properties or {})


def save_serving_table(
    df: DataFrame, name: str, path: str | None = None, mode: str = "append"
) -> None:
    """B3/B4 in-engine: persist to a Spark SQL table (the self-contained
    serving store). ``path`` makes it external — the lake stays the
    source of truth and the table is just a pointer."""
    writer = df.write.mode(mode)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def delete_where(
    spark: SparkSession, name: str, predicate: str
) -> None:
    """B5: predicate DELETE (reference ``DELETE FROM stock_metrics WHERE
    date = :today``, `scripts/load_stock_metrics.py:57-61`).

    DataFrames have no DELETE; the engine form is filter-and-overwrite
    (recompute semantics). A table format (Delta/Iceberg) would do this
    as a metadata-only operation; on plain parquet it is a rewrite of
    the table, so keep serving tables partitioned so the rewrite prunes.
    """
    kept = spark.table(name).filter(f"NOT ({predicate})")
    # sever lineage from the table being overwritten (same pattern as
    # pipeline.run_increment)
    kept = kept.localCheckpoint(eager=True)
    kept.write.mode("overwrite").insertInto(name, overwrite=True)


def csv_snapshot(df: DataFrame, path: str) -> None:
    """B6: CSV snapshot of a small dimension (reference, dormant:
    `scripts/ingest_backfill_sp500.py:35-39`). coalesce(1) mirrors the
    reference's single-file expectation — only sane for dims."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
