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


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: tuple[str, ...],
    properties: dict | None = None,
    max_delete_keys: int = 10_000,
) -> None:
    """B3+B5 composed: key-grain delete-then-append — the reference's
    serving load verbatim (`scripts/load_stock_metrics.py:57-61` DELETE
    today + `:89` insert increment), generalized from `date = :today`
    to any key tuple. Re-running the same increment first deletes its
    own earlier rows, so the composition is idempotent at key grain —
    the JDBC mirror of the L2 lake merge.

    The DELETE runs driver-side over ONE JDBC connection with a
    prepared statement per distinct key tuple — a bounded CONTROL
    operation, not a data path: increment key sets are small by
    construction (one date × ≤503 tickers in the reference).
    ``max_delete_keys`` enforces that assumption loudly; past it, use
    a staging table + SQL MERGE instead of row-at-a-time deletes. The
    append itself writes partition-parallel as `jdbc_append`.
    """
    key_rows = df.select(*keys).distinct().collect()
    if len(key_rows) > max_delete_keys:
        raise ValueError(
            f"{len(key_rows)} distinct key tuples exceeds "
            f"max_delete_keys={max_delete_keys}; stage + MERGE instead"
        )
    spark = df.sparkSession
    jvm = spark._jvm
    driver = (properties or {}).get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        # Spark's JDBC writer creates ANSI-quoted (case-sensitive)
        # column names; the delete must quote identically or Derby/
        # Postgres fold the bare name to the wrong case
        where = " AND ".join(f'"{k}" = ?' for k in keys)
        stmt = conn.prepareStatement(
            f"DELETE FROM {table} WHERE {where}"
        )
        try:
            for row in key_rows:
                for i, k in enumerate(keys):
                    stmt.setObject(i + 1, row[k])
                stmt.addBatch()
            stmt.executeBatch()
            conn.commit()
        finally:
            stmt.close()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
    jdbc_append(df, url, table, properties)
