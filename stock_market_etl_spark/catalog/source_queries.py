"""SURVEY §2.A — source operators as named queries.

A1 (parquet scan) underlies every other catalog query; here the custom
ingestion surface: the Python Data Source (A3), the HTML dimension parse
(A4), and the literal source (A5). A4/A5 are deterministic → DuckDB
VALUES oracles; A3's generated bars are engine-side → rows-only plus
property tests (tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from stock_market_etl_spark.sources.dimension import (
    SAMPLE_HTML,
    SP500_SCHEMA,
    literal_dimension,
    parse_constituents,
    sp500_companies,
)
from stock_market_etl_spark.sources.market_source import MarketDataSource

QUERIES = {}
ORACLES = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


@_q("a3_python_datasource")
def a3_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: custom Python Data Source scan — one input partition per
    ticker (the Spark-native form of the reference's yfinance batch
    download + thread-pool fan-out). Generated bars → rows-only;
    determinism and partitioning are property-tested."""
    spark.dataSource.register(MarketDataSource)
    return (
        spark.read.format("market_bars")
        .option("tickers", "AAPL,MSFT,GOOG,BRK-B")
        .option("days", "45")
        .load()
    )


def _values_sql(rows: list[tuple]) -> str:
    vals = ", ".join(
        "(" + ", ".join("'" + v.replace("'", "''") + "'" for v in r) + ")"
        for r in rows
    )
    return (
        "SELECT * FROM (VALUES "
        + vals
        + ") AS t(ticker_symbol, security_name, gics_sector, gics_sub_industry)"
    )


@_q("a4_html_dimension_parse", _values_sql(parse_constituents(SAMPLE_HTML)))
def a4_html_dimension_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: HTML constituents table → parsed + ticker-normalized
    dimension frame (reference `scripts/config.py:7-32`; BRK.B → BRK-B
    per `scripts/config.py:24`)."""
    return sp500_companies(spark)


_A5_ROWS = [
    ("AAPL", "Apple Inc.", "Information Technology", "Hardware"),
    ("MSFT", "Microsoft", "Information Technology", "Software"),
]


@_q("a5_literal_source", _values_sql(_A5_ROWS))
def a5_literal_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: literal rows + declared schema (reference
    `scripts/ingest_backfill_sp500.py:29-32`)."""
    return literal_dimension(spark, _A5_ROWS, SP500_SCHEMA)
