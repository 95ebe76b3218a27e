"""Property tests for the custom sources (SURVEY §2.A3-A5): the Python
Data Source's partitioning/determinism and its stream-batch parity, and
the HTML dimension parser's normalization rules.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_market_etl_spark.sources import dimension
from stock_market_etl_spark.sources.market_source import MarketDataSource


def _bars(spark, tickers="AAPL,MSFT,GOOG", days=20):
    spark.dataSource.register(MarketDataSource)
    return (
        spark.read.format("market_bars")
        .option("tickers", tickers)
        .option("days", str(days))
        .load()
    )


def test_datasource_shape_and_determinism(spark):
    df = _bars(spark)
    assert df.count() == 3 * 20
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _bars(spark).collect()))
    assert a == b
    # one partition per ticker
    assert df.rdd.getNumPartitions() == 3


def test_datasource_bar_invariants(spark):
    df = _bars(spark)
    bad = df.filter(
        (F.col("low") > F.least("open", "close"))
        | (F.col("high") < F.greatest("open", "close"))
        | (F.col("close") <= 0)
        | (F.col("volume") <= 0)
    )
    assert bad.count() == 0
    # per-ticker dates are unique and contiguous from the epoch
    per = df.groupBy("ticker").agg(
        F.count("*").alias("n"), F.count_distinct("date").alias("nd")
    )
    assert per.filter(F.col("n") != F.col("nd")).count() == 0


def test_datasource_stream_batch_parity(spark, tmp_path):
    """The streaming reader must deliver exactly the batch rows, split
    across one-day micro-batches."""
    spark.dataSource.register(MarketDataSource)
    stream = (
        spark.readStream.format("market_bars")
        .option("tickers", "AAPL,MSFT")
        .option("days", "7")
        .load()
    )
    import uuid

    sink = f"bars_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table(sink).collect()))
    batch = sorted(
        map(tuple, _bars(spark, "AAPL,MSFT", 7).collect())
    )
    assert streamed == batch


def test_html_parser_normalizes_tickers():
    rows = dimension.parse_constituents(dimension.SAMPLE_HTML)
    by_ticker = {r[0]: r for r in rows}
    assert "BRK-B" in by_ticker  # "." → "-" (config.py:24)
    assert "MSFT" in by_ticker  # whitespace stripped
    assert by_ticker["JNJ"][1] == "Johnson & Johnson"  # entity decoded
    assert all(len(r) == 4 for r in rows)


def test_fetch_stub_raises():
    with pytest.raises(NotImplementedError):
        dimension.fetch_constituents_html("https://example.com")
