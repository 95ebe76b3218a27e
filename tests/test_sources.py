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


def _sink_df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id long, k string, v double",
    )


def _sink_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )


def test_jsonl_sink_roundtrip_and_append_union(spark, tmp_path):
    """b15's sink: an overwrite-then-append sequence publishes the
    union of both jobs' files in the manifest; the read-back equals
    the written rows twice."""
    from stock_market_etl_spark.sources.audit_sink import (
        JsonlAuditSink,
        read_jsonl_audit,
    )

    spark.dataSource.register(JsonlAuditSink)
    path = str(tmp_path / "sink")
    df = _sink_df(spark)
    df.write.format("jsonl_audit").option("path", path).mode("append").save()
    df.write.format("jsonl_audit").option("path", path).mode("append").save()
    got = sorted(
        map(tuple, read_jsonl_audit(spark, path, _sink_schema()).collect())
    )
    want = sorted(map(tuple, df.union(df).collect()))
    assert got == want


def test_jsonl_sink_reader_trusts_manifest_only(spark, tmp_path):
    """Crashed-job contract: tmp files (and even stray committed-named
    files) outside the manifest must be invisible to the reader."""
    import json
    import os

    from stock_market_etl_spark.sources.audit_sink import (
        MANIFEST,
        JsonlAuditSink,
        read_jsonl_audit,
    )

    spark.dataSource.register(JsonlAuditSink)
    path = str(tmp_path / "sink")
    # no manifest at all -> empty read, not an error
    assert read_jsonl_audit(spark, path, _sink_schema()).count() == 0
    _sink_df(spark).write.format("jsonl_audit").option("path", path).mode(
        "append"
    ).save()
    # simulate a crashed concurrent job: orphan tmp + unmanifested file
    with open(os.path.join(path, "part-deadbeef.jsonl.tmp"), "w") as f:
        f.write(json.dumps({"id": 99, "k": "junk", "v": 9.9}) + "\n")
    with open(os.path.join(path, "part-unpublished.jsonl"), "w") as f:
        f.write(json.dumps({"id": 98, "k": "junk", "v": 9.8}) + "\n")
    rows = read_jsonl_audit(spark, path, _sink_schema()).collect()
    assert len(rows) == 3
    assert all(r["k"] != "junk" for r in rows)
    with open(os.path.join(path, MANIFEST)) as f:
        published = json.load(f)
    # one file per non-empty task; never the planted junk, never tmp
    assert published
    assert "part-unpublished.jsonl" not in published
    assert all(n.endswith(".jsonl") for n in published)


def test_jsonl_sink_abort_removes_tmp_files(tmp_path):
    """The abort path (driver, after a task failure) must delete every
    tmp file named in the collected commit messages."""
    import os

    import pyarrow as pa

    from stock_market_etl_spark.sources.audit_sink import _JsonlWriter

    path = str(tmp_path / "sink")
    w = _JsonlWriter(path, overwrite=False)
    msg = w.write(iter([pa.RecordBatch.from_pylist([{"id": 1, "v": 2.0}])]))
    assert os.path.exists(os.path.join(path, msg.tmp_name))
    w.abort([msg, None])  # None = the failed task's slot
    assert not os.path.exists(os.path.join(path, msg.tmp_name))
    assert os.listdir(path) == []
