"""Environment canary: pin the engine-canonical dtype of every fixture
column whose physical parquet mapping has drifted (or could drift)
across Spark releases.

Round-3 postmortem: PySpark 4.1.2 silently switched the parquet
TIMESTAMP(NANOS) mapping for ``events.ts`` from the ``nanosAsLong``
bigint path to ``TIMESTAMP_NTZ``, which surfaced only as driver-side
hash mismatches and AnalysisExceptions. This test converts the next
such silent environment change into a named local failure.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE

#: engine-canonical post-load dtypes (what io.load_table guarantees),
#: per table, for every column downstream code depends on.
CANON = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # canon_events_ts normalizes all drift shapes
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_orderdate": "timestamp",  # parquet ts-NTZ → canon_timestamps
        "o_totalprice": "double",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_shipdate": "timestamp",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
    },
}


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_post_load_dtypes_are_canonical(spark, sf_dir):
    from stock_market_etl_spark.io import load_table

    for table, expected in CANON.items():
        dtypes = dict(load_table(spark, sf_dir, table).dtypes)
        for col, want in expected.items():
            assert dtypes.get(col) == want, (
                f"{table}.{col} at {sf_dir}: expected {want}, "
                f"got {dtypes.get(col)} — parquet reader drift? "
                f"Normalize in io.load_table / io.canon_events_ts."
            )


def test_canon_events_ts_handles_all_drift_shapes(spark):
    """canon_events_ts must converge bigint-nanos, TIMESTAMP_NTZ and
    TIMESTAMP to the same TimestampType values."""
    import datetime

    from pyspark.sql import functions as F, types as T

    from stock_market_etl_spark.io import canon_events_ts

    # one instant, three physical shapes
    nanos = 1_700_000_000_123_456_789
    expect = datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)

    bigint_df = spark.createDataFrame(
        [(nanos,)], T.StructType([T.StructField("ts", T.LongType())])
    )
    ntz_df = spark.createDataFrame(
        [(expect,)],
        T.StructType([T.StructField("ts", T.TimestampNTZType())]),
    )
    ts_df = spark.createDataFrame(
        [(expect,)],
        T.StructType([T.StructField("ts", T.TimestampType())]),
    )

    for df in (bigint_df, ntz_df, ts_df):
        out = canon_events_ts(df)
        assert dict(out.dtypes)["ts"] == "timestamp"
        got = out.select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")
        ).first()["s"]
        assert got == "2023-11-14 22:13:20.123456"


def test_stream_schema_matches_batch(spark, tmp_path):
    """The stream source's sniffed schema must equal the batch reader's
    physical schema for the same path (the r03 failure mode was a
    hardcoded stream schema diverging from the batch read)."""
    from stock_market_etl_spark.streaming.core import (
        batch_events,
        stream_events,
    )

    stream_df = stream_events(spark, SF_SMOKE)
    batch_df = batch_events(spark, SF_SMOKE)
    assert stream_df.schema == batch_df.schema


def test_written_timestamps_are_int64_micros_with_stats(spark, tmp_path):
    """Write-side canary for the r07 session contract
    (spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS): an
    engine-written timestamp column must land as INT64 µs — never
    legacy INT96, which carries NO parquet min/max statistics and
    silently disables the footer pruning b12/write_clustered depend
    on. Asserted on the physical file: column type AND present stats."""
    import glob

    import pyarrow.parquet as pq

    from stock_market_etl_spark.io import load_table

    path = str(tmp_path / "ts_canary")
    load_table(spark, SF_SMOKE, "events").select("event_id", "ts").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    md = pq.ParquetFile(glob.glob(f"{path}/part-*.parquet")[0]).metadata
    rg = md.row_group(0)
    col = next(
        rg.column(j)
        for j in range(rg.num_columns)
        if rg.column(j).path_in_schema == "ts"
    )
    assert col.physical_type == "INT64", col.physical_type
    assert col.statistics is not None and col.statistics.has_min_max
