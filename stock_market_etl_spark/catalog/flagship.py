"""Flagship query: the reference's metric pipeline over the events table.

Maps SURVEY §2 F1 (lag % change) + F2 (trailing rolling stddev) — the
Polars LazyFrame plan at reference `scripts/transform.py:65-79` — onto
the driver's ``events`` fixture (user_id ↔ ticker, ts ↔ date,
value ↔ close; FIXTURES.md mapping table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from stock_market_etl_spark.io import load_table
from stock_market_etl_spark.operators.windows import compute_stock_metrics


def metrics_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2 over events: per-user daily return + 30-row rolling vol."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # event_id is the unique tiebreaker for deterministic lag/frames
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value", 1).over(w)
    df = events.withColumn("daily_return", (F.col("value") - prev) / prev)
    wr = w.rowsBetween(-29, 0)
    n = F.count("daily_return").over(wr)
    df = df.withColumn(
        "rolling_vol_30d",
        F.when(n >= 2, F.stddev_samp("daily_return").over(wr)),
    )
    return df.select(
        "event_id",
        "ts",
        "user_id",
        F.round("value", 6).alias("value"),
        F.round("daily_return", 6).alias("daily_return"),
        F.round("rolling_vol_30d", 6).alias("rolling_vol_30d"),
    )


METRICS_PIPELINE_SQL = """
SELECT
  event_id,
  ts,
  user_id,
  round(value, 6) AS value,
  round(daily_return, 6) AS daily_return,
  round(CASE WHEN cnt >= 2 THEN vol END, 6) AS rolling_vol_30d
FROM (
  SELECT *,
    count(daily_return) OVER w AS cnt,
    stddev_samp(daily_return) OVER w AS vol
  FROM (
    SELECT event_id, ts, user_id, value,
      (value - lag(value) OVER w0) / lag(value) OVER w0 AS daily_return
    FROM events
    WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW
  )
)
"""

QUERIES = {"f1_f2_metrics_pipeline": metrics_pipeline}
ORACLES = {"f1_f2_metrics_pipeline": METRICS_PIPELINE_SQL}
