"""SparkSession factory and session-level configuration.

The engine is designed for a multi-executor cluster at ~100 TB scale but
is exercised locally on ``local[N]``. Everything scale-relevant is
expressed through session confs (AQE, shuffle partitions, broadcast
threshold) rather than hand-scheduling, so the same logical plans run
unchanged on a 1000-executor cluster.

Reference parity notes: the reference stamps UTC timestamps at ingest
(`scripts/ingest_hourly.py:68`) and converts to US/Eastern only at
display (`scripts/app.py:213`), so the session timezone is pinned to
UTC.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must hold for the engine's reads/plans regardless of who
# created the session (the verify driver may hand us its own session).
_RUNTIME_CONFS: dict[str, str] = {
    # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark cannot
    # map to TimestampType; read it as raw nanos and convert explicitly
    # (see io.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # cross-engine arithmetic canon (SURVEY §7 known-hard list): DuckDB
    # 1.0.0 and Polars both yield NULL-ish (not an error) on double/0;
    # Spark 4's ANSI mode raises instead. Pre-ANSI semantics (x/0 →
    # NULL) match the oracle and the reference.
    "spark.sql.ansi.enabled": "false",
    # local[32]-sized shuffle width; AQE coalesces/splits at runtime so
    # this is a ceiling, not a hand-tuned constant (cluster deployments
    # override per executor count)
    "spark.sql.shuffle.partitions": "32",
    # runtime re-planning: partition coalescing, skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Coalescing floor 1m -> 64k (r15, guide §2.2/§2.5): several
    # operators put a COMPUTE-DENSE stage below a small exchange —
    # the doc-grain text repartition feeding the ~19x gram explode
    # (repetition_metrics/x56/x57), the bin-grain session explode
    # (d11) — and the default 1 MB floor coalesced a 2 MB exchange
    # to 2 tasks, serializing minutes of fan-out work on 2 of 32
    # cores (measured: x56 1.75 -> 0.99 s, d11 2.7 -> 1.0 s at
    # sf0.1 interleaved A/B; x71/x84 neutral). Scale-adaptive by
    # construction, not a local[32] constant: with
    # parallelismFirst (default) the coalescing target is
    # max(bytes/defaultParallelism, THIS floor) capped by the 64 MB
    # advisory, so on a production cluster where exchanges dwarf
    # cores x 64 KB the floor never engages — it only stops
    # sub-core-count collapses of small-byte/high-CPU shuffles.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # idempotent partition rewrites (SURVEY §2 O7/L2) overwrite only the
    # partitions present in the written frame.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow for any pandas_udf / toPandas edge
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # write timestamps as INT64 micros, not legacy INT96: INT96 carries
    # NO parquet min/max statistics, so every ts-predicate scan over an
    # engine-written lake would decode row groups that footer stats
    # should have skipped (io.write_clustered's pruning depends on
    # this), and INT96 is deprecated in the parquet spec besides
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    Safe to call repeatedly; used by ``__spark_entry__`` because the
    driver owns session creation there.
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-runtime-settable in some deployments; engine code
            # falls back where possible
            pass
    return spark


def get_spark(
    app_name: str = "stock_market_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, falling
    back to ``local[*]``) so tests and bench share one entry point.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # getOrCreate may have returned a pre-existing session; re-assert
    return prepare_session(spark)
