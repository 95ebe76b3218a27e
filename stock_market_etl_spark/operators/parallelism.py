"""Input-width guard for compute-bound operators.

Similarity/dedup operators do orders of magnitude more per-row work
(interpreted higher-order folds, Arrow-batched numpy) than a scan, so
their wall-clock is bounded by input parallelism, not bytes. A small
corpus arriving as one parquet file (one unsplittable row group) would
otherwise run the whole operator on a single core.

At 100 TB inputs already carry ≥cores splits and `spread` is a no-op —
the repartition only fires when the source is narrower than the
cluster, and then it shuffles just the projected columns the operator
reads (the caller applies it after column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``min_partitions`` (default:
    ``spark.sql.shuffle.partitions``) — only when the input is
    narrower than that; wide inputs pass through untouched.

    Width is estimated from ``df.inputFiles()`` (public API, works
    under Spark Connect — unlike ``df.rdd``, which forces a plan→RDD
    conversion and is Connect-incompatible). File count undercounts
    splits when a file holds several row groups, so the check is
    conservative: it may round-robin a projection that was already
    wide enough, which costs one narrow shuffle of the few columns the
    compute-bound caller reads — while at scale (files ≥ cores) it is
    a guaranteed no-op. Non-file sources (in-memory test frames,
    streaming micro-batches) report zero files and always spread.
    """
    spark = df.sparkSession
    if min_partitions is not None:
        target = min_partitions
    else:
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        width = len(df.inputFiles())
    except Exception:  # non-file source / analysis barrier
        width = 0
    if width >= target:
        return df
    return df.repartition(target)
