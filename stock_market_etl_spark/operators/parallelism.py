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
    ``sparkContext.defaultParallelism``) — only when the input is
    narrower than that; wide inputs pass through untouched."""
    target = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
