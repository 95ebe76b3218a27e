"""As-of (most-recent-match) join — a Spark-first custom operator.

The reference has no as-of join; this is part of the engine's superset
surface (SURVEY §2.D note). Instead of a per-key loop or a Pandas UDF,
it is expressed as a composition of built-in operators so Catalyst
optimizes it end-to-end:

    tag left/right → unionByName → last(right_value) ignoreNulls
    over (key, time) window → keep left rows

One shuffle on the key column, no Python in the hot path, and — unlike
the naive broadcast-range-join formulation — no O(n·m) blowup, so it
scales to 100 TB per-key series as long as a single key's rows fit a
task (same bound every window op has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` within the same ``key`` partition.

    Right value columns come back suffixed; left rows with no prior
    right row get nulls (left-outer as-of semantics).
    """
    value_cols = [c for c in right.columns if c not in (on, key)]
    l_tag = left.withColumn("__is_left", F.lit(1))
    r_tag = right.select(
        key,
        on,
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # order right rows before left rows at identical timestamps so an
    # exact-time right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__ff_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("__is_left") == 0, F.col(on)), ignorenulls=True
        )
        .over(w)
        .alias(f"{on}{suffix}"),
    )
    out_cols = [c for c in left.columns] + [f"{on}{suffix}"] + [
        f"__ff_{c}" for c in value_cols
    ]
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(*out_cols)
        .withColumnsRenamed({f"__ff_{c}": f"{c}{suffix}" for c in value_cols})
    )
