"""Binned range (interval) join.

The reference has no range joins (SURVEY §2.D note) but a time-series
engine needs them: "pairs of rows within ``tolerance`` of each other on
a time axis" written naively is a cross join with an inequality
predicate — Spark plans that as BroadcastNestedLoopJoin/CartesianProduct,
an O(n²) scan that does not survive any scale-up.

The scale-correct shape is bucket equality: quantize each timestamp to a
``tolerance``-wide bin, join on bin equality (one side probes its own
bin plus both neighbours), then apply the exact |Δt| ≤ tolerance filter
bucket-locally.  The join becomes a plain hash/sort-merge equality join
that shuffle-partitions on the bin key, cost O(n · pairs-per-bin); this
is the same rewrite Databricks' range-join optimization and the binned
spatial joins in the literature perform, expressed with public DataFrame
ops so Catalyst/AQE still pick the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _micros(ts_col: Column) -> Column:
    # unix_micros accepts only TIMESTAMP; the cast makes the operator
    # total over TIMESTAMP_NTZ inputs too (value-preserving under the
    # engine's pinned-UTC session) and is a no-op on TIMESTAMP.
    return F.unix_micros(ts_col.cast("timestamp"))


def _bin(ts_col: Column, width_us: int) -> Column:
    # exact integer floor-to-multiple (pmod keeps it correct for
    # pre-epoch timestamps too, where `div`/cast would truncate up)
    micros = _micros(ts_col)
    return micros - F.pmod(micros, F.lit(width_us))


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_s: float,
) -> DataFrame:
    """All (left, right) row pairs with |left_ts − right_ts| ≤ tolerance.

    Column names of ``left`` and ``right`` must be disjoint (rename
    before calling, as with any Spark self-join).  Each qualifying pair
    is produced exactly once: the left row probes bins {b−1, b, b+1},
    the right row sits in exactly one bin, and |Δt| ≤ tolerance implies
    the right bin is one of those three.

    The exploded probe side triples row count *before* the shuffle —
    explode the smaller input (pass it as ``left``) so the 3× lands on
    the cheap side.
    """
    width_us = int(tolerance_s * 1_000_000)
    lb = left.withColumn(
        "__probe_bin",
        F.explode(
            F.array(
                _bin(F.col(left_ts), width_us) - F.lit(width_us),
                _bin(F.col(left_ts), width_us),
                _bin(F.col(left_ts), width_us) + F.lit(width_us),
            )
        ),
    )
    rb = right.withColumn("__bin", _bin(F.col(right_ts), width_us))
    exact = (
        F.abs(_micros(F.col(left_ts)) - _micros(F.col(right_ts)))
        <= F.lit(width_us)
    )
    return (
        lb.join(rb, F.col("__probe_bin") == F.col("__bin"))
        .filter(exact)
        .drop("__probe_bin", "__bin")
    )
