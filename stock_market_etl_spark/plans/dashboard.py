"""Dashboard query library — the reference's five Streamlit analytics
(`scripts/app.py`, SURVEY §3.3) as pure DataFrame→DataFrame functions.

In the reference these run half in Postgres SQL and half in pandas; here
each is one declarative Spark plan, parameterized on (key, time, price)
column names so they serve both the events fixture (user_id/ts/value)
and real stock frames (ticker/date/close).

Scale: every function is a single window/agg pipeline partitioned by the
series key — one shuffle each, dims broadcast, no driver-side compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compute_trends(
    df: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    price: str = "value",
    tiebreak: str = "event_id",
    investment: float = 10_000.0,
) -> DataFrame:
    """`compute_trends` (reference `scripts/app.py:46-52`): cumulative
    return (cumprod of 1 + pct-change, first row filled with 0) and the
    absolute value of an initial investment.

    The cumulative product runs as exp(sum(log1p)) over an ordered
    running frame — O(n) per key, valid because prices are positive.
    """
    w = Window.partitionBy(key).orderBy(time, tiebreak)
    prev = F.lag(price, 1).over(w)
    dr = (F.col(price) - prev) / prev
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    cum = F.exp(F.sum(F.log1p(F.coalesce(dr, F.lit(0.0)))).over(wrun))
    return df.select(
        key,
        time,
        tiebreak,
        price,
        cum.alias("cumulative_return"),
        (F.lit(investment) * cum).alias("abs_return"),
    )


def final_returns(
    df: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    price: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """`compute_final_returns` (reference `scripts/app.py:54-66`): the
    last cumulative return and latest timestamp per key.

    Uses deterministic max_by instead of order-sensitive last()
    (SURVEY §2.E4 note).
    """
    trends = compute_trends(df, key, time, price, tiebreak)
    return trends.groupBy(key).agg(
        F.max_by("cumulative_return", F.col(time)).alias("final_return"),
        F.max(time).alias("latest_ts"),
    )


def relative_returns(
    df: DataFrame,
    base_key,
    comp_key,
    key: str = "user_id",
    time: str = "ts",
    price: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """`compute_relative_returns` (reference `scripts/app.py:68-73`):
    align two series' cumulative returns on calendar day and take the
    spread in percentage points (`100 * (base − comp)`).

    Day-level alignment uses the last event of each day per key.
    """
    trends = compute_trends(
        df.filter(F.col(key).isin([base_key, comp_key])),
        key,
        time,
        price,
        tiebreak,
    )
    daily = trends.groupBy(key, F.to_date(time).alias("day")).agg(
        F.max_by("cumulative_return", F.col(time)).alias("cum_return")
    )
    # the inner join of the two series on day is a conditional
    # aggregation over the shared day key — one scan and one window
    # shuffle instead of two of each plus a join (the reference's
    # pandas merge, `scripts/app.py:71`, reads the frame twice)
    aligned = daily.groupBy("day").agg(
        F.max(
            F.when(F.col(key) == base_key, F.col("cum_return"))
        ).alias("base_return"),
        F.max(
            F.when(F.col(key) == comp_key, F.col("cum_return"))
        ).alias("comp_return"),
    )
    return aligned.filter(
        F.col("base_return").isNotNull() & F.col("comp_return").isNotNull()
    ).select(
        "day",
        "base_return",
        "comp_return",
        (100 * (F.col("base_return") - F.col("comp_return"))).alias(
            "relative_return"
        ),
    )


def latest_snapshot(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    time: str,
    tiebreak: str,
) -> DataFrame:
    """`latest-per-ticker snapshot` (reference `scripts/app.py:75-97`):
    latest fact row per key joined to the (broadcast) dimension.

    Plan choice: ``max_by(struct(cols), struct(time, tiebreak))``
    instead of ROW_NUMBER() — the aggregate form gets a map-side
    partial combine, so the exchange carries ≤ one row per (key,
    input partition) while the window form must shuffle and SORT the
    entire fact table first. Same deterministic row (lexicographic
    struct max ≡ ORDER BY time DESC, tiebreak DESC LIMIT 1); the
    ROW_NUMBER pattern itself stays demonstrated as §2.F4
    (catalog/windows.py f4_latest_row_per_key). The dimension side
    broadcasts (≤503 rows in the reference)."""
    payload = [c for c in fact.columns if c != fact_key]
    latest = (
        fact.groupBy(fact_key)
        .agg(
            F.max_by(
                F.struct(*payload), F.struct(time, tiebreak)
            ).alias("__latest")
        )
        .select(fact_key, "__latest.*")
    )
    return latest.join(
        F.broadcast(dim), latest[fact_key] == dim[dim_key], "inner"
    )


def top_movers(
    metrics: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    return_col: str = "daily_return",
    tiebreak: str = "event_id",
    k: int = 20,
) -> DataFrame:
    """`top gainers / losers` (reference `scripts/app.py:144-148`): the
    latest non-null return per key, then top-k and bottom-k with a
    direction label. Both limbs compile to TakeOrderedAndProject."""
    last_ret = metrics.filter(F.col(return_col).isNotNull()).groupBy(key).agg(
        F.max_by(return_col, F.struct(time, tiebreak)).alias("last_return")
    )
    gainers = (
        last_ret.orderBy(F.col("last_return").desc(), key)
        .limit(k)
        .withColumn("direction", F.lit("gainer"))
    )
    losers = (
        last_ret.orderBy(F.col("last_return").asc(), key)
        .limit(k)
        .withColumn("direction", F.lit("loser"))
    )
    return gainers.unionByName(losers)
