"""Property-based tests (hypothesis) for the engine's analytical core:
window math checked against an independent pandas computation, and merge
semantics checked against set algebra — on generated inputs, not just
the fixtures.

Example counts are kept small and derandomized: each example round-trips
through a Spark job.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from stock_market_etl_spark.operators.windows import compute_stock_metrics
from stock_market_etl_spark.pipeline import merge_increment

_prices = st.lists(
    st.floats(min_value=1.0, max_value=1000.0, allow_nan=False, width=32),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(series=_prices)
def test_metrics_match_pandas(spark, series):
    """daily_return and rolling_vol_30d must match pandas pct_change +
    rolling(30, min_periods=2).std(ddof=1) on arbitrary price series."""
    rows = [("T", i, float(p)) for i, p in enumerate(series)]
    df = spark.createDataFrame(rows, "ticker string, date int, close double")
    out = (
        compute_stock_metrics(df)
        .orderBy("date")
        .select("daily_return", "rolling_vol_30d")
        .collect()
    )
    s = pd.Series(series, dtype="float64")
    exp_dr = s.pct_change()
    exp_vol = exp_dr.rolling(30, min_periods=2).std(ddof=1)
    for i, row in enumerate(out):
        if pd.isna(exp_dr.iloc[i]):
            assert row.daily_return is None, i
        else:
            assert math.isclose(
                row.daily_return, exp_dr.iloc[i], rel_tol=1e-9, abs_tol=1e-12
            ), i
        if pd.isna(exp_vol.iloc[i]):
            assert row.rolling_vol_30d is None, i
        else:
            assert math.isclose(
                row.rolling_vol_30d, exp_vol.iloc[i], rel_tol=1e-9, abs_tol=1e-12
            ), i


_keysets = st.tuples(
    st.sets(st.integers(min_value=0, max_value=30), max_size=15),
    st.sets(st.integers(min_value=0, max_value=30), max_size=15),
)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(keys=_keysets)
def test_merge_increment_set_algebra(spark, keys):
    """merge(existing, new): result keys = existing ∪ new; every key in
    new carries new's payload; keys only in existing keep theirs."""
    existing_keys, new_keys = keys
    existing = spark.createDataFrame(
        [("T", k, "old") for k in existing_keys] or [("T", -1, "old")],
        "ticker string, date int, src string",
    )
    new = spark.createDataFrame(
        [("T", k, "new") for k in new_keys] or [("T", -2, "new")],
        "ticker string, date int, src string",
    )
    merged = {
        (r.date, r.src)
        for r in merge_increment(existing, new).collect()
    }
    e = existing_keys or {-1}
    n = new_keys or {-2}
    expected = {(k, "new") for k in n} | {(k, "old") for k in e - n}
    assert merged == expected
