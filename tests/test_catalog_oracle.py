"""The primary correctness gate, run locally: every catalog query with an
oracle must match DuckDB at sf0.01 (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare


def _query_names():
    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, oracle_con, sf_correct):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    df = qs[name](spark, sf_correct)
    assert df is not None
    if name not in oracles:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    problems = compare(df, oracle_con, oracles[name])
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_approx_count_distinct_bounded_error(spark):
    """e13's HLL++ estimates track the exact counts (e13b) within 5%
    (default rsd is 0.05; both fixture cardinalities are far above the
    small-cardinality exact regime, so the rsd band is the right
    bound)."""
    from stock_market_etl_spark.catalog import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.01"
    approx = qs["e13_approx_count_distinct"](spark, sf).collect()[0]
    exact = qs["e13b_exact_count_distinct"](spark, sf).collect()[0]
    for a, e in (
        (approx["approx_orders"], exact["n_orders"]),
        (approx["approx_parts"], exact["n_parts"]),
    ):
        assert abs(a - e) <= 0.05 * e, (a, e)


def test_approx_percentiles_bounded_error(spark):
    """e16's sketch percentiles track e15's exact ones within ~1% of
    the per-group value range (accuracy=10000 ⇒ rank error ≤ 1e-4; a
    loose value-space bound keeps the test robust to distribution)."""
    from stock_market_etl_spark.catalog import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.01"
    exact = {r["l_returnflag"]: r for r in qs["e15_percentiles"](spark, sf).collect()}
    approx = {r["l_returnflag"]: r for r in qs["e16_approx_percentiles"](spark, sf).collect()}
    assert exact.keys() == approx.keys()
    for k in exact:
        for col, scale in (("median_qty", 50.0), ("p90_price", 100000.0)):
            assert abs(exact[k][col] - approx[k][col]) <= 0.01 * scale, (k, col)
