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


#: DuckDB output types the driver's typed (Arrow) hash can represent
#: identically to Spark's. HUGEINT (int128, what an uncast sum() over
#: BIGINT produces) and DECIMAL are deliberately absent: they
#: hash-diverge from Spark's BIGINT/DOUBLE even when every value is
#: equal — the exact failure x45 hit in round 6.
_ALLOWED_ORACLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "TIMESTAMP",
    "DATE",
    "BOOLEAN",
}


def _oracle_type_ok(type_str: str) -> bool:
    base = type_str.split("(")[0]
    if base.endswith("[]"):  # list of an allowed element type
        base = base[:-2]
    return base in _ALLOWED_ORACLE_TYPES


def test_oracle_output_types_hashable(oracle_con):
    """Every oracle relation must bind to driver-hash-safe DuckDB types.

    Guards the whole class of x45's round-6 failure: DuckDB widens an
    uncast integer sum() to HUGEINT (int128), which value-compares
    equal to Spark's BIGINT but diverges under a typed hash. Binding
    the relation is enough — DuckDB resolves output types without
    executing, so this covers all 131 oracles in milliseconds.
    """
    oracles = entry_mod.oracle_sql()
    offenders = []
    for name, sql in oracles.items():
        rel = oracle_con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if not _oracle_type_ok(str(typ)):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, "non-hash-safe oracle output types:\n" + "\n".join(offenders)


def test_oracle_type_guard_catches_uncast_sum(oracle_con):
    """Self-check: the guard actually goes red on the bug class it
    exists for — an uncast sum() over a BIGINT column is HUGEINT."""
    rel = oracle_con.sql("SELECT sum(n_chars) AS t FROM documents")
    assert not _oracle_type_ok(str(rel.types[0]))
    assert _oracle_type_ok("BIGINT") and _oracle_type_ok("VARCHAR[]")


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


def test_hll_rollup_merge_exact_and_bounded(spark):
    """e20's two contracts: (1) merging hourly sketches is EXACTLY the
    sketch of the union — the merged-from-hourly daily estimate equals
    the direct daily sketch estimate register-for-register; (2) both
    track the exact daily distinct count within the HLL error band."""
    from pyspark.sql import functions as F

    from stock_market_etl_spark.catalog import all_queries
    from stock_market_etl_spark.io import load_table

    sf = "/root/testdata/sf0.01"
    merged = {
        r["day"]: r["approx_users"]
        for r in all_queries()["e20_hll_sketch_rollup"](spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    direct = {
        r["day"]: r["approx_users"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("approx_users")
        )
        .collect()
    }
    assert merged == direct  # merge property: union of sketches, exactly
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for day, est in merged.items():
        assert abs(est - exact[day]) <= max(0.05 * exact[day], 3), (
            day, est, exact[day],
        )


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
