"""Skew-mitigation operators (SURVEY §2.O, 100 TB stance).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in the engine session) handles most skew at runtime. This module
is the explicit form for the cases AQE cannot fix:

- a broadcast-ineligible join where one key holds a grossly
  disproportionate share of rows (`salted_join`);
- high-cardinality partial aggregation where a hot group overwhelms one
  task before map-side combine helps (`two_phase_agg`).

Both are pure DataFrame compositions — results are exactly equal to the
unsalted forms (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted into ``n_salts`` sub-keys
    and the other side replicated across every salt value.

    The hot key's rows split across ``n_salts`` tasks instead of one;
    the other side grows ``n_salts``× (use only when it is small enough
    to replicate but too big / ineligible to broadcast). Salt is derived
    from a hash of the skewed row's full column set — deterministic, no
    rand() in the plan.

    Only join types where replicated-but-unmatched right rows never
    reach the output are allowed: right/full-outer would emit each
    unmatched right row once per salt.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    salt = F.pmod(
        F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = left.join(right, [*on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt between phases:
    partial agg on (keys, salt), final combine on keys.

    ``aggs`` maps output column name → a *decomposable* aggregate
    expression given as the phase-1 expression; phase 2 combines with
    sum/max/min by convention: pass e.g. ``{"n": F.count("*")}`` and the
    final value is ``sum(n)``. Only sum/count/min/max decompositions are
    supported — the same constraint hash-aggregate partials have.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    combiners = []
    for name, expr in aggs.items():
        fn_name = expr._jc.toString().lower()
        # countDistinct/sum_distinct stringify without the DISTINCT flag
        # and would slip through the count/sum branch, but summing
        # per-salt distinct aggregates double-counts values seen under
        # several salts — reject via the expression node's isDistinct.
        node = getattr(expr._jc, "node", lambda: None)()
        if (
            node is not None
            and getattr(node, "isDistinct", lambda: False)()
        ) or "distinct" in fn_name:
            raise ValueError(
                f"non-decomposable aggregate for two_phase_agg: {name}"
            )
        if fn_name.startswith(("count", "sum")):
            combiners.append(F.sum(name).alias(name))
        elif fn_name.startswith("min"):
            combiners.append(F.min(name).alias(name))
        elif fn_name.startswith("max"):
            combiners.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"non-decomposable aggregate for two_phase_agg: {name}"
            )
    return partial.groupBy(*keys).agg(*combiners)
