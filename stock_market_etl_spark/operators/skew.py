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

from pyspark.sql import DataFrame, functions as F


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


#: fn name → (phase-1 builder, phase-2 combiner). Closed allowlist by
#: construction: the decompositions hash-aggregate partials support.
#: count re-combines via SUM; the rest are idempotent under merge.
_DECOMPOSABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt between phases:
    partial agg on (keys, salt), final combine on keys.

    ``aggs`` maps output column name → ``(fn, column)`` where ``fn`` is
    one of ``count | sum | min | max`` — the closed set of aggregates
    whose per-salt partials merge losslessly (the same constraint
    hash-aggregate partials have). The spec form makes non-decomposable
    aggregates (count DISTINCT, avg, percentiles) inexpressible instead
    of detected: the operator builds BOTH phases itself, so there is no
    expression surface to smuggle a DISTINCT flag through (the previous
    form sniffed `expr._jc` — private JVM API, dead under Spark
    Connect). Example: ``{"n": ("count", "*"), "s": ("sum", "value")}``
    ⇒ final columns ``n = sum(count per salt)``, ``s = sum(sums)``.
    """
    partials, combiners = [], []
    for name, (fn, col) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"non-decomposable aggregate for two_phase_agg: "
                f"{name}={fn!r} (allowed: {sorted(_DECOMPOSABLE)})"
            )
        phase1, phase2 = _DECOMPOSABLE[fn]
        partials.append(phase1(col).alias(name))
        combiners.append(phase2(name).alias(name))
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partials)
    )
    return partial.groupBy(*keys).agg(*combiners)
