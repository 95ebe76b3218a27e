"""Manual skew mitigation for shuffle joins — the salting move.

AQE's skew-join split (asserted live in tests/test_plans.py) handles
most skew by splitting oversized partitions at runtime, but it only
fires on sort-merge joins and only after a stage materializes the
skewed shuffle. Salting prevents the pile-up at PLAN time: the
heavy side spreads each key over ``n_salts`` sub-keys, the light side
replicates once per sub-key, and the join key becomes (key, salt) —
no reducer ever sees a hot key's full row set. The classic use: a
fact table where one tenant/user/symbol holds 30% of the rows,
joined to a per-key profile too large to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    heavy: DataFrame,
    light: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``heavy`` ⋈ ``light`` on ``on`` with the heavy side's hot
    keys spread over ``n_salts`` reducers. Result is row-identical to
    the plain join (the catalog oracle proves it): salting only
    changes WHERE rows meet, never which rows match.

    Mechanics: each heavy row draws a deterministic salt from the
    hash of its full row (duplicate rows share a salt — harmless, the
    spread only needs distinct rows to scatter); each light row is
    replicated once per salt value via ``explode(sequence(...))``, so
    the shuffle key (on, salt) splits every key's heavy rows into
    ``n_salts`` groups each meeting one copy of the light row. Cost:
    the light side's shuffle volume multiplies by ``n_salts`` — the
    knob trades light-side duplication against heavy-side reducer
    ceiling, so size it to the skew factor, not higher. Only inner
    and left joins are meaningful here (the light side is replicated;
    right/full would need per-salt dedup of unmatched light rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in heavy.columns]), F.lit(n_salts)
    ).cast("int")
    h = heavy.withColumn("__salt", salt)
    li = light.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1), F.lit(1))),
    )
    return h.join(li, [on, "__salt"], how).drop("__salt")
