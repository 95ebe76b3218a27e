"""Pipeline lifecycle tests (SURVEY §5.3-5.4): golden idempotency of the
incremental run, quality-gate rejection of violating frames, and
watermark-dedup serving loads.

Stock-domain frames are derived from the events fixture via the
FIXTURES.md A→B mapping (user_id → ticker, ts → date, value → close).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_market_etl_spark import pipeline, quality
from stock_market_etl_spark.io import load_table


def _raw_prices(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.date_trunc("day", "ts").alias("date"),
        (F.col("value") * 0.99).alias("open"),
        (F.col("value") * 1.01).alias("high"),
        (F.col("value") * 0.98).alias("low"),
        F.col("value").alias("close"),
        (F.col("event_id") % 1000 + 1).cast("long").alias("volume"),
        F.concat(F.lit("T"), F.col("user_id")).alias("ticker"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ingest_ts"),
    ).dropDuplicates(["ticker", "date"])


def _snapshot(spark, lake_path):
    rows = (
        spark.read.parquet(lake_path)
        .select(
            "ticker",
            "date",
            F.round("close", 6).alias("close"),
            F.round("daily_return", 6).alias("daily_return"),
            F.round("rolling_vol_30d", 6).alias("rolling_vol_30d"),
        )
        .collect()
    )
    return sorted(map(tuple, rows))


def test_backfill_then_increment_idempotent(spark, sf_smoke, tmp_path):
    """Golden test: re-running the same increment must converge to a
    byte-identical lake (L2/O7 idempotency)."""
    lake = str(tmp_path / "lake")
    raw = _raw_prices(spark, sf_smoke)
    cutoff = F.lit("2024-01-20").cast("timestamp")
    pipeline.backfill(raw.filter(F.col("date") < cutoff), lake)

    new_batch = raw.filter(F.col("date") >= cutoff)
    assert new_batch.count() > 0, "fixture must straddle the cutoff"
    pipeline.run_increment(spark, lake, _merged_raw(spark, lake, new_batch))
    first = _snapshot(spark, lake)
    pipeline.run_increment(spark, lake, _merged_raw(spark, lake, new_batch))
    second = _snapshot(spark, lake)
    assert first == second
    # and the lake now equals a clean full backfill (merge correctness)
    lake2 = str(tmp_path / "lake2")
    pipeline.backfill(raw, lake2)
    assert first == _snapshot(spark, lake2)


def _merged_raw(spark, lake, new_batch):
    # run_increment takes the raw new bars; it reads trailing history
    # itself. Pass the batch with raw columns only.
    return new_batch


def test_increment_prune_is_broadcast_semi_join(spark, sf_smoke, tmp_path):
    """The trailing-history prune must compile to a broadcast left-semi
    join (no driver-side ticker collect, no shuffle of the lake)."""
    lake = str(tmp_path / "lake")
    raw = _raw_prices(spark, sf_smoke)
    pipeline.backfill(raw, lake)
    pruned = pipeline.pruned_history(
        spark, lake, raw.filter(F.col("ticker") == "T1")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_increment_prunes_untouched_tickers(spark, sf_smoke, tmp_path):
    """A batch touching one ticker must not rewrite other tickers'
    partitions (partition-pruned incremental, L4/O1)."""
    lake = str(tmp_path / "lake")
    raw = _raw_prices(spark, sf_smoke)
    pipeline.backfill(raw, lake)
    before = _snapshot(spark, lake)

    one = raw.filter(F.col("ticker") == "T1")
    bumped = one.withColumn("close", F.col("close") + 1.0)
    pipeline.run_increment(spark, lake, bumped)
    after = _snapshot(spark, lake)

    changed = {t for t in set(after) - set(before)}
    assert changed, "T1 rows must have changed"
    assert {r[0] for r in changed} == {"T1"}
    untouched_before = [r for r in before if r[0] != "T1"]
    untouched_after = [r for r in after if r[0] != "T1"]
    assert untouched_before == untouched_after


def test_quality_gate_missing_column(spark, sf_smoke):
    raw = _raw_prices(spark, sf_smoke)
    bad = pipeline.enrich(raw).drop("volume")
    with pytest.raises(quality.DataQualityError, match="missing"):
        quality.validate(bad)


def test_quality_gate_dtype_mismatch(spark, sf_smoke):
    raw = _raw_prices(spark, sf_smoke)
    bad = pipeline.enrich(raw).withColumn(
        "volume", F.col("volume").cast("int")
    )
    with pytest.raises(quality.DataQualityError, match="dtype"):
        quality.validate(bad)


def test_quality_gate_null_keys(spark, sf_smoke):
    raw = _raw_prices(spark, sf_smoke)
    bad = pipeline.enrich(raw).withColumn(
        "ticker",
        F.when(F.col("ticker") != "T1", F.col("ticker")),
    )
    with pytest.raises(quality.DataQualityError, match="null"):
        quality.validate(bad)


def test_quality_gate_passes_clean(spark, sf_smoke):
    raw = _raw_prices(spark, sf_smoke)
    out = quality.validate(pipeline.enrich(raw))
    assert out.count() == raw.count()


def test_load_serving_watermark_dedup(spark, sf_smoke):
    """L3: reloading an overlapping batch adds only strictly-newer rows,
    once (reference `scripts/load_stock_metrics.py:76-89`)."""
    raw = _raw_prices(spark, sf_smoke)
    metrics = pipeline.enrich(raw)
    cutoff = F.lit("2024-01-20").cast("timestamp")
    serving = pipeline.load_serving(
        metrics.filter(F.col("date") < cutoff), None
    )
    n0 = serving.count()
    # reload the FULL history: only post-cutoff rows may land
    serving2 = pipeline.load_serving(metrics, serving)
    assert serving2.count() == metrics.count()
    # and loading it again changes nothing
    serving3 = pipeline.load_serving(metrics, serving2)
    assert serving3.count() == serving2.count()
    assert n0 < serving2.count()


def test_latest_year_watermark(spark, sf_smoke):
    raw = _raw_prices(spark, sf_smoke)
    y = pipeline.latest_year(pipeline.enrich(raw))
    max_date = raw.agg(F.max("date")).collect()[0][0]
    assert y == max_date.year


def test_observe_audit_matches_separate_scan(spark, sf_smoke):
    """observe_audit's single-pass metrics (riding the write job as
    accumulators) must equal the two-scan audit they replace
    (null_key_counts + count + max watermark)."""
    from stock_market_etl_spark.io import load_table
    from stock_market_etl_spark.quality import null_key_counts, observe_audit

    ev = load_table(spark, sf_smoke, "events").select(
        "user_id",
        F.when(F.col("value") < 5.0, None).otherwise(F.col("value")).alias(
            "value"
        ),
        "ts",
    )
    observed, obs = observe_audit(
        ev, keys=("user_id", "value"), watermark_col="ts"
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    expected_nulls = null_key_counts(ev, ("user_id", "value"))
    assert m["n_rows"] == ev.count()
    assert m["null_user_id"] == expected_nulls["user_id"]
    assert m["null_value"] == expected_nulls["value"]
    assert m["max_ts"] == ev.agg(F.max("ts")).collect()[0][0]


def test_volume_anomaly_gate_flags_planted_spike(spark):
    """k7's operator on synthetic volumes: ten stable days (~100
    events/day) then a 10× spike day — the spike must be the ONLY
    anomaly, warm-up days (< 3 prior) must carry NULL z-scores and
    never flag."""
    import datetime

    from pyspark.sql import functions as F

    from stock_market_etl_spark.catalog.quality_queries import (
        k7_volume_anomaly_gate,
    )

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for day in range(11):
        n = 1000 if day == 10 else 100 + (day % 3)  # mild jitter, then 10x
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=i), "click")
            )
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")

    import stock_market_etl_spark.catalog.quality_queries as qq

    orig = qq.load_table
    qq.load_table = lambda spark_, sf_, name: df
    try:
        out = {r["day"]: r for r in k7_volume_anomaly_gate(spark, "unused").collect()}
    finally:
        qq.load_table = orig

    spike_day = (base + datetime.timedelta(days=10)).date()
    assert out[spike_day]["is_anomaly"] is True
    assert out[spike_day]["z_score"] > 3
    for day, r in out.items():
        if day != spike_day:
            assert r["is_anomaly"] is False, (day, r)
    # warm-up rows (< 3 prior days) are unscored, not flagged
    for d in range(3):
        assert out[(base + datetime.timedelta(days=d)).date()]["z_score"] is None


def test_scd2_apply_semantics(spark):
    """All four merge cases in one batch, with NULL attribute values on
    both sides (null-safe change detection): changed closes + inserts,
    NULL->value and value->NULL count as changes, NULL==NULL does not,
    unmatched/unchanged rows pass through, new keys open their first
    version, closed history is untouched."""
    import datetime

    d0 = datetime.date(2020, 1, 1)
    eff = datetime.date(2024, 6, 1)
    old = datetime.date(2019, 1, 1)
    current = spark.createDataFrame(
        [
            (1, "A", d0, None),      # changed -> close + new version
            (2, "B", d0, None),      # unchanged re-delivery -> no-op
            (3, "C", d0, None),      # no update -> untouched
            (4, None, d0, None),     # NULL -> NULL: unchanged (null-safe)
            (5, None, d0, None),     # NULL -> value: changed
            (6, "F", d0, None),      # value -> NULL: changed
            (1, "A0", old, d0),      # closed history -> pass through
        ],
        "k long, seg string, valid_from date, valid_to date",
    )
    updates = spark.createDataFrame(
        [
            (1, "A2", eff),
            (2, "B", eff),
            (4, None, eff),
            (5, "E", eff),
            (6, None, eff),
            (9, "NEW", eff),         # first-seen key
        ],
        "k long, seg string, eff_date date",
    )
    out = pipeline.scd2_apply(current, updates, key="k", attrs=("seg",))
    rows = {(r["k"], r["seg"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows == {
        (1, "A", d0, eff), (1, "A2", eff, None), (1, "A0", old, d0),
        (2, "B", d0, None),
        (3, "C", d0, None),
        (4, None, d0, None),
        (5, None, d0, eff), (5, "E", eff, None),
        (6, "F", d0, eff), (6, None, eff, None),
        (9, "NEW", eff, None),
    }
    assert out.count() == len(rows)  # no duplicate emissions
    # one open row per key afterwards
    open_keys = [r["k"] for r in out.filter(F.col("valid_to").isNull()).collect()]
    assert sorted(open_keys) == [1, 2, 3, 4, 5, 6, 9]


def test_scd2_apply_null_keys_routed_not_fabricated(spark):
    """NULL keys never match (ADVICE r09 / upsert_snapshot contract):
    a NULL-keyed open row passes through untouched, a NULL-keyed
    update row inserts as a new open version, and — the original bug —
    a NULL-keyed update must NOT fabricate an all-NULL dimension row
    via the full join's unmatched branch."""
    import datetime

    d0 = datetime.date(2020, 1, 1)
    eff = datetime.date(2024, 6, 1)
    current = spark.createDataFrame(
        [
            (1, "A", d0, None),
            (None, "NK", d0, None),  # NULL-keyed open row
        ],
        "k long, seg string, valid_from date, valid_to date",
    )
    updates = spark.createDataFrame(
        [
            (1, "A2", eff),
            (None, "NU", eff),       # NULL-keyed update
        ],
        "k long, seg string, eff_date date",
    )
    out = pipeline.scd2_apply(current, updates, key="k", attrs=("seg",))
    rows = {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    }
    assert rows == {
        (1, "A", d0, eff), (1, "A2", eff, None),
        (None, "NK", d0, None),      # passed through, not closed
        (None, "NU", eff, None),     # appended as a new open version
    }
    # the fabricated all-NULL row (k NULL, seg NULL) must not exist
    assert out.count() == len(rows)
    assert not any(k is None and s is None for k, s, *_ in rows)


def test_merge_agg_state_edges(spark):
    """merge_agg_state edge semantics: one-sided keys pass through
    (count adds vs 0, sum/min/max pass through via coalesce/least
    skip-null), two-sided keys combine exactly, and merging the
    increment twice is NOT idempotent (state merge is additive by
    design — idempotence lives at the L2 row grain, so redelivery
    must dedup BEFORE rollup)."""
    from stock_market_etl_spark.pipeline import merge_agg_state

    a = spark.createDataFrame(
        [("k1", 2, 10.0, 1.0, 9.0), ("k2", 1, 5.0, 5.0, 5.0)],
        "k string, n long, s double, mn double, mx double",
    )
    b = spark.createDataFrame(
        [("k2", 3, 6.0, -2.0, 4.0), ("k3", 1, 7.0, 7.0, 7.0)],
        "k string, n long, s double, mn double, mx double",
    )
    out = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in merge_agg_state(
            a, b, keys=("k",), counts=("n",), sums=("s",),
            mins=("mn",), maxs=("mx",),
        ).collect()
    }
    assert out == {
        "k1": (2, 10.0, 1.0, 9.0),   # a-only passes through
        "k2": (4, 11.0, -2.0, 5.0),  # combined
        "k3": (1, 7.0, 7.0, 7.0),    # b-only passes through
    }
