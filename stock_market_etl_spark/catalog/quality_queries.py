"""SURVEY §2 K (quality gates) and §2 L (incremental/upsert/watermark)
as named, driver-checkable queries.

The K/L machinery itself lives in ``quality.py`` and ``pipeline.py``
(write barriers, merge helpers) and is exercised end-to-end by
``tests/test_pipeline.py``; these queries re-express each row as a
DataFrame so the DuckDB oracle can hash-check the *verdicts* too:

- K1/K2 (schema presence + dtype check, reference
  `scripts/transform.py:90-101`) audit schema METADATA — the result is
  data-independent by construction, so its oracle is the pinned
  expected-verdict literal.
- K3/K4 (key-null check + gate verdict, reference
  `scripts/transform.py:104-136`) is one distributed aggregation whose
  pass/fail bit IS the gate decision.
- L3 (cross-store dedup before load, reference
  `scripts/load_stock_metrics.py:76-88`) and L4 (year-range resume,
  reference `scripts/transform.py:138-148`) compose the pipeline
  helpers over a serving/batch split of the events fixture.

L1 is covered by e1_global_max_watermark + c4_watermark_filter and L2
by b2_upsert_merge (see DRIVER_WINDOW.md for the row → query map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from stock_market_etl_spark.io import load_table
from stock_market_etl_spark.pipeline import (
    newer_than_watermark,
    serving_watermarks,
)
from stock_market_etl_spark.quality import dtype_mismatches, missing_columns

QUERIES = {}
ORACLES = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


#: Deliberate contract for the K1/K2 audit: the events table's real
#: shape plus one missing column (adjusted_close) and one wrong dtype
#: (value expected string, actually double) so both violation kinds
#: appear in the audit output.
_EVENTS_CONTRACT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("props", T.StringType()),
        T.StructField("adjusted_close", T.DoubleType()),
    ]
)


@_q(
    "k1_schema_contract_audit",
    """SELECT * FROM (VALUES
         ('adjusted_close', 'double',    CAST(NULL AS VARCHAR), 'missing'),
         ('event_id',       'bigint',    'bigint',              'ok'),
         ('event_type',     'string',    'string',              'ok'),
         ('props',          'string',    'string',              'ok'),
         ('ts',             'timestamp', 'timestamp',           'ok'),
         ('user_id',        'bigint',    'bigint',              'ok'),
         ('value',          'string',    'double',              'type_mismatch')
       ) AS t(col_name, expected_type, actual_type, status)""",
)
def k1_schema_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K2: schema-presence and dtype audit of events against a
    contract with one missing column and one type drift (reference
    ``data_quality_checks``, `scripts/transform.py:90-101`).

    Schema audits read table METADATA, not rows — the per-column
    verdict frame is computed from ``df.schema`` on the driver (the
    only honest place; there is no distributed work in a schema
    check) and the oracle pins the expected verdicts.
    """
    ev = load_table(spark, sf_dir, "events")
    missing = set(missing_columns(ev, _EVENTS_CONTRACT))
    drift = dtype_mismatches(ev, _EVENTS_CONTRACT)
    actual = {f.name: f.dataType.simpleString() for f in ev.schema.fields}
    rows = []
    for field in _EVENTS_CONTRACT.fields:
        name = field.name
        if name in missing:
            status, act = "missing", None
        elif name in drift:
            status, act = "type_mismatch", drift[name][0]
        else:
            status, act = "ok", actual[name]
        rows.append((name, field.dataType.simpleString(), act, status))
    schema = T.StructType(
        [
            T.StructField("col_name", T.StringType(), False),
            T.StructField("expected_type", T.StringType(), False),
            T.StructField("actual_type", T.StringType(), True),
            T.StructField("status", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(sorted(rows), schema)


@_q(
    "k3_k4_quality_gate",
    """WITH gated AS (
         SELECT user_id, ts,
                CASE WHEN value > 0 THEN value END AS value_checked
         FROM events
       )
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user_id,
              CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ts,
              CAST(sum(CASE WHEN value_checked IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value_checked,
              (sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) = 0
               AND sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) = 0) AS gate_pass
       FROM gated""",
)
def k3_k4_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+K4: the key-null audit as ONE aggregation whose boolean IS
    the gate verdict (reference `scripts/transform.py:104-136`; the
    raising form is ``quality.validate``, tests/test_pipeline.py).

    ``value_checked`` (null where value ≤ 0) adds a genuinely nullable
    audited column so the null counters are exercised on real nulls,
    not a constant-zero frame. One job, map-side combined — the same
    single-aggregation shape ``quality.null_key_counts`` runs.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.when(F.col("value") > 0, F.col("value")).alias("value_checked"),
    )
    nulls = {
        c: F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        for c in ("user_id", "ts", "value_checked")
    }
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"), *nulls.values()
    ).withColumn(
        "gate_pass",
        (F.col("nulls_user_id") == 0) & (F.col("nulls_ts") == 0),
    )


@_q(
    "l3_cross_store_dedup",
    """WITH base AS (
         SELECT CAST(user_id AS VARCHAR) AS ticker,
                CAST(ts AS DATE) AS date, event_id
         FROM events
       ),
       serving AS (SELECT ticker, date FROM base WHERE event_id % 2 = 0),
       batch   AS (SELECT ticker, date FROM base WHERE event_id % 3 = 0),
       wm AS (SELECT ticker, max(date) AS latest_date
              FROM serving GROUP BY ticker)
       SELECT DISTINCT b.ticker, b.date
       FROM batch b LEFT JOIN wm ON b.ticker = wm.ticker
       WHERE wm.latest_date IS NULL OR b.date > wm.latest_date""",
)
def l3_cross_store_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: cross-store dedup before serving load — broadcast the
    per-key watermark table, keep strictly-newer rows, dedup on the key
    (reference `scripts/load_stock_metrics.py:76-88`; D1+C4+E6
    composition via ``pipeline.newer_than_watermark``).

    Serving store = even event_ids, incoming batch = every third
    event_id — overlapping stores so both branches (never-loaded key,
    newer-than-watermark row) occur. Only key columns are carried, so
    the dedup is deterministic. The watermark table is one row per key
    (≤ distinct user_ids) → always broadcast; the batch side never
    shuffles.
    """
    base = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("ticker"),
        F.to_date("ts").alias("date"),
        "event_id",
    )
    serving = base.filter(F.col("event_id") % 2 == 0).select("ticker", "date")
    batch = base.filter(F.col("event_id") % 3 == 0).select("ticker", "date")
    wm = serving_watermarks(serving)
    return newer_than_watermark(batch, wm).select("ticker", "date")


@_q(
    "l4_year_range_resume",
    """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
       WHERE EXTRACT(year FROM o_orderdate) >= (
         SELECT CAST(EXTRACT(year FROM max(o_orderdate)) AS INT)
         FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1999
       )""",
)
def l4_year_range_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: year-range resume — recompute only years ≥ the serving
    store's watermark year (reference `scripts/transform.py:138-148`,
    `scripts/load_stock_metrics.py:100-106`).

    The serving store is simulated as orders loaded through 1999, so
    the resume filter genuinely prunes (keeps 1999–2001 of the
    fixture's 1995–2001 span). The watermark is a 1-row aggregate
    broadcast into the filter; on a year=-partitioned lake
    (``io.write_partitioned``) the comparison is against the partition
    column, so the scan is partition-pruned to the resumed years — the
    100 TB point of L4.
    """
    orders = load_table(spark, sf_dir, "orders")
    resume = (
        orders.filter(F.year("o_orderdate") <= 1999)
        .agg(F.year(F.max("o_orderdate")).cast("int").alias("resume_year"))
    )
    return (
        orders.join(F.broadcast(resume))
        .filter(F.year("o_orderdate") >= F.col("resume_year"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


@_q(
    "k5_observed_write_metrics",
    """WITH t AS (
         SELECT user_id,
                CASE WHEN value < 5.0 THEN NULL ELSE value END AS value,
                ts
         FROM events)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_user_id,
              CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_value,
              max(ts) AS max_ts
       FROM t""",
)
def k5_observed_write_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K superset: single-pass observed audit — the K3 null audit and
    L1 high-watermark max computed by the SAME job that performs the
    write (``quality.observe_audit`` + Spark's ``Observation`` API),
    not by a second scan. The query runs the observed noop write (the
    engine's write-barrier discipline), then surfaces the observed
    metric row for the hash oracle; DuckDB recomputes the identical
    audit with a plain aggregate. At 100 TB this is the difference
    between auditing for free (accumulators riding the write's tasks)
    and doubling the pipeline's scan cost — the reference audits with
    separate queries (`scripts/transform.py:104-109`).

    The ``value < 5.0 → NULL`` rewrite simulates the feed's
    missing-quote sentinel so the observed null count is non-zero and
    data-dependent (real hash signal), mirrored exactly in the oracle.
    """
    from stock_market_etl_spark import quality

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("value") < 5.0, None).otherwise(F.col("value")).alias(
            "value"
        ),
        "ts",
    )
    observed, obs = quality.observe_audit(
        ev, keys=("user_id", "value"), watermark_col="ts"
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["null_user_id"], m["null_value"], m["max_ts"])],
        "n_rows long, null_user_id long, null_value long, max_ts timestamp",
    )


@_q(
    "k6_release_drift_audit",
    """WITH t AS (
         SELECT source,
                CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END AS in_old,
                CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END AS in_new,
                length(text) AS len
         FROM documents),
       s AS (
         SELECT source,
                CAST(sum(in_old) AS BIGINT) AS old_docs,
                CAST(sum(in_new) AS BIGINT) AS new_docs,
                CAST(sum(in_old * len) AS BIGINT) AS old_len,
                CAST(sum(in_new * len) AS BIGINT) AS new_len
         FROM t GROUP BY source),
       sh AS (
         SELECT source, old_docs, new_docs,
                CAST(old_docs AS DOUBLE)
                  / CAST(sum(old_docs) OVER () AS DOUBLE) AS old_share,
                CAST(new_docs AS DOUBLE)
                  / CAST(sum(new_docs) OVER () AS DOUBLE) AS new_share,
                CASE WHEN old_docs > 0
                     THEN CAST(old_len AS DOUBLE) / old_docs END AS mlo,
                CASE WHEN new_docs > 0
                     THEN CAST(new_len AS DOUBLE) / new_docs END AS mln
         FROM s)
       SELECT source, old_docs, new_docs,
              round(old_share, 6) AS old_share,
              round(new_share, 6) AS new_share,
              round(abs(old_share - new_share), 6) AS share_drift,
              round(mlo, 6) AS mean_len_old,
              round(mln, 6) AS mean_len_new,
              (abs(old_share - new_share) > 0.005
               OR abs(mln - mlo) / mlo > 0.05) AS drifted
       FROM sh""",
)
def k6_release_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K superset: corpus release drift audit — per-source volume,
    corpus-share and mean-length movement between two releases (the
    same v1/v2 slices x47 diffs at content grain), with a drift flag
    (share moved > 0.5pp, or mean length moved > 5% relative). x47
    answers "which documents changed"; k6 is the release gate a
    training-data pipeline runs FIRST — "did the source mix shift
    enough to invalidate the sampling weights" (the x42 temperature
    mix is a direct consumer of these shares).

    Scale shape: ONE scan of the corpus tags each row with membership
    in both releases and conditionally aggregates counts and length
    sums per source — no self-join of releases, no second scan, and
    text never leaves the scan stage (only (source, 4 longs) rows
    enter the exchange, map-side partial). The share normalization is
    an unpartitioned window over the per-source aggregate, which is
    dims-sized (#sources), not data-sized — the single-partition
    collapse is on ~10 rows by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "source",
        F.when(F.col("doc_id") % 3 != 0, 1).otherwise(0).alias("in_old"),
        F.when(F.col("doc_id") % 5 != 0, 1).otherwise(0).alias("in_new"),
        F.length("text").alias("len"),
    )
    per_src = tagged.groupBy("source").agg(
        F.sum("in_old").cast("long").alias("old_docs"),
        F.sum("in_new").cast("long").alias("new_docs"),
        F.sum(F.col("in_old") * F.col("len")).cast("long").alias("old_len"),
        F.sum(F.col("in_new") * F.col("len")).cast("long").alias("new_len"),
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    old_share = F.col("old_docs") / F.sum("old_docs").over(tot)
    new_share = F.col("new_docs") / F.sum("new_docs").over(tot)
    mlo = F.when(
        F.col("old_docs") > 0, F.col("old_len") / F.col("old_docs")
    )
    mln = F.when(
        F.col("new_docs") > 0, F.col("new_len") / F.col("new_docs")
    )
    return per_src.select(
        "source",
        "old_docs",
        "new_docs",
        F.round(old_share, 6).alias("old_share"),
        F.round(new_share, 6).alias("new_share"),
        F.round(F.abs(old_share - new_share), 6).alias("share_drift"),
        F.round(mlo, 6).alias("mean_len_old"),
        F.round(mln, 6).alias("mean_len_new"),
        (
            (F.abs(old_share - new_share) > 0.005)
            | (F.abs(mln - mlo) / mlo > 0.05)
        ).alias("drifted"),
    )


@_q(
    "k7_volume_anomaly_gate",
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1, 2),
       z AS (
         SELECT event_type, day, n_events,
                avg(n_events) OVER w AS mu,
                stddev_samp(n_events) OVER w AS sd,
                count(*) OVER w AS n_prior
         FROM d
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
       SELECT event_type, day, n_events,
              round(CASE WHEN n_prior >= 3 AND sd > 0
                         THEN (n_events - mu) / sd END, 6) AS z_score,
              coalesce(CASE WHEN n_prior >= 3 AND sd > 0
                            THEN abs((n_events - mu) / sd) > 3.0 END,
                       FALSE) AS is_anomaly
       FROM z""",
)
def k7_volume_anomaly_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K superset: feed-volume anomaly gate — per (event_type, day)
    row counts scored against their own trailing 7-day window
    (z-score; anomaly = |z| > 3 with ≥ 3 prior days and non-degenerate
    spread). The monitoring gate a production ingest runs BEFORE
    accepting a day's load: a silently half-delivered feed or a
    double-delivered batch moves daily volume by many sigma while
    passing every schema/null check (K1-K4 see nothing).

    Scale shape: the grouped count collapses to the (type, day) grain
    map-side — the one event-sized stage is the scan; the window then
    ranks a few-hundred-row frame per type. Thresholds are the
    conventional 3-sigma; the z-score column is returned so callers
    can gate at their own level."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    n_prior = F.count("n_events").over(w)
    ok = (n_prior >= 3) & (sd > 0)
    z = (F.col("n_events") - mu) / sd
    return d.select(
        "event_type",
        "day",
        "n_events",
        F.round(F.when(ok, z), 6).alias("z_score"),
        F.coalesce(F.when(ok, F.abs(z) > 3.0), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


@_q(
    "k8_column_profile",
    """SELECT 'event_id' AS col, CAST(count(event_id) AS BIGINT) AS n,
              CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
              CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
       FROM events
       UNION ALL
       SELECT 'ts', CAST(count(ts) AS BIGINT),
              CAST(count(*) - count(ts) AS BIGINT),
              CAST(count(DISTINCT ts) AS BIGINT) FROM events
       UNION ALL
       SELECT 'user_id', CAST(count(user_id) AS BIGINT),
              CAST(count(*) - count(user_id) AS BIGINT),
              CAST(count(DISTINCT user_id) AS BIGINT) FROM events
       UNION ALL
       SELECT 'event_type', CAST(count(event_type) AS BIGINT),
              CAST(count(*) - count(event_type) AS BIGINT),
              CAST(count(DISTINCT event_type) AS BIGINT) FROM events
       UNION ALL
       SELECT 'value', CAST(count(value) AS BIGINT),
              CAST(count(*) - count(value) AS BIGINT),
              CAST(count(DISTINCT value) AS BIGINT) FROM events
       UNION ALL
       SELECT 'props', CAST(count(props) AS BIGINT),
              CAST(count(*) - count(props) AS BIGINT),
              CAST(count(DISTINCT props) AS BIGINT) FROM events""",
)
def k8_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K superset: whole-table column profile — per column: non-null
    count, null count, EXACT distinct count, in ONE pass over the
    table (the data-profiling audit run before onboarding a feed;
    e7's null audit is the nulls-only slice of this). The profile
    row-set is tiny (|columns| rows) regardless of table volume.

    Plan shape: Spark compiles multiple count(DISTINCT col) in one
    agg via Expand (|columns|+1 streams over the scan) with partial
    aggregation on each — ONE table scan, no joins of per-column
    subqueries (the oracle's UNION ALL of six scans is the naive
    form). At 100 TB the same statement holds; swap exact distinct
    for approx_count_distinct (e13's sketch path) when ±2% suffices
    — the query shape is identical."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    one = ev.agg(
        *[
            a
            for c in cols
            for a in (
                F.count(c).cast("long").alias(f"n_{c}"),
                F.count_distinct(F.col(c)).cast("long").alias(f"d_{c}"),
                F.count("*").cast("long").alias(f"t_{c}"),
            )
        ]
    )
    stacked = ", ".join(
        f"'{c}', n_{c}, t_{c} - n_{c}, d_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (col, n, n_null, n_distinct)"
    )


@_q(
    "l5_scd2_dimension",
    """WITH cur_open AS (
         SELECT c_custkey AS custkey, c_mktsegment AS mktsegment,
                c_nationkey AS nationkey,
                DATE '2020-01-01' AS valid_from,
                CAST(NULL AS DATE) AS valid_to
         FROM customer),
       hist AS (
         SELECT c_custkey AS custkey, 'OLD' AS mktsegment,
                c_nationkey AS nationkey,
                DATE '2019-01-01' AS valid_from,
                DATE '2020-01-01' AS valid_to
         FROM customer WHERE c_custkey % 7 = 0),
       upd AS (
         SELECT c_custkey AS k,
                'SEG_' || CAST(c_custkey % 5 AS VARCHAR) AS seg,
                c_nationkey AS nat, DATE '2024-06-01' AS eff
         FROM customer WHERE c_custkey % 3 = 0
         UNION ALL
         SELECT c_custkey, c_mktsegment, c_nationkey, DATE '2024-06-01'
         FROM customer WHERE c_custkey % 3 = 1
         UNION ALL
         SELECT c_custkey + 100000, 'NEW', c_nationkey, DATE '2024-06-01'
         FROM customer WHERE c_custkey % 11 = 0),
       j AS (
         SELECT c.custkey AS ck, c.mktsegment AS cseg,
                c.nationkey AS cnat, c.valid_from AS cfrom,
                u.k AS uk, u.seg AS useg, u.nat AS unat, u.eff AS ueff,
                ((u.seg IS DISTINCT FROM c.mktsegment)
                 OR (u.nat IS DISTINCT FROM c.nationkey)) AS changed
         FROM cur_open c FULL JOIN upd u ON c.custkey = u.k)
       SELECT * FROM hist
       UNION ALL
       SELECT ck, cseg, cnat, cfrom, CAST(NULL AS DATE)
       FROM j WHERE uk IS NULL
       UNION ALL
       SELECT ck, cseg, cnat, cfrom, CAST(NULL AS DATE)
       FROM j WHERE ck IS NOT NULL AND uk IS NOT NULL AND NOT changed
       UNION ALL
       SELECT ck, cseg, cnat, cfrom, ueff
       FROM j WHERE ck IS NOT NULL AND uk IS NOT NULL AND changed
       UNION ALL
       SELECT uk, useg, unat, ueff, CAST(NULL AS DATE)
       FROM j WHERE uk IS NOT NULL AND (ck IS NULL OR changed)""",
)
def l5_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L superset: SCD TYPE 2 dimension merge (pipeline.scd2_apply) —
    the history-preserving alternative to the reference's wholesale
    dimension reload (`scripts/load_stock_metrics.py:40-66`): a
    changed attribute closes the open row (valid_to = effective date)
    and inserts a new open version; unchanged updates are no-ops;
    first-seen keys insert their first version; closed history passes
    through untouched. The update batch is built deterministically
    from the customer fixture with all four cases present: changed
    segments (custkey%3=0), no-op re-deliveries (%3=1), untouched
    keys (%3=2), brand-new keys (+100000 for %11=0), plus
    pre-existing closed history (%7=0). The oracle replays the merge
    with null-safe IS DISTINCT FROM change detection over a FULL
    JOIN — exactly the operator's one key-grain join."""
    from stock_market_etl_spark.pipeline import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    d = F.lit(None).cast("date")
    current = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").alias("nationkey"),
        F.to_date(F.lit("2020-01-01")).alias("valid_from"),
        d.alias("valid_to"),
    ).unionAll(
        cust.filter(F.col("c_custkey") % 7 == 0).select(
            F.col("c_custkey").alias("custkey"),
            F.lit("OLD").alias("mktsegment"),
            F.col("c_nationkey").alias("nationkey"),
            F.to_date(F.lit("2019-01-01")).alias("valid_from"),
            F.to_date(F.lit("2020-01-01")).alias("valid_to"),
        )
    )
    eff = F.to_date(F.lit("2024-06-01"))
    updates = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.concat(
                F.lit("SEG_"), (F.col("c_custkey") % 5).cast("string")
            ).alias("mktsegment"),
            F.col("c_nationkey").alias("nationkey"),
            eff.alias("eff_date"),
        )
        .unionAll(
            cust.filter(F.col("c_custkey") % 3 == 1).select(
                F.col("c_custkey").alias("custkey"),
                F.col("c_mktsegment").alias("mktsegment"),
                F.col("c_nationkey").alias("nationkey"),
                eff.alias("eff_date"),
            )
        )
        .unionAll(
            cust.filter(F.col("c_custkey") % 11 == 0).select(
                (F.col("c_custkey") + 100000).alias("custkey"),
                F.lit("NEW").alias("mktsegment"),
                F.col("c_nationkey").alias("nationkey"),
                eff.alias("eff_date"),
            )
        )
    )
    return scd2_apply(
        current,
        updates,
        key="custkey",
        attrs=("mktsegment", "nationkey"),
    )


@_q(
    "l6_incremental_agg_rollup",
    """SELECT user_id, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 6) AS sum_value,
              round(min(value), 6) AS min_value,
              round(max(value), 6) AS max_value
       FROM events GROUP BY 1, 2""",
)
def l6_incremental_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L superset: incremental view maintenance for a continuous
    aggregate — the serving rollup (events before the cutoff,
    standing in for the materialized store) merged with the increment
    batch's rollup by AGGREGATE-STATE arithmetic
    (pipeline.merge_agg_state: counts/sums add, min/max
    least/greatest), never by re-aggregating history. The oracle is
    the FULL recompute over all events — merged state must equal it
    exactly, the invariant that makes never-recompute safe at 100 TB
    (e19 merges across grain, hour→day; l6 merges across TIME at one
    grain — together they are the two axes of continuous-aggregate
    maintenance). The state merge's exchange carries (user, day)
    state rows only."""
    from stock_market_etl_spark.pipeline import merge_agg_state

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    cutoff = "2024-01-20"

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.to_date("ts").alias("day")
        ).agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    state = rollup(ev.filter(F.col("ts") < cutoff))
    inc = rollup(ev.filter(F.col("ts") >= cutoff))
    merged = merge_agg_state(
        state,
        inc,
        keys=("user_id", "day"),
        counts=("n_events",),
        sums=("sum_value",),
        mins=("min_value",),
        maxs=("max_value",),
    )
    return merged.select(
        "user_id",
        "day",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )
