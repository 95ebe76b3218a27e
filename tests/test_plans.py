"""Physical-plan shape assertions (SURVEY §2.O 100 TB stance): the
catalog queries must not just return correct rows — they must compile to
the plan a 1000-executor cluster needs. These guard against regressions
that correctness checks cannot see (a broadcast silently becoming a
shuffle join, a filter no longer reaching the scan, a top-k becoming a
global sort).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_etl_spark.catalog import all_queries
from stock_market_etl_spark.io import load_table
from stock_market_etl_spark.operators import skew


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_single_shuffle(spark, sf_smoke):
    """The metrics pipeline must shuffle exactly once (both windows
    share the ticker partitioning)."""
    df = all_queries()["f1_f2_metrics_pipeline"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1


def test_flagship_column_pruning(spark, sf_smoke):
    """The scan must read only the five needed columns, not the whole
    events schema (props would be the expensive one at scale)."""
    df = all_queries()["f1_f2_metrics_pipeline"](spark, sf_smoke)
    plan = _plan(df)
    assert "props" not in plan


def test_broadcast_join_for_watermark_dim(spark, sf_smoke):
    """D1's ≤503-row watermark table must build a broadcast relation —
    the fact side never moves."""
    df = all_queries()["d1_broadcast_left_join"](spark, sf_smoke)
    assert "BroadcastExchange" in _plan(df)


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    """C5's IN + BETWEEN predicate must appear in the parquet scan's
    PushedFilters, not only as a post-scan Filter node."""
    df = all_queries()["c5_in_between_filter"](spark, sf_smoke)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"no pushed filters in scan: {pushed!r}"


def test_topk_compiles_to_take_ordered(spark, sf_smoke):
    """G3 must compile to TakeOrderedAndProject (per-partition heap +
    driver merge), never a global sort of the fact table."""
    df = all_queries()["g3_top_k"](spark, sf_smoke)
    assert "TakeOrderedAndProject" in _plan(df)


def test_no_cartesian_in_catalog_joins(spark, sf_smoke):
    """No catalog join may degenerate to an unintended cartesian product
    (d6_cross_join is the one deliberate exception)."""
    qs = all_queries()
    for name in [
        "d1_broadcast_left_join",
        "d2_dim_fact_inner_join",
        "d3_self_join_time_align",
        "d4_left_anti_join",
        "d9_star_join_revenue",
    ]:
        plan = _plan(qs[name](spark, sf_smoke))
        assert "CartesianProduct" not in plan, name


def test_lsh_near_dup_join_is_equality_not_cartesian(spark, sf_smoke):
    """x17's candidate generation must be an equality join on
    (lsh_table, lsh_bucket) — shuffle-partitionable at 100 TB — while
    x16's exact form is the deliberate O(n²) ground truth. A regression
    that loses the bucket equality would silently turn the scale path
    back into an all-pairs scan."""
    plan = _plan(all_queries()["x17_embedding_near_dup_lsh"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_equals_plain_join(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "value"
    )
    dim = (
        ev.groupBy("user_id").agg(F.avg("value").alias("avg_v"))
    )
    plain = ev.join(dim, ["user_id"]).select("event_id", "avg_v")
    salted = skew.salted_join(ev, dim, on="user_id").select(
        "event_id", "avg_v"
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_skew_ops_reject_unsound_forms(spark, sf_smoke):
    """salted_join must refuse join types where the replicated right
    side leaks unmatched rows once per salt."""
    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    with pytest.raises(ValueError, match="salted_join supports"):
        skew.salted_join(ev, dim, on="user_id", how="full_outer")


def test_range_join_is_equality_not_cartesian(spark, sf_smoke):
    """d10's binned range join must compile to a bin-equality join —
    shuffle-partitionable — never the BroadcastNestedLoopJoin the naive
    inequality-only predicate produces."""
    plan = _plan(all_queries()["d10_range_join_pairs"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    """Tables pre-bucketed on the join key (io.write_bucketed) must
    sort-merge-join with zero Exchange on either side — the layout paid
    the shuffle once at write time (SCALE.md Joins)."""
    import shutil

    from stock_market_etl_spark import io

    for t in ("li_bucketed", "od_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    od = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    io.write_bucketed(li, "li_bucketed", ("l_orderkey",), 8, ("l_orderkey",))
    io.write_bucketed(od, "od_bucketed", ("o_orderkey",), 8, ("o_orderkey",))
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force SMJ so the assertion targets the exchange, not a
        # broadcast that would hide it at this tiny scale factor
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        j = spark.table("li_bucketed").join(
            spark.table("od_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it still returns the same rows as the plain join
        plain = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        assert j.count() == plain.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        for t in ("li_bucketed", "od_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)


def test_ivf_index_partition_pruning(spark, sf_smoke, tmp_path):
    """An IVF probe over a cell-partitioned index must prune at file
    listing (PartitionFilters on the cell column) and return the same
    candidates as probing the in-memory assignment."""
    from stock_market_etl_spark.operators import similarity

    emb = load_table(spark, sf_smoke, "embeddings")
    assigned, centers = similarity.ivf_index(emb, n_lists=8)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(assigned, centers, path)
    reloaded, centers_lake = similarity.read_ivf_index(spark, path)
    pruned = reloaded.filter(F.col("__cell").isin([1, 3]))
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    assert "__cell" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    direct = similarity.ivf_probe(assigned, centers, query_id=0, n_probe=4)
    via_lake = similarity.ivf_probe(
        reloaded, centers_lake, query_id=0, n_probe=4
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_lake.collect())
    )


def test_incremental_dedup_corpus_scan_prunes_to_identity_cols(
    spark, sf_smoke, tmp_path
):
    """x39/n9's corpus-side claim: against a parquet corpus, the LSH
    path's scans must read only identity inputs from corpus files —
    text (sha2/shingle input) and doc_id (signature key) — never the
    payload columns (lang/source/n_chars). At 100 TB the corpus side is
    the big one; with `corpus_sigs` even these scans disappear, but the
    inline path must already column-prune to the identity set."""
    from stock_market_etl_spark.io import load_table as _lt
    from stock_market_etl_spark.operators.dedup import incremental_dedup

    docs = _lt(spark, sf_smoke, "documents")
    corpus_path = str(tmp_path / "corpus")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    out = incremental_dedup(corpus, batch, source="lsh", threshold=0.5)
    plan = _plan(out)
    corpus_scans = [
        seg
        for seg in plan.split("FileScan")[1:]
        if "corpus" in seg.split("ReadSchema:", 1)[0]
    ]
    assert corpus_scans, "corpus parquet scan not found in plan"
    for seg in corpus_scans:
        read_schema = seg.split("ReadSchema:", 1)[1].split("\n", 1)[0]
        assert "text" in read_schema or "doc_id" in read_schema
        for col in ("lang", "source", "n_chars"):
            assert col not in read_schema, (
                f"corpus scan reads payload column {col}: {read_schema}"
            )


def test_pack_and_shuffle_avoid_whole_stratum_windows(spark, sf_smoke):
    """The two-phase operators must keep their full-data window keyed
    on the chunk column — a regression to a per-stratum or global
    window would re-create the hot-task bottleneck the designs exist to
    avoid — and must close the gap via a broadcast offsets table."""
    qs = all_queries()
    pack_plan = _plan(qs["x24_sequence_pack"](spark, sf_smoke))
    assert "__chunk" in pack_plan  # chunked window key survived
    assert "BroadcastExchange" in pack_plan  # offsets ride a broadcast

    shuf_plan = _plan(qs["x27_deterministic_shuffle"](spark, sf_smoke))
    assert "__chunk" in shuf_plan
    assert "BroadcastExchange" in shuf_plan
    # the only SinglePartition exchange allowed is the 256-row offsets
    # aggregate, which sits under the broadcast side
    main_side = shuf_plan.split("BroadcastExchange")[0]
    assert "SinglePartition" not in main_side


def test_dataset_build_decontamination_is_broadcast_anti(spark, sf_smoke):
    """x28's decontamination must broadcast the held-out hash set and
    anti-join — a shuffled anti-join would move the corpus for a
    dimension-sized filter."""
    plan = _plan(all_queries()["x28_dataset_build"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_latest_snapshot_is_partial_agg_not_window(spark, sf_smoke):
    """q_latest_snapshot must compile to a map-side-combined max_by
    aggregate (exchange carries ≤ keys×partitions rows) and a broadcast
    dim join — NOT the ROW_NUMBER window form, which would shuffle and
    sort the whole fact table (that pattern lives in §2.F4 only)."""
    plan = _plan(all_queries()["q_latest_snapshot"](spark, sf_smoke))
    assert "max_by" in plan
    assert "partial_max_by" in plan or "Partial" in plan  # map-side combine
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_document_chunks_zero_shuffle(spark, sf_smoke):
    """x36's fan-out must happen inside the scan stage: no Exchange
    anywhere in the plan (chunking is a narrow transformation)."""
    plan = _plan(all_queries()["x36_document_chunks"](spark, sf_smoke))
    assert "Exchange" not in plan


def test_tfidf_and_bm25_plan_shapes(spark, sf_smoke):
    """x33: the term aggregation map-side-combines and corpus N rides
    a broadcast; x34: the top-k compiles to TakeOrderedAndProject
    (never a global sort) and corpus stats broadcast."""
    tfidf_df = all_queries()["x33_tfidf_topk"](spark, sf_smoke)
    tfidf = _plan(tfidf_df)
    assert "BroadcastExchange" in tfidf  # scalar N (AQE may add more)
    assert "partial_count" in tfidf or "Partial" in tfidf  # map-side combine
    # doc_len + top-k rank are both doc-grain windows: they must SHARE
    # one exchange (4 hash exchanges total: (doc,term) agg, df agg,
    # term join, doc windows) — a 5th would mean the shared
    # partitioning regressed to a join or separate window shuffle
    assert tfidf.count("Exchange hashpartitioning") <= 4, tfidf.count(
        "Exchange hashpartitioning"
    )
    bm25 = _plan(all_queries()["x34_bm25_topk"](spark, sf_smoke))
    assert "TakeOrderedAndProject" in bm25
    assert "BroadcastExchange" in bm25


def test_vocabulary_joins_carry_no_forced_broadcast(spark, sf_smoke):
    """x33's df/idf table and x37's unigram table are VOCABULARY-sized
    (grow with the corpus): a hard F.broadcast hint on them is a
    driver OOM at 100 TB. Only the genuinely scalar frames (corpus N,
    vocab size V) may keep hints — so each optimized logical plan must
    contain exactly ONE forced broadcast (AQE remains free to
    broadcast the vocab join when it measures small at runtime)."""
    for name in ("x33_tfidf_topk", "x37_bigram_lm_score"):
        df = all_queries()[name](spark, sf_smoke)
        logical = str(df._jdf.queryExecution().optimizedPlan())
        forced = logical.count("strategy=broadcast")
        assert forced == 1, f"{name}: {forced} forced broadcast hints"


def test_runtime_bloom_filter_injects_on_engine_join_shape(
    spark, sf_smoke, tmp_path
):
    """The engine's large-large join shapes must be eligible for
    Spark's runtime bloom-filter pruning (InjectRuntimeFilter): with a
    selective predicate on the creation side, the application side's
    scan gets a might_contain pre-filter, so at 100 TB most of the big
    side drops before the shuffle. Local fixture sizes sit under the
    default thresholds (creationSideThreshold 10 MB /
    applicationSideScanSizeThreshold 10 GB — at production sizes the
    optimizer applies this untouched), so the test lowers them to
    prove the SHAPE qualifies, and asserts the pruned plan returns
    exactly the unpruned result (bloom false positives are removed by
    the exact join; no false negatives exist)."""
    docs = load_table(spark, sf_smoke, "documents")
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    docs.write.parquet(a_path)
    docs.select(F.col("doc_id").alias("k"), "lang").write.parquet(b_path)
    a = spark.read.parquet(a_path)
    b = spark.read.parquet(b_path).filter(F.col("lang") == "en")

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        pruned = a.join(b, a.doc_id == b.k)
        assert "might_contain" in _plan(pruned)
        got = sorted(r["doc_id"] for r in pruned.select(a.doc_id).collect())
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    want = sorted(
        r["doc_id"]
        for r in a.join(b, a.doc_id == b.k).select(a.doc_id).collect()
    )
    assert got == want


def test_aqe_splits_skewed_join_partitions(spark):
    """The engine's skew story is two-tier: AQE's OptimizeSkewedJoin
    splits a hot key's oversized partition at runtime (this test — the
    zero-code-change path), and operators/skew.py salting is the manual
    form for shapes AQE won't touch. Fixture sizes sit under the
    default skew thresholds, so the test lowers them over a synthetic
    hot-key join (90% of rows on one key, incompressible payload
    carried THROUGH the shuffle — a pruned-away payload hides the
    skew) and asserts the final adaptive plan marks the join skew=true
    while returning every row."""
    pad = F.concat(
        *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i))))
            for i in range(4)
        ]
    )
    fact = spark.range(500_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        pad.alias("pad"),
    )
    other = spark.range(1000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
    )
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        slim = fact.join(other, "k").select(
            "k", "w", F.substring("pad", 1, 2).alias("p2")
        )
        rows = slim.collect()
        plan = _plan(slim)
        assert "skew=true" in plan
        assert len(rows) == 500_000
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_dynamic_partition_pruning_on_lake_layout(spark, sf_smoke, tmp_path):
    """The engine's Hive-partitioned lake layout (io.write_partitioned's
    year/ticker scheme) must qualify for dynamic partition pruning: a
    fact ⋈ filtered-dim join on the partition column gets a
    DynamicPruning subquery on the fact scan, so only the dim-selected
    partitions' FILES are read — at 100 TB the difference between
    scanning one year and scanning the lake. (Static pruning covers
    literal filters; DPP covers the join-derived ones.)"""
    ev = load_table(spark, sf_smoke, "events")
    fact_path = str(tmp_path / "fact")
    ev.withColumn("yr", F.year("ts")).write.partitionBy("yr").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    years = [r["yr"] for r in fact.select("yr").distinct().collect()]
    dim = spark.createDataFrame(
        [(y, "keep" if y == min(years) else "drop") for y in years],
        "yr int, tag string",
    )
    j = fact.join(dim.filter(F.col("tag") == "keep"), "yr")
    assert "dynamicpruning" in _plan(j).lower()
    want = fact.filter(F.col("yr") == min(years)).count()
    assert j.count() == want


def test_composed_pipelines_have_no_nested_loop_joins(spark, sf_smoke):
    """x41/x46/x47 compose many joins (pair gen, cluster re-attach,
    split key, full-outer diff) — none may degenerate to a cartesian /
    broadcast-nested-loop join (the deliberate O(n²) surface lives only
    in the quarantined exact-oracle pair generators' blocked
    equality-join form)."""
    qs = all_queries()
    # x46 contains exactly ONE BroadcastNestedLoopJoin by design: the
    # temperature stage's 1-row n_min scalar rides a broadcast
    # crossJoin, and a conditionless 1-row cross IS a BNLJ — bounded by
    # construction, same as x33's n_docs. Anything beyond that count is
    # a real degeneration.
    for name, bnlj_allowed in (
        ("x41_leakage_safe_split", 0),
        ("x46_curation_pipeline", 1),
        ("x48_curation_pipeline_lsh", 1),  # same n_min scalar cross
        ("x47_corpus_diff", 0),
    ):
        plan = _plan(qs[name](spark, sf_smoke))
        assert "CartesianProduct" not in plan, name
        got = plan.count("BroadcastNestedLoopJoin")
        assert got <= bnlj_allowed, (name, got)

def test_bucketed_join_has_zero_exchanges(spark, sf_smoke):
    """b11: both sides bucketed on the join key -> the SortMergeJoin
    AND the downstream group-by run with ZERO exchanges (bucket
    distribution on o_orderkey satisfies the agg's clustering on
    (o_orderkey, o_custkey) too). The write-once-join-forever
    contract bucketing exists for."""
    plan = _plan(all_queries()["b11_bucketed_colocated_join"](spark, sf_smoke))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:1500]


def test_observed_audit_single_scan_with_collect_metrics(spark, sf_smoke):
    """k5's claim is structural: the audit must RIDE the consuming job,
    not add a pass. The observed frame's physical plan carries a
    CollectMetrics node and exactly ONE scan of the events table — the
    metrics are accumulator-style, computed by the same tasks that
    produce the output."""
    from stock_market_etl_spark.quality import observe_audit

    ev = load_table(spark, sf_smoke, "events").select("user_id", "value", "ts")
    observed, _ = observe_audit(ev, keys=("user_id",), watermark_col="ts")
    plan = _plan(observed)
    assert "CollectMetrics" in plan
    assert plan.count("Scan parquet") == 1


def test_clustered_scan_pushes_ts_range_to_parquet(spark, sf_smoke):
    """b12's pruning path is only real if the ts range reaches the
    parquet reader as PushedFilters — against the clustered layout's
    narrow footer bands those filters skip whole row groups before
    decode. (Footer-band disjointness itself is asserted in
    tests/test_sinks.py.)"""
    df = all_queries()["b12_clustered_scan_prune"](spark, sf_smoke)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(ts" in plan and "LessThan(ts" in plan


def test_gopher_rules_zero_shuffle(spark, sf_smoke):
    """x51 is a pure per-row scan op — its plan must contain NO
    Exchange at all (embarrassingly parallel at 100 TB) and prune the
    documents scan to the two columns it reads."""
    df = all_queries()["x51_gopher_rules"](spark, sf_smoke)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "n_chars" not in plan  # column pruning held


def test_rsi_and_ema_single_exchange(spark, sf_smoke):
    """f9's two window specs and f10's ten lags all share the one
    (user_id) partitioning — each query must compile to exactly one
    hash exchange, the flagship's plan shape."""
    for name in (
        "f9_rsi",
        "f10_ema",
        "f11_sliding_distinct",
        "f12_drawdown",
        "f13_bollinger",
        "f14_vwap",
    ):
        df = all_queries()[name](spark, sf_smoke)
        plan = _plan(df)
        assert plan.count("Exchange hashpartitioning") == 1, name


def test_repetition_metrics_single_text_exchange(spark, sf_smoke):
    """x56's only shuffle must be the doc-grain TEXT repartition below
    the gram explode, PINNED at full width (REPARTITION_BY_NUM, r16 —
    AQE's byte-based coalescing must never serialize the ~19× gram
    fan-out under it): HashPartitioning(doc_id) satisfies every
    doc-keyed groupBy above it, so the exploded gram stream (~19×
    corpus bytes; measured 92.8 MB vs 5.9 MB at sf0.1) never hits an
    exchange. A second hash exchange appearing here means an
    aggregation stopped reusing the doc partitioning; the tag
    reverting to REPARTITION_BY_COL means the exchange became
    coalescible again (the r15 2-task collapse)."""
    df = all_queries()["x56_gopher_repetition"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("REPARTITION_BY_NUM") == 1, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_funnel_single_exchange_no_self_join(spark, sf_smoke):
    """e17's strict ordered funnel must be the one-exchange window
    form: both running-min passes and the per-user flag agg share the
    user_id hash partitioning (the naive per-stage self-join would show
    3 scans + joins here)."""
    df = all_queries()["e17_funnel_stages"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Join" not in plan  # running-min funnel, not self-joins
    assert plan.count("Scan parquet") == 1


def test_retention_two_exchanges(spark, sf_smoke):
    """e18 folds cohort assignment and the active-day set into ONE
    user-keyed agg, then rolls up to (cohort, offset): exactly two
    hash exchanges, and the events fact is scanned once."""
    df = all_queries()["e18_retention_cohorts"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    assert plan.count("Scan parquet") == 1


def test_interval_overlap_join_is_binned_equality(spark, sf_smoke):
    """d11's interval-overlap join must compile to a bin-equality join
    (shuffle-partitionable), never the cartesian the naive
    `a.start <= b.end AND b.start <= a.end` self-join plans as."""
    plan = _plan(all_queries()["d11_interval_overlap_pairs"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_release_drift_single_scan(spark, sf_smoke):
    """k6 compares two releases with ONE conditional-agg scan of the
    corpus — no self-join of release slices: one parquet scan, one
    hash exchange (the per-source agg; the share window's
    SinglePartition exchange sits on the dims-sized aggregate), and
    the unread lang column pruned out of the scan."""
    df = all_queries()["k6_release_drift_audit"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "lang" not in plan  # column pruning held


def test_pagerank_iteration_no_cartesian(spark):
    """pagerank's per-iteration update joins node-grain ranks and
    folds the dangling mass in as a broadcast 1-row aggregate — the
    iteration plan (checkpoint=False exposes it) may never degrade to
    a cartesian product, and the production form returns
    checkpoint-truncated ranks (constant plan size per round)."""
    from stock_market_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (1, 4, 1.0)],
        "src int, dst int, w double",
    )
    plan = _plan(
        pagerank(edges, iterations=1, weight_col="w", checkpoint=False)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # dangling mass rides broadcast

    final = _plan(pagerank(edges, iterations=2, weight_col="w"))
    assert "Scan ExistingRDD" in final  # truncated lineage


def test_cogrouped_map_engages_cogroup_node(spark, sf_smoke):
    """m7 must plan the real cogrouped-map node (not decay to a join),
    and both sides' payload columns must survive the self-cogroup
    attribute dedup (the alias workaround documented in the query —
    without it the right frame arrives key-only and the query
    crashes)."""
    df = all_queries()["m7_cogrouped_map"](spark, sf_smoke)
    plan = _plan(df)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "rvalue" in plan


def test_asof_nearest_single_exchange(spark, sf_smoke):
    """d13's two direction passes (opposite sort orders) must share
    ONE user_id hash exchange — the whole nearest as-of costs one
    shuffle plus two sorts, never a range join or cartesian."""
    df = all_queries()["d13_asof_nearest"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_epoch_repeat_zero_shuffle(spark, sf_smoke):
    """x54's repeat-factor materialization is scan-local (literal
    when-chain + own-id hash + explode) — the plan must contain NO
    Exchange; the shuffle belongs to downstream consumers (x27/x44)."""
    df = all_queries()["x54_epoch_repeat"](spark, sf_smoke)
    plan = _plan(df)
    assert "Exchange" not in plan


def test_zorder_scan_pushes_box_predicate(spark, sf_smoke):
    """b13's box read must reach the parquet scan as pushed filters on
    BOTH dimensions — the stats the Z-order footers make skippable.
    (Formatted explain: the 6-filter list overflows toString's field
    truncation.)"""
    df = all_queries()["b13_zorder_scan_prune"](spark, sf_smoke)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(user_id" in plan
    assert "LessThanOrEqual(user_id" in plan
    assert "GreaterThanOrEqual(ts" in plan and "LessThan(ts" in plan


def test_salted_join_spreads_key(spark, sf_smoke):
    """d14's salted join must actually engage the salt mechanism: the
    light side fans out through an explode (Generate) and the shuffle
    join keys on (user_id, __salt), so no reducer owns a whole hot
    key."""
    df = all_queries()["d14_salted_join"](spark, sf_smoke)
    plan = _plan(df)
    assert "Generate explode" in plan
    assert "__salt" in plan
    assert "CartesianProduct" not in plan


def test_dsir_weight_join_broadcasts(spark, sf_smoke):
    """x58's per-bucket weight table is bounded (≤ 4096 rows) by
    construction, so the join back onto the gram stream must always be
    a broadcast — a SortMergeJoin here would shuffle the whole gram
    stream by bucket at corpus scale. Two hash exchanges total: the
    bucket-count aggregation and the final doc-grain sum."""
    plan = _plan(all_queries()["x58_dsir_importance"](spark, sf_smoke))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rollup_merge_shuffles_partials_only(spark, sf_smoke):
    """e19's continuous-aggregate rollup: both aggregations must run
    with map-side partial aggregation, so the first exchange carries
    hourly partials (not raw events) and the second carries the hourly
    grain itself — two hash exchanges, no joins."""
    plan = _plan(all_queries()["e19_hourly_rollup_merge"](spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    # partial + final HashAggregate pairs at each grain
    assert plan.count("HashAggregate") >= 4


def test_image_near_dup_decode_runs_once(spark, sf_smoke):
    """x61's band self-join must read the hashed table from cache on
    both sides (InMemoryTableScan) — without the persist, Catalyst
    re-executes the Arrow decode+hash MapInPandas subtree per join
    side (measured 1.94 s -> 0.59 s at sf0.1)."""
    df = all_queries()["x61_image_near_dup"](spark, sf_smoke)
    plan = _plan(df)
    assert "InMemoryTableScan" in plan, plan[:2000]


def test_winnow_fingerprints_zero_exchange(spark, sf_smoke):
    """x64's winnowing selection (gram hashing, window slide, per-doc
    dedup) is one Arrow-batched Python stage over the scan — the only
    Exchange allowed is parallelism.spread's round-robin of the pruned
    id+text projection (a no-op at scale); no hash-partitioned shuffle
    belongs to the operator itself — that cost is its consumers'
    (x65)."""
    plan = _plan(all_queries()["x64_winnow_fingerprints"](spark, sf_smoke))
    assert "hashpartitioning" not in plan.lower()
    assert "MapInPandas" in plan


def test_winnow_near_dup_pairs_on_binary_digests(spark, sf_smoke):
    """x65's pair stage must key on the 8-byte BIGINT fingerprint
    (never hex strings, never text) and engage no cartesian product;
    the stop-fingerprint ban is a left-anti join and the fingerprint
    diamond (ban set + both join sides) reads one persisted
    materialization, not three MapInPandas re-executions (the explain
    string repeats the cached child plan per consumer — presence of
    InMemoryTableScan is the assertable signal, x61 precedent)."""
    df = all_queries()["x65_winnow_near_dup"](spark, sf_smoke)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "InMemoryTableScan" in plan


def test_ohlc_resample_single_partial_agg_exchange(spark, sf_smoke):
    """f15's tick→bar downsample must be ONE partially-aggregable
    groupBy: a single hash exchange carrying (user, day) bar partials
    (min_by/max_by combine map-side) — never a Window, never the raw
    ticks re-sorted."""
    plan = _plan(all_queries()["f15_ohlc_resample"](spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Window" not in plan
    # partial + final aggregate pair around the one exchange
    assert plan.count("Aggregate") >= 2


def test_interpolation_join_single_exchange(spark, sf_smoke):
    """d15's two bracket passes (opposite sort orders) must share ONE
    user_id hash exchange like d13 — one shuffle plus two sorts, no
    range join, no cartesian."""
    df = all_queries()["d15_interpolation_join"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_atr_two_grain_exchanges(spark, sf_smoke):
    """f16 composes f15's partial-agg bar exchange with ONE bar-grain
    window re-key: exactly two hash exchanges, the second carrying bar
    rows (keys × days), never ticks — and both window passes (lag TR,
    rolling ATR) share the second."""
    plan = _plan(all_queries()["f16_atr"](spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_point_in_time_join_is_asof_shaped(spark, sf_smoke):
    """d16's PIT join must run as the as-of composition (one user_id
    hash exchange over the union, ignore-nulls window fill) — never
    the naive interval range join (BNLJ/cartesian) its oracle spells
    out."""
    df = all_queries()["d16_point_in_time_join"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gap_fill_exchanges_are_bar_grain(spark, sf_smoke):
    """f17's only tick-grain exchange is the bar partial-agg; the
    spine is a narrow Generate (explode) off the keys-sized span
    table, and everything downstream re-keys bar-grain rows — no
    cartesian, no BNLJ anywhere."""
    plan = _plan(all_queries()["f17_gap_fill"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan
    assert plan.count("Exchange hashpartitioning") <= 5


def test_arrow_optimized_udf_uses_arrow_transport(spark, sf_smoke):
    """m8's @udf(useArrow=True) must plan as ArrowEvalPython — the
    Arrow-batched transport is the entire point; BatchEvalPython
    (pickled rows) appearing instead means the option regressed."""
    plan = _plan(all_queries()["m8_arrow_optimized_udf"](spark, sf_smoke))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_market_pipeline_composes_for_free(spark, sf_smoke):
    """f18 (returns + TR/ATR + Bollinger fused): the WHOLE indicator
    stack must cost exactly f16's two hash exchanges — one tick
    partial-agg, one bar-grain window re-key shared by the lag pass
    and both rolling frames. A third exchange means an indicator
    broke the shared partitioning."""
    plan = _plan(all_queries()["f18_market_pipeline"](spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(spark, sf_smoke):
    """x68's top-k must compile to TakeOrderedAndProject (per-partition
    heaps) — a global Sort before the limit means the corpus is being
    totally ordered to pick 100 rows."""
    plan = _plan(all_queries()["x68_weighted_sample"](spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_fuzzy_pairs_no_variant_self_join(spark, sf_smoke):
    """x70/x69's candidate generation (r09 rework + r10 ADVICE fix):
    pairs unfold SCAN-LOCALLY from a bounded variant-grain
    collect_list, and the plan must NOT contain the pre-r09 shape's
    signature: an INNER join keyed on the variant column (the a⋈b
    bucket self-join that moved the whole stream through a third
    exchange). The only __v-keyed join allowed is the stop-variant
    LeftAnti, whose right side is now a COLLECTED broadcast list (r10:
    the guard job materializes the ban set and releases the histogram
    cache eagerly) — so no InMemoryTableScan may appear either: its
    presence would mean the persisted guard histogram leaked back into
    the main plan. On this sparse fixture the ban set is empty, so
    Catalyst's empty-relation propagation may elide the anti-join
    entirely — the test asserts the forbidden shapes, not the
    optimizer's elision. The byte-level contract (one full-stream
    exchange) is pinned in tests/test_bench_contract.py."""
    import re

    plan = _plan(all_queries()["x70_fuzzy_sparse_pairs"](spark, sf_smoke))
    assert "collect_list" in plan
    assert "InMemoryTableScan" not in plan  # guard cache released
    inner_on_variant = re.search(
        r"Join \[__v#\d+\], \[__v#\d+\], Inner", plan
    )
    assert not inner_on_variant, inner_on_variant.group(0)


def test_lake_lifecycle_reads_are_manifest_scoped(spark, sf_smoke):
    """b22's four read points must each scan ONLY their manifest's
    file list: exactly four parquet scans, one per read point — a
    fifth scan (or a directory-glob over the table root) would mean a
    read point re-derives from the directory instead of its manifest.
    Content-level manifest scoping (compacted reads never touch old
    files) is pinned in tests/test_sinks.py."""
    df = all_queries()["b22_lake_lifecycle"](spark, sf_smoke)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 4


def test_snapshot_skipping_read_scans_only_matching_files(
    spark, sf_smoke
):
    """b23's read point must scan ONLY the files whose manifest bands
    intersect the predicate — the mid-quartile range lives in exactly
    one of four range-sliced appends, so the scan's file set must be a
    STRICT subset of the manifest (file-grain skipping happened before
    planning), every scanned file must come from the v2 slice's data
    directory, and the filter must still be pushed into the surviving
    scan (row-group skipping composes on top)."""
    df = all_queries()["b23_snapshot_skipping_read"](spark, sf_smoke)
    files = df.inputFiles()
    assert files, "scan resolved no files"
    dirs = {f.rsplit("/", 2)[-2] for f in files}
    # all surviving files come from ONE commit's data dir (slice 2)
    assert len(dirs) == 1 and next(iter(dirs)).startswith("v2-"), dirs
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(event_id" in plan or "GreaterThan(event_id" in plan


def test_keep_one_spans_same_shape_as_flagger(spark, sf_smoke):
    """x76 must keep x71/x72's plan economy: no cartesian anywhere,
    the flag aggregate's (digest-grain) exchanges bounded at three
    (flag distinct+agg, islands window, cut's span-list agg), and the
    shrunk flag/span sides joined by BROADCAST — the keeper column
    must not force the window stream through a sort-merge join."""
    plan = _plan(
        all_queries()["x76_substring_dedup_keep_one"](spark, sf_smoke)
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_containment_pairs_grams_once_no_cartesian(spark, sf_smoke):
    """x77's gram arrays must materialize ONCE (persist feeding the
    candidate stream AND both re-attach sides — InMemoryTableScan is
    the signal, the x61/x65 precedent) with no cartesian product;
    candidates come from the gram-equality join, pairs re-attach by
    id."""
    plan = _plan(all_queries()["x77_containment_pairs"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_jdbc_scan_partition_parallel(spark, sf_smoke):
    """a2's 100 TB shape: the JDBC read must split into N parallel
    range queries — one connection streaming the whole table is the
    single-task scan this operator exists to avoid. The relation must
    report numPartitions=4 and the RDD must materialize 4 partitions
    (Derby here; production swaps URL/driver only)."""
    df = all_queries()["a2_jdbc_scan"](spark, sf_smoke)
    assert df.rdd.getNumPartitions() == 4
    plan = _plan(df)
    assert "JDBCRelation" in plan
    assert "numPartitions=4" in plan


def test_window_index_build_shuffles_digests_only(spark, sf_smoke):
    """b25's build half (corpus_window_hashes): exchanges are digest
    grain only — the (hash, id) distinct plus the hash-grain count
    make at most TWO hash exchanges, keyed on the 16-byte digest /
    8-byte id, never on text. At 100 TB the index build's shuffle is
    a fraction of corpus bytes or it isn't an index."""
    import re

    from stock_market_etl_spark.operators.dedup import (
        corpus_window_hashes,
    )

    docs = load_table(spark, sf_smoke, "documents")
    plan = _plan(corpus_window_hashes(docs, k=8))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_window_index_merge_shuffles_digests_only(spark, sf_smoke, tmp_path):
    """b26's release step (merge_window_index): folding release N+1
    into the release-N artifact costs the NEW docs' window pass plus
    ONE digest-grain map-side-combined sum — the indexed corpus
    contributes only its (16 B, 8 B) rows through the union, and no
    exchange carries text. At 100 TB a release merge that re-shuffles
    corpus text isn't an increment-cost release step."""
    import re

    from stock_market_etl_spark.operators.dedup import (
        merge_window_index,
        read_window_index,
        write_window_index,
    )

    docs = load_table(spark, sf_smoke, "documents")
    r1 = docs.filter(F.col("doc_id") % 10 == 8)
    r2 = docs.filter(F.col("doc_id") % 10 == 9)
    path = str(tmp_path / "idx_r1")
    write_window_index(r1, path, k=8)
    idx, built_k = read_window_index(spark, path)
    plan = _plan(merge_window_index(idx, r2, built_k, k=built_k))
    assert "CartesianProduct" not in plan
    # new docs' (hash, id) distinct + the unioned hash-grain sum:
    # at most three digest/id-keyed exchanges, never text
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:2000]
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)
    # partial aggregation before the final hash-grain sum (map-side
    # combine): the sum appears as a two-phase HashAggregate pair
    assert plan.count("HashAggregate") >= 2


def test_embedding_index_merge_is_exchange_free(
    spark, sf_smoke, tmp_path
):
    """b27's release step (merge_embedding_index): folding eval
    release N+1 into the release-N artifact is a plain union — the
    indexed releases contribute their STORED (id, vector, norm)
    parquet rows (never re-normalizing), the increment pays one
    cast+norm projection, and no HASH exchange moves at all (the one
    allowed exchange is `spread`'s round-robin repartition of the
    INCREMENT — the documented parallelism seam every
    `_normed_vectors` caller pays; it never touches the stored
    side). At 100 TB an embedding-release merge that shuffles or
    re-derives the indexed vectors isn't an increment-cost release
    step."""
    from stock_market_etl_spark.operators.similarity import (
        merge_embedding_index,
        read_embedding_index,
        write_embedding_index,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    r1 = emb.filter(F.col("vec_id") % 10 == 0)
    r2 = emb.filter(F.col("vec_id") % 10 == 5)
    path = str(tmp_path / "emb_idx_r1")
    write_embedding_index(r1, path, dim=64)
    idx, built_dim = read_embedding_index(spark, path)
    plan = _plan(merge_embedding_index(idx, r2, built_dim))
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert plan.count("Exchange") <= 1, plan[:2000]
    assert "CartesianProduct" not in plan
    # the stored side is a bare parquet scan of the artifact whose
    # ReadSchema already carries the precomputed norm — norms come
    # from the file, not a recomputation (plan paths truncate, so
    # pin the schema rather than the directory name)
    assert "__n:double" in plan, plan[:2000]


def test_embedding_ann_artifact_probe_plan(spark, sf_smoke, tmp_path):
    """b28's probe (embedding_contamination_ann_incremental): the
    eval side enters as TWO bare parquet scans (stored buckets +
    stored vectors/norms) with zero eval-side compute — no
    ArrowEvalPython feeds from the artifact scans (the train side
    pays the only bucketing matmul), the candidate join is EQUALITY
    on (table, bucket) (never a cartesian), and no exchange carries
    an embedding array: candidates move as id rows, vectors
    re-attach by id after the pair dedup. This is the shape where
    probe traffic scales with the BATCH, not the eval corpus."""
    import re

    from stock_market_etl_spark.operators.similarity import (
        _checked_unit_vectors,
        embedding_contamination_ann_incremental,
        merge_lsh_buckets,
        publish_lsh_buckets,
        read_embedding_index,
        read_lsh_buckets,
        write_embedding_index,
        write_lsh_buckets,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    train = emb.filter(F.col("vec_id") % 5 != 0)
    r1 = emb.filter(F.col("vec_id") % 5 == 0)
    v1 = str(tmp_path / "vec")
    write_embedding_index(r1, v1, dim=64)
    idx, built_dim = read_embedding_index(spark, v1)
    b1 = str(tmp_path / "bkt")
    write_lsh_buckets(idx, b1, built_dim, n_planes=4, n_tables=16)
    bk, params = read_lsh_buckets(spark, b1)
    plan = _plan(
        embedding_contamination_ann_incremental(
            idx, bk, train, params, threshold=0.4
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate join keys on (table, bucket) equality
    assert re.search(r"lsh_table.*lsh_bucket|__tb.*__bb", plan), plan[:1500]
    # no exchange moves an embedding/vector array — ids and buckets only
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "__v" not in m.group(1), m.group(0)
        assert "__u" not in m.group(1), m.group(0)
        assert "embedding" not in m.group(1), m.group(0)


def test_stream_substring_gate_batch_plan(spark, sf_smoke, tmp_path):
    """n19's per-batch body, pinned via its documented
    single-micro-batch twin (the n9 move): landed-id anti-join +
    index probe + span cut compose with NO cartesian and the
    batch-sized sides joined by BROADCAST — each micro-batch pays
    batch-sized work plus one hash-grain probe of the b25 artifact,
    regardless of corpus size."""
    from stock_market_etl_spark.operators.dedup import (
        cut_spans,
        exact_substring_spans_incremental,
        read_window_index,
        write_window_index,
    )

    docs = load_table(spark, sf_smoke, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    path = str(tmp_path / "idx")
    write_window_index(corpus, path, k=8)
    idx, built_k = read_window_index(spark, path)
    landed = batch.limit(0).select("doc_id")
    fresh = batch.join(landed, "doc_id", "left_anti")
    spans = exact_substring_spans_incremental(
        None, fresh, k=built_k, corpus_index=idx, built_k=built_k
    )
    out = cut_spans(fresh, spans, text_col="text", id_col="doc_id")
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hard_negatives_single_token_pass(spark, sf_smoke):
    """x78's 100 TB stance: the (doc, term) tf table materializes
    ONCE (persist — df-counts and the scored stream both read the
    InMemoryTableScan, never a second corpus explode), the corpus
    stats ride ONE bounded scalar-row BNLJ, per-doc length arrives
    through the tf aggregate (no doc-grain length join), and the
    per-query ranking never falls into a cartesian or sort-merge
    join."""
    plan = _plan(all_queries()["x78_hard_negative_mining"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "WindowGroupLimit" in plan  # rank-k prunes before shuffling


def test_curation_lineage_digest_grain_only(spark, sf_smoke):
    """x79's exchanges are digest grain only: ONE hash exchange (the
    keeper min-id aggregate on the 32-byte content digest) keyed on
    the digest, never text, and the keeper table joins back via
    broadcast/hash join — no cartesian, no text shuffle."""
    import re

    plan = _plan(all_queries()["x79_curation_lineage"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_psi_drift_histogram_grain_only(spark, sf_smoke):
    """x80's exchanges carry bin histograms, never documents: text is
    pruned at the scan (only source/score/flags project out), the
    (source, bin) aggregate and the group totals are the only hash
    exchanges (≤3 with the join), and nothing is cartesian."""
    import re

    plan = _plan(all_queries()["x80_score_drift_psi"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:2000]
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_fim_transform_zero_shuffle(spark, sf_smoke):
    """x81 is a map-only pass: tokenize, integer-hash cuts, segment
    filters, and the rejoin are all array expressions inside the scan
    stage — NO exchange of any kind (the x36 chunking economy)."""
    plan = _plan(all_queries()["x81_fim_transform"](spark, sf_smoke))
    assert "Exchange" not in plan, plan[:1500]


def test_bitext_margin_pair_table_is_ids_and_cos_only(spark, sf_smoke):
    """x82's exact form materializes the pair table ONCE (persist —
    both background aggregates and the scoring join read the
    InMemoryTableScan) and every hash exchange above it is keyed on
    ids and carries (id, cos) rows — vectors never re-cross an
    exchange after the cross join."""
    import re

    plan = _plan(all_queries()["x82_bitext_margin_pairs"](spark, sf_smoke))
    assert "InMemoryTableScan" in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "__v" not in m.group(1) and "embedding" not in m.group(1)
