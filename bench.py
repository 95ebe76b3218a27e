"""Benchmark harness (SURVEY §6 / BASELINE.md BENCH set).

Times the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the ``noop`` sink (full physical
execution, no driver-side collect — the same discipline the engine keeps
at 100 TB). One warm-up query runs first so JVM/codegen startup is not
attributed to the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: BENCH set (BASELINE.md): metrics pipeline, the dashboard
#: representative, one join-heavy and one agg-heavy TPC-H-style query.
#: r13 retirement (the documented headline policy's first firing —
#: BASELINE.md r13 note): q_final_returns, q_relative_returns,
#: q_latest_snapshot and q_top_movers retired r13, covered by
#: q_compute_trends (the dashboard stack's shared scan + window
#: front) and their every-round driver correctness proofs; their
#: BASELINE rows carry the retirement note.
BENCH_QUERIES = [
    "f1_f2_metrics_pipeline",
    "q_compute_trends",
    "d9_star_join_revenue",
    "e14_avg_min_max_count",
    # training-data extension ops (first-class at 100 TB): text
    # tokenization, content-hash dedup, brute-force cosine top-k.
    "x1_token_count",
    "x6_exact_dedup",
    "x8_cosine_topk",
    # the scale paths themselves: banded MinHash LSH near-dup,
    # LSH-blocked embedding near-dup, binned range join.
    "x10_minhash_lsh_pairs",
    "x17_embedding_near_dup_lsh",
    "d10_range_join_pairs",
    # dataset-build ops: two-phase prefix-sum packing, train/eval
    # n-gram contamination audit, and the composed end-to-end build.
    "x24_sequence_pack",
    "x26_contamination",
    "x28_dataset_build",
    # r04 additions: keyword extraction / retrieval, audio decode
    # round-trip, and LSH-sourced near-dup clustering (the scale path;
    # the exact x31 twin is quadratic-by-design and stays oracle-only).
    "x33_tfidf_topk",
    "x34_bm25_topk",
    "x32_audio_decode_meta",
    "x35_dup_clusters_lsh",
    # r05 additions: temperature mixture (data-derived keep rates),
    # deterministic shard layout (two-phase rank), corpus curation
    # report (grouped agg + exact percentiles). x41 stays out like x31:
    # its exact-Jaccard pair source is quadratic-by-design (the oracle
    # form); its scale path is the same LSH source x35 already times.
    "x42_temperature_mix",
    "x44_shard_assignment",
    "x45_corpus_report",
    # r06 addition: the composed curation flagship v2 via its LSH pair
    # source — the 100 TB scale path. The exact twin x46 stays
    # oracle-only exactly like x31: its blocked-Jaccard pair source is
    # quadratic-by-design (measured 28.6 s at sf0.1 vs 3.7 s here —
    # the crossover the x31/x35 split documents), and its correctness
    # duty is the DuckDB hash oracle, not the clock.
    "x48_curation_pipeline_lsh",
    # r06-new operators: span-grain paragraph dedup (text never in the
    # dedup exchanges) and session transcript assembly (one event
    # exchange, order rides inside aggregated structs).
    "x49_paragraph_dedup",
    "x50_session_transcripts",
    # r07 addition: x50's streaming twin timed as a REAL drain — the
    # catalog callable runs the availableNow session_window stream to
    # a memory sink internally, so its timing is the end-to-end drain
    # at sf0.1 events (the noop write after it re-reads the drained
    # table, trivially). Its shuffle_mb row reflects only that final
    # re-read, not the drain — state-store traffic isn't an exchange.
    "n12_stream_session_transcripts",
    # r07 additions: Gopher hard quality gates (zero-shuffle scan op,
    # the corpus build's first stage) and block-grain decontamination
    # (the linear-cost tier ahead of x26's overlapping grams).
    "x51_gopher_rules",
    "x52_paragraph_contamination",
    # r07 additions: event-sequence analytics — the one-exchange
    # running-min funnel (no self-joins) and the two-exchange cohort
    # retention matrix (user-keyed agg carries cohort + day set).
    "e17_funnel_stages",
    "e18_retention_cohorts",
    # r07 addition: interval-overlap join — sessions exploded onto
    # time bins, bin-equality join, anchor-bin dedup (never cartesian).
    "d11_interval_overlap_pairs",
    # r07 addition: nearest as-of join — both direction passes over
    # ONE key exchange (two sorts, shared partitioning).
    "d13_asof_nearest",
    # r08 additions: DSIR importance weights (bounded 4096-bucket
    # model, broadcast weight join, one doc-grain exchange) and CCNet
    # perplexity tiers (x37's LM score + a language-keyed ntile).
    "x58_dsir_importance",
    "x59_perplexity_buckets",
    # r08 addition: rollup-from-partials — daily stats merged from the
    # hourly continuous aggregate, sharing its user_id partitioning.
    "e19_hourly_rollup_merge",
    # r08 addition: the custom stateful operator timed as a REAL
    # applyInPandasWithState drain (same measurement caveat as n12:
    # state-store traffic isn't an exchange).
    "n15_stateful_running_totals",
    # r08 addition: C4 boilerplate removal — every copy of a
    # cross-doc repeated block dropped; the ban set is a hash-grain
    # count-distinct, broadcast into the anti-join (text never enters
    # a corpus-wide exchange, same economy as x49).
    "x60_boilerplate_prune",
    # r08 additions: Gopher n-gram repetition gates (single doc-grain
    # TEXT exchange — the gram stream at ~19× corpus bytes never
    # shuffles, plan-asserted) and the composed Gopher flagship v3
    # (word gates AND repetition gates → paragraph dedup → hash
    # split, one fused plan).
    "x56_gopher_repetition",
    "x57_gopher_pipeline",
    # late-r08 additions: market beta/correlation (the only
    # event-volume exchange carries map-side (user, day) partials;
    # the |days|-row market frame broadcasts) and visual near-dup via
    # banded average-hash (Arrow-batched BMP decode+hash, then
    # id+hash-only band-bucket self-join — payload bytes never enter
    # an exchange).
    "e21_market_beta",
    "x61_image_near_dup",
    # late-r08 additions: kNN label propagation via its LSH candidate
    # source (the 100 TB form — x62's exact quadratic twin stays
    # oracle-only like x31/x46; candidates shuffle as id pairs,
    # vectors re-attach by id) and the winnowing fingerprint tier —
    # x64 is the Arrow-batched selection stage itself (hash+winnow in
    # one Python stage, 8-byte BIGINT fingerprints), x65 the
    # deterministic near-dup pairs over it (persisted fingerprint
    # diamond; ban set anti-joined; capped bucket self-join).
    "x63_knn_label_propagation_lsh",
    "x64_winnow_fingerprints",
    "x65_winnow_near_dup",
    # late-r08 additions: OHLC tick→bar resample (one partial-agg
    # exchange of (user, day) bar rows, never ticks), its streaming
    # twin timed as a REAL availableNow drain (n12/n15 caveat:
    # state-store traffic isn't an exchange), the interpolation as-of
    # join (d13's one-exchange two-sort shape + the micros blend) and
    # quality-aware keep-best dedup via its LSH pair source (the
    # 100 TB form — the exact twin x66 is oracle-only like x31/x46).
    "f15_ohlc_resample",
    "n16_stream_ohlc_bars",
    "d15_interpolation_join",
    "x67_keep_best_dedup_lsh",
    # late-r08 additions: ATR (f15's bar exchange + one bar-grain
    # window re-key — the composed indicator chain) and the
    # point-in-time join (as-of-shaped, one key exchange — the
    # feature-store no-future-leakage join).
    "f16_atr",
    "d16_point_in_time_join",
    # late-r08 addition: calendar densification + forward fill — the
    # bar exchange plus bar-grain spine/join/window only (b17, the
    # dirty-CSV audit, stays out of BENCH like the other b*
    # write-roundtrips — its cost is the write itself).
    "f17_gap_fill",
    # late-r08 addition: the streaming continuous aggregate timed as a
    # REAL foreachBatch drain (partial write + read-side state merge;
    # n12/n15 caveat — state traffic isn't an exchange).
    "n17_stream_agg_partials",
    # late-r08 addition: the composed market flagship — the whole
    # indicator stack (returns + TR/ATR + Bollinger over bars) fused
    # into f16's two exchanges (plan-asserted).
    "f18_market_pipeline",
    # r09 addition: alignment-free exact-substring duplicate spans
    # (Lee et al. suffix-grade dedup as overlapping windows — the
    # honest k-per-token hashing price; only (id, pos, digest) rows
    # move, text never shuffles).
    "x71_substring_dup_spans",
    # r10 addition: the span-CUT consumer — x71's flag pass plus the
    # id-grain span join + scan-local reassembly; the corpus text
    # crosses at most one exchange (the cut join), never a pair
    # stream.
    "x72_substring_dedup_cut",
    # r10 addition: source-reputation gate — one corpus scan folding
    # to a source-grain aggregate; the rank window sorts only the
    # dimension-sized source table.
    "x73_source_reputation_gate",
    # r10 addition: composed curation flagship v4 — source gate
    # (broadcast) → span cut → exact dedup → hash split in one plan;
    # the gate halving the corpus FIRST makes the composed flag/cut
    # cheaper than x72 alone.
    "x75_curation_pipeline_v4",
    # r13 addition: flagship v5 — v4's stack + the decontamination
    # cut vs the frozen eval split (windows on CLEANED text, eval
    # side raw); the eval set contributes only its window-hash set.
    "x87_curation_pipeline_v5",
    # r10 addition: the incremental rung — batch windows vs the
    # corpus (hash, count) index; per-batch cost is the batch's own
    # windows + one hash-grain index join, corpus text never
    # re-hashed when the index is materialized.
    "x74_incremental_substring_spans",
    # r11 addition: the keep-one policy rung — x72's plan with one
    # extra 8-byte min(id) in the flag aggregate and an inner join +
    # scan-local keeper inequality instead of the left_semi.
    "x76_substring_dedup_keep_one",
    # r11 addition: asymmetric containment pairs — 16-byte gram
    # digests through one (digest, id) exchange (hot grams banned),
    # id pairs, two id-grain array re-attach joins; text never
    # shuffles.
    "x77_containment_pairs",
    # r12 addition: batch hard-negative mining (the DPR recipe) — M
    # queries scored in ONE corpus token pass (persisted (doc, term)
    # tf diamond; corpus stats fold into one scalar broadcast, per-doc
    # length rides the tf aggregate — no doc-grain length join) +
    # two-phase per-query top-k, positives dropped broadcast-anti.
    "x78_hard_negative_mining",
    # r12 addition: per-doc drop-reason lineage for the gate → dedup
    # pipeline — digests computed scan-side, ONE digest-grain keeper
    # exchange, text never shuffles.
    "x79_curation_lineage",
    # r13 addition: the ANN tier of bitext mining (x82's x16→x17
    # move) — LSH-bucketed A×B candidates, exact cosine on candidates
    # only, margin tail shared code-for-code with the exact form. The
    # exact A×B twin x82 stays out of BENCH like x16/x31/x46
    # (quadratic-by-design oracle stance). Below-crossover at sf0.1
    # like x17: the fixture's random near-orthogonal vectors make
    # ~64% of pairs LSH candidates at 4 planes/16 tables, a density
    # real embedding manifolds don't have.
    "x83_bitext_margin_pairs_ann",
    # r13 addition: train-test substring decontamination — x72's flag
    # machinery with the presence-in-reference condition (eval index
    # is write-once; train text crosses one exchange in the cut,
    # eval text zero after the index build).
    "x84_substring_decontamination",
    # r13 addition: the ANN tier of semantic contamination — LSH
    # train×eval candidates, exact cosine on candidates, verdict
    # tail shared with the exact x85 (which stays out of BENCH like
    # x16/x31/x46: quadratic-by-design oracle stance).
    "x86_embedding_contamination_lsh",
    # r09 addition: x69's SPARSE operating point (VERDICT r08 task 2)
    # — SymSpell deletion-neighborhood fuzzy join over a structureless
    # md5-name entity catalog with planted typos. x69 itself (the
    # DENSE stress fixture: templated serial names, ~1.87 M TRUE
    # pairs at sf0.1) stays out of BENCH like x31/x46: its output is
    # near-quadratic BY DATA, and its 100×-density safety is the
    # histogram-derived candidate budget guard, not the clock.
    "x70_fuzzy_sparse_pairs",
]


def _headline_val(v: float) -> float | int:
    """Per-query seconds for the HEADLINE line at 2 significant
    figures — sub-second rows keep the 2-decimal resolution the r11
    verdict asked for; multi-second rows drop a noise digit. Full
    3-decimal rep times still ride the detail line. Why: the driver
    records only the last ~2 KB of output and at 63 queries the
    3-decimal headline measured 1905/2000 chars (r11 verdict task 3);
    2 sig figs buys ~90 chars of growth headroom without losing ratio
    signal (worst-case rounding error 2.5%, far below the 2× perf
    gate's resolution). Integral results collapse to int (29.0 → 29)
    for two more chars per big row."""
    if v <= 0:
        return 0.0
    import math

    r = round(v, max(0, 1 - int(math.floor(math.log10(v)))))
    return int(r) if r == int(r) else r


#: Hard bound on the emitted headline line. The driver keeps EXACTLY
#: the last 2000 chars of output; the headline is the last line, so
#: its practical cap is ~1999 — 1950 leaves a 50-char guard band. The
#: contract test asserts the CURRENT headline fits, but that only
#: fires when the test runs; this emit-time refusal fires on every
#: bench run, so a BENCH addition that would truncate the round's
#: recorded headline (the r05 failure) is caught before the driver
#: captures a clipped line (ADVICE r13).
HEADLINE_BUDGET = 1950


def _render_headline(payload: dict) -> str:
    """Serialize the headline line, REFUSING loudly if it exceeds
    HEADLINE_BUDGET — the fix is to retire the cheapest
    composite-covered BENCH rows per the documented policy
    (DRIVER_WINDOW.md r13 note; dashboard rows first, annotated in
    BASELINE.md), never to let the tail silently truncate."""
    line = json.dumps(payload, separators=(",", ":"))
    # strict <, matching the contract test's `len < 1950` exactly —
    # a boundary disagreement would emit green at 1950 chars while
    # CI reads red (review r14)
    if len(line) >= HEADLINE_BUDGET:
        raise SystemExit(
            f"bench headline is {len(line)} chars, reaching the "
            f"{HEADLINE_BUDGET} budget (driver tail capture is "
            "2000) — retire the "
            "cheapest composite-covered BENCH rows per the "
            "DRIVER_WINDOW.md r13 retirement policy and annotate "
            "BASELINE.md before re-running"
        )
    return line


def _prevalidate_headline(names: list, sf_val) -> None:
    """Rehearse the headline at a LOWER-BOUND width before the timing
    loop, so a BENCH addition that cannot possibly fit fails in
    seconds instead of after the full multi-minute run (and after
    skipping spark.stop() — ADVICE r14). Lower bound, not upper: a
    65-row headline fits at real value widths (~1920 chars) while the
    worst-case 2-sig-fig width (6 chars/value) already measures over
    budget, so a pessimistic rehearsal would falsely refuse runs the
    emit guard passes. With every value at its 1-char minimum, a
    rehearsal that STILL overflows proves any real emission must too
    — zero false refusals; marginal cases are still caught by the
    authoritative emit-time check in `_render_headline`."""
    _render_headline(
        {
            "metric": "bench_total_wall",
            "value": 99999.999,
            "unit": "sec",
            "queries": {n: 1 for n in names},
            "sf": sf_val,
        }
    )


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _stage_frontier(spark) -> int:
    """Smallest id past every stage the app has run so far, derived
    from the retained JOB list (JobData records every stage id its
    job owns, including SKIPPED stages that never get a StageData
    entry, and the newest jobs are always retained) — the correct
    cursor seed for a session that may already have evicted its
    oldest stages. jobsList returns newest-first, so scanning a
    handful of head entries bounds the py4j round-trips regardless of
    how many jobs the session has run. Returns 0 on a fresh session."""
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        it = store.jobsList(None).iterator()
        mx = -1
        seen = 0
        while it.hasNext() and seen < 8:
            sit = it.next().stageIds().iterator()
            while sit.hasNext():
                mx = max(mx, int(str(sit.next())))
            seen += 1
        return mx + 1
    except Exception:
        return 0


def _stage_cursor(spark, start: int = 0) -> int:
    """Next unseen stage id — snapshot BEFORE a query so
    `_shuffle_mb_since` can attribute exactly its stages. Derived
    from the retained JOB list (each JobData records every stage id
    its job owns, INCLUDING skipped stages that never get a StageData
    entry — probing ids one-by-one would stop short at the first
    skipped-stage gap and stick there forever). ``start`` floors the
    result so a momentarily-empty job list can't move the cursor
    backwards."""
    return max(start, _stage_frontier(spark))


def _shuffle_mb_since(spark, cursor: int) -> float | None:
    """Total stage-level 'shuffle bytes written' for every stage the
    app ran at or after ``cursor`` — measured evidence for the
    shuffle-economy claims in SCALE.md/PLANS.md.

    Reads per-stage AppStatusStore data (the same numbers the UI REST
    API serves), NOT the SQL execution metric map: the latter loses
    AQE-replanned exchanges (accumulator ids re-register under the new
    query stages and the execution-level map keeps the stale ids —
    observed reading 0.0 for a query whose stages wrote 40 MB) and
    only ever saw the LAST execution, undercounting queries with
    internal bounded collects (density guards, k-means init). Stage
    grain double-counts nothing and misses nothing.

    The scan is bounded by the job-list frontier and tolerates gaps:
    SKIPPED stages (reused exchanges) occupy ids but have no StageData
    entry, so a stop-at-first-missing-id scan silently flatlines at
    the first reuse. Best-effort: py4j drift degrades to None, never
    breaks the bench."""
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        total = 0
        for sid in range(cursor, _stage_frontier(spark)):
            try:
                total += store.lastStageAttempt(sid).shuffleWriteBytes()
            except Exception:
                continue  # skipped or evicted stage: no entry
        return round(total / (1 << 20), 3)
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from stock_market_etl_spark.catalog import all_queries
    from stock_market_etl_spark.session import get_spark

    # Targeted re-measure support (VERDICT r09 task 5 and the like):
    # SPARK_GRAFT_BENCH_ONLY="e19_hourly_rollup_merge,x26_contamination"
    # restricts the run to the named queries. The emitted JSON is then
    # a partial detail line for quiet-host comparisons — the driver's
    # per-round record always runs unfiltered.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    global BENCH_QUERIES
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in BENCH_QUERIES]
        if unknown:
            raise SystemExit(f"not bench queries: {unknown}")
        BENCH_QUERIES = wanted

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # fail an over-budget headline NOW — pure Python, BEFORE the JVM
    # starts, so the refusal is near-instant and leaves no un-stopped
    # session behind (review r15 closing the ADVICE r14 residue)
    _prevalidate_headline(BENCH_QUERIES, sf_val)

    # 16g heap: the timed pass runs 17 queries with persist() diamonds
    # in one JVM; at 8g the old-gen fills and multi-second full-GC
    # pauses land inside individual timings (observed 4× blips on
    # steady-state 0.5 s queries). Overridable via SPARK_DRIVER_MEMORY.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # Warm-up pass: run every bench query once so the timed pass
    # measures steady-state execution (whole-stage codegen compilation,
    # file listing, and Arrow/JVM init are one-time costs that would
    # otherwise dominate sub-second queries at this scale factor).
    for name in BENCH_QUERIES:
        _force(queries[name](spark, sf_dir))

    timings: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    # seed PAST the warm-up pass's stages (oldest may already be
    # evicted from the status store — a 0 seed would stop short there)
    cursor = _stage_frontier(spark)
    for name in BENCH_QUERIES:
        # Steady-state wall time = min over REPS timed executions
        # (BASELINE.md's column is steady-state): a single timed run is
        # exposed to one-off JVM full-GC pauses after the warm-up pass
        # churns the heap — observed 0.8 s steady-state queries
        # measuring 5+ s on a quiet box. min-of-N is the standard
        # steady-state estimator and stays honest (every rep is a full
        # end-to-end execution through the noop sink). ALL rep times
        # ship in the JSON ("reps") so a machine blip — one outlier rep,
        # min ≪ median — is distinguishable from a plan regression
        # (all reps slow) without rerunning anything.
        rep_times: list[float] = []
        for _ in range(3):
            # operators persist() at diamond points; dead cache entries
            # from the previous rep otherwise add memory pressure and
            # timing noise
            spark.catalog.clearCache()
            cursor = _stage_cursor(spark, cursor)
            t0 = time.perf_counter()
            _force(queries[name](spark, sf_dir))
            rep_times.append(round(time.perf_counter() - t0, 3))
            mb = _shuffle_mb_since(spark, cursor)
            if mb is not None:
                shuffle_mb[name] = mb
        reps[name] = rep_times
        timings[name] = min(rep_times)

    head_queries = {n: _headline_val(v) for n, v in timings.items()}
    # total from the FULL-precision timings, not the 2-sig-fig headline
    # values — summing rounded per-query values carries up to ~2.5%
    # quantization noise into cross-round total comparisons (ADVICE
    # r12); only the per-query map rides at headline precision.
    total = round(sum(timings.values()), 3)
    # TWO JSON lines, detail first: the driver's record keeps only the
    # last ~2 KB of output, so the headline line (metric/value/queries)
    # must come LAST and stay compact enough to survive the tail
    # capture whole — per-rep times and shuffle bytes ride the first
    # (detail) line. r05's single fat line lost its own head.
    print(
        json.dumps(
            {"metric": "bench_detail", "reps": reps, "shuffle_mb": shuffle_mb}
        )
    )
    # compact separators: at 63 queries the default ", "/": " pushed
    # the headline past the driver's ~2 KB tail capture (2008 chars,
    # caught by the contract test r11)
    print(
        _render_headline(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": head_queries,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
