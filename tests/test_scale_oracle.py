"""Scale-up oracle spot-check (opt-in): the heaviest oracle-bearing
queries re-verified at sf0.1 — 10× the driver's correctness scale
factor. Gated behind SPARK_GRAFT_SCALE_ORACLE=1 because the DuckDB
side re-runs every oracle against the 10× fixtures (~30 s total);
the per-round driver gate stays sf0.01.

Float-rounding caveat, measured: at 100 K rows the flagship shows
~1e-5 of rows whose `round(x, 6)` differs in the last digit between
engines — Spark rounds HALF_UP over the double's exact binary
expansion (BigDecimal), DuckDB rounds via a float multiply, so a
quotient landing within 1 ulp of a .xxxxxx5 midpoint can break
differently. That is a property of cross-engine `round`, not of any
operator (the unrounded doubles are bit-identical IEEE); the
assertion here is therefore exact-match for integer/hash/string
queries and mismatch-rate ≤ 1e-4 for float-bearing ones.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_ORACLE") != "1",
    reason="scale-up oracle pass is opt-in: SPARK_GRAFT_SCALE_ORACLE=1",
)

#: (query, exact) — exact=True asserts zero mismatches (integer/hash
#: outputs); exact=False allows the cross-engine round() midpoint rate.
SCALE_QUERIES = [
    ("f1_f2_metrics_pipeline", False),
    ("x28_dataset_build", True),
    ("x45_corpus_report", False),
    ("x44_shard_assignment", True),
    ("x42_temperature_mix", True),
    ("x46_curation_pipeline", True),
    ("e14_avg_min_max_count", False),
    ("d9_star_join_revenue", False),
    ("x6_exact_dedup", True),
    ("n11_stream_static_enrich", True),
    ("x26_contamination", False),
    ("x33_tfidf_topk", False),
    ("x34_bm25_topk", False),
    ("x36_document_chunks", True),
    ("x37_bigram_lm_score", False),
    # x41 deliberately absent: its oracle is the FULL quadratic
    # closure over every sf0.1 document — x46 covers the same
    # recursive-CTE machinery on its filtered survivor set
    ("f8_sessionize", False),
    ("x47_corpus_diff", True),
    ("b9_schema_evolution_read", False),
    ("d10_range_join_pairs", False),
    # r06 additions: the remaining r07 window candidates get their 10×
    # evidence before their driver proof — m5's Arrow path (float
    # outputs → midpoint tolerance) and n9's streamed dedup ingest
    # (hash-grain → exact).
    ("m5_map_in_arrow", False),
    ("n9_stream_dedup_ingest", True),
    # r06-new operators (string/integer outputs → exact)
    ("x49_paragraph_dedup", True),
    ("x50_session_transcripts", True),
    ("n12_stream_session_transcripts", True),
    ("b10_orc_roundtrip", False),
    ("b11_bucketed_colocated_join", False),
    # r07 addition: the single-pass observed audit (integer counts +
    # µs-canonical watermark → exact)
    ("k5_observed_write_metrics", True),
    # r07 addition: the range-clustered lake's pruned read (float value
    # column → midpoint tolerance)
    ("b12_clustered_scan_prune", False),
    # r07 addition: Gopher hard quality gates (rounded doubles +
    # boolean keep → midpoint tolerance)
    ("x51_gopher_rules", False),
    # r07 addition: gated streaming ingest (hash-grain survivor set →
    # exact; keep decision rides rounded metrics like x51's oracle)
    ("n13_stream_gated_ingest", True),
    # r07 additions: finance window superset (rounded doubles →
    # midpoint tolerance)
    ("f9_rsi", False),
    ("f10_ema", False),
    # r07 addition: frame-bounded exact distinct (integer → exact)
    ("f11_sliding_distinct", True),
    # r07 addition: block-grain decontamination (counts exact; the
    # ratio column is a rounded double → midpoint tolerance)
    ("x52_paragraph_contamination", False),
    # r07 addition: iterator pandas UDF (rounded doubles → tolerance),
    # completing 10× evidence for every r08 first-proof candidate
    ("m6_iter_pandas_udf", False),
    # r07 additions: event-sequence analytics (BIGINT counts / date
    # keys → exact)
    ("e17_funnel_stages", True),
    ("e18_retention_cohorts", True),
    # r07 addition: streaming → JDBC serving drain (rounded double
    # totals → midpoint tolerance)
    ("n14_stream_jdbc_serving", False),
    # r07 addition: interval-overlap join (BIGINT ids/micros → exact)
    ("d11_interval_overlap_pairs", True),
    # r07 addition: release drift audit (rounded share/length doubles
    # → midpoint tolerance)
    ("k6_release_drift_audit", False),
    # r07 addition: fixed-iteration PageRank (rounded double ranks →
    # midpoint tolerance)
    ("x53_event_pagerank", False),
    # r07 addition: cogrouped-map API (2-decimal-grain double sums →
    # midpoint tolerance)
    ("m7_cogrouped_map", False),
    # r07 additions: directional as-of joins (micros timestamps +
    # passthrough values → exact)
    ("d12_asof_forward_tolerance", True),
    ("d13_asof_nearest", True),
    # r07 addition: repeat-factor materializer (BIGINT counts/indexes
    # → exact)
    ("x54_epoch_repeat", True),
    # r07 addition: Gopher repetition rules (rounded coverage doubles
    # + boolean keep → midpoint tolerance)
    ("x56_gopher_repetition", False),
    # r07 addition: drawdown windows (rounded double ratios →
    # midpoint tolerance)
    ("f12_drawdown", False),
    # r07 addition: Z-order box scan (float value column → midpoint
    # tolerance, like b12)
    ("b13_zorder_scan_prune", False),
    # r07 addition: salted skew join (rounded double deviation →
    # midpoint tolerance)
    ("d14_salted_join", False),
    # r07 addition: composed Gopher pipeline (BIGINT counts + split
    # labels → exact; a gate midpoint flip would show as row drift,
    # which both modes fail on)
    ("x57_gopher_pipeline", True),
    # r08 additions: DSIR importance weights and CCNet perplexity
    # tiers (rounded double scores → midpoint tolerance; a tier flip
    # from a score midpoint would surface as row drift)
    ("x58_dsir_importance", False),
    ("x59_perplexity_buckets", False),
    # r08 addition: rollup-from-partials (rounded double sums →
    # midpoint tolerance)
    ("e19_hourly_rollup_merge", False),
    # r08 additions: custom stateful drain + exactly-once lake sink
    # (rounded double value columns → midpoint tolerance)
    ("n15_stateful_running_totals", False),
    ("b14_stream_lake_sink", False),
    # r08 addition: volume anomaly gate (rounded z doubles + boolean
    # flag -> midpoint tolerance)
    ("k7_volume_anomaly_gate", False),
    # r08 addition: custom Python DataSource writer roundtrip (rounded
    # double value column -> midpoint tolerance)
    ("b15_python_datasource_sink", False),
    # r08 additions: Bollinger bands (rounded double bands → midpoint
    # tolerance) and corpus boilerplate prune (string/BIGINT → exact)
    ("f13_bollinger", False),
    ("x60_boilerplate_prune", True),
    # r08 addition: small-file compaction double roundtrip (rounded
    # double value column → midpoint tolerance)
    ("b16_compaction_roundtrip", False),
    # r08 addition: rolling VWAP over the JSON-extracted size (rounded
    # double ratios → midpoint tolerance)
    ("f14_vwap", False),
    # late-r08 additions: market beta/corr (rounded covar ratios →
    # midpoint tolerance); schema-drift union, column profile and SCD2
    # merge (verbatim values / counts / dates → exact)
    ("e21_market_beta", False),
    ("h4_union_by_name", True),
    ("k8_column_profile", True),
    ("l5_scd2_dimension", True),
    # late-r08 addition: kNN label propagation, exact form (rounded
    # mean-sim double → midpoint tolerance). Cheap at sf0.1: the
    # embeddings fixture is 2 K vectors → 640 K pairs.
    ("x62_knn_label_propagation", False),
    # late-r08 additions: winnowing fingerprints + the deterministic
    # near-dup pair tier over them (BIGINT hashes/positions/counts —
    # md5_number_upper replays the 64-bit fingerprints → exact).
    ("x64_winnow_fingerprints", True),
    ("x65_winnow_near_dup", True),
    # late-r08 additions: OHLC resample + its streaming drain twin and
    # the interpolation as-of join (rounded double prices/blends →
    # midpoint tolerance). x66 deliberately absent like x41: its
    # oracle is x31's full blocked-quadratic closure over every sf0.1
    # document — x46 covers the same recursive-CTE machinery.
    ("f15_ohlc_resample", False),
    ("n16_stream_ohlc_bars", False),
    ("d15_interpolation_join", False),
    # late-r08 additions: ATR over the bars (rounded rolling means →
    # midpoint tolerance) and the point-in-time join (micros version
    # starts + rounded passthrough attribute → exact, d12/d13 rule)
    ("f16_atr", False),
    ("d16_point_in_time_join", True),
    # late-r08 additions: gap fill (rounded passthrough/ffill closes →
    # midpoint tolerance) and the dirty-CSV audit (exact counts + a
    # corpus-order double sum → midpoint tolerance)
    ("f17_gap_fill", False),
    ("b17_corrupt_record_audit", False),
    # late-r08 addition: Arrow-optimized scalar @udf (rounded log
    # returns → midpoint tolerance)
    ("m8_arrow_optimized_udf", False),
    # late-r08 addition: IVM state merge ≡ full recompute (rounded
    # partial-order double sums → midpoint tolerance)
    ("l6_incremental_agg_rollup", False),
    # late-r08 addition: streaming continuous aggregate (same
    # partial-order sums → midpoint tolerance)
    ("n17_stream_agg_partials", False),
    # late-r08 addition: the composed market flagship (rounded
    # indicator doubles → midpoint tolerance)
    ("f18_market_pipeline", False),
    # late-r08 addition: snapshot time travel (rounded double value
    # passthrough → midpoint tolerance)
    ("b18_snapshot_time_travel", False),
    # late-r08 addition: snapshot increment read (same passthrough →
    # midpoint tolerance)
    ("b19_snapshot_increment_read", False),
    # late-r08 addition: A-ES weighted sample (keys rounded BEFORE
    # ranking → boundary is replayable; a key midpoint could still
    # flip a boundary row → midpoint tolerance)
    ("x68_weighted_sample", False),
    # late-r08 addition: fuzzy name pairs (BIGINT ids/distances →
    # exact; the fixture's templated names are adversarially dense —
    # ~1.9 M true pairs at sf0.1, DuckDB side ~6 s, the heaviest
    # compare in the pass by rows)
    ("x69_fuzzy_name_pairs", True),
    # late-r08 addition: copy-on-write delete roundtrip (rounded
    # double value passthrough → midpoint tolerance)
    ("b20_cow_delete", False),
    # late-r08 addition: copy-on-write merge roundtrip (restated
    # rounded doubles → midpoint tolerance)
    ("b21_cow_upsert", False),
    # r09 addition: the sparse fuzzy-join operating point (BIGINT
    # ids/distances → exact; output is exactly the planted typo pairs)
    ("x70_fuzzy_sparse_pairs", True),
    # r09 addition: the composed lakehouse lifecycle flagship
    # (fingerprint rows carry a rounded double sum → midpoint
    # tolerance; counts/users are exact inside the same hash)
    ("b22_lake_lifecycle", False),
    # r09 addition: streaming → manifest-versioned lake drain
    # (rounded double value passthrough → midpoint tolerance)
    ("n18_stream_snapshot_lake", False),
    # r09 addition: exact-substring duplicate spans (BIGINT span
    # bounds over md5 window hashes → exact)
    ("x71_substring_dup_spans", True),
    # r10 addition: manifest-stats data-skipping read (rounded double
    # value passthrough → midpoint tolerance; the pruning itself is
    # plan/file-asserted in tests/test_plans.py + tests/test_sinks.py)
    ("b23_snapshot_skipping_read", False),
    # r10 addition: the span-CUT consumer over x71's flagger (string
    # reassembly — exact)
    ("x72_substring_dedup_cut", True),
    # r10 addition: snapshot schema evolution (rounded double sum →
    # midpoint tolerance; the refusal path is tests/test_sinks.py)
    ("b24_snapshot_schema_evolution", False),
    # r10 addition: incremental substring spans (BIGINT span bounds —
    # exact; the oracle encodes the union-identity the operator
    # guarantees)
    ("x74_incremental_substring_spans", True),
    # r10 addition: source-reputation gate (rounded mean-quality
    # double → midpoint tolerance; counts/dup-rates integer-derived)
    ("x73_source_reputation_gate", False),
    # r10 addition: composed curation flagship v4 (gate → span cut →
    # exact dedup → hash split; integer/string outputs → exact)
    ("x75_curation_pipeline_v4", True),
    # r11 addition: the Derby-backed partition-parallel JDBC scan —
    # the round-trip must be lossless at 10× too (acctbal DOUBLE is
    # rounded identically on both sides pre-write → exact)
    ("a2_jdbc_scan", True),
    # r11 addition: the materialized substring-index lifecycle —
    # probe-the-artifact must equal x74's inline form at 10× (BIGINT
    # span bounds over md5 window digests → exact)
    ("b25_window_index_lifecycle", True),
    # r11 addition: the streamed substring gate (flag vs the b25
    # artifact + span cut, drained end-to-end; string reassembly →
    # exact)
    ("n19_stream_substring_gate", True),
    # r11 addition: keep-one substring dedup (Lee et al.'s published
    # policy — min-id keeper survives; string reassembly → exact)
    ("x76_substring_dedup_keep_one", True),
    # r11 addition: asymmetric containment pairs (md5 gram ban
    # oracle-mirrored; the rounded score is filtered on BOTH sides of
    # the same rounded value, so the boundary can't split — exact)
    ("x77_containment_pairs", True),
    # r12 additions: batch hard-negative mining (BM25 doubles →
    # midpoint tolerance) and the drop-reason lineage audit
    # (strings + ids → exact).
    ("x78_hard_negative_mining", False),
    ("x79_curation_lineage", True),
    # r12 addition: PSI distribution-drift monitor (double psi →
    # midpoint tolerance) + its streamed face (single-micro-batch
    # identity, the n9 move)
    ("x80_score_drift_psi", False),
    ("n20_stream_drift_monitor", False),
    # r12 addition: FIM transform (strings + integer hashing → exact)
    ("x81_fim_transform", True),
    # r12 addition: margin-based bitext mining (double margins →
    # midpoint tolerance; the A×B oracle is quadratic but bounded —
    # 6.25M pairs at sf0.1, measured ~12 s)
    ("x82_bitext_margin_pairs", False),
    # r13 addition: substring decontamination (strings + ids → exact)
    ("x84_substring_decontamination", True),
    # r13 addition: the decontamination gate streamed (single-
    # micro-batch identity, the n9 move; strings + ids → exact)
    ("n21_stream_decontamination_gate", True),
    # r13 addition: semantic contamination, exact twin (double
    # cosines → midpoint tolerance)
    ("x85_embedding_contamination", False),
    # r13 addition: composed flagship v5 (strings + ids → exact)
    ("x87_curation_pipeline_v5", True),
    # r14 addition: the multi-release index lifecycle (write →
    # merge → publish → probe; strings + ids → exact)
    ("b26_window_index_release_lifecycle", True),
    # r15 addition: b26's embedding sibling (double cosines →
    # midpoint tolerance, the x85 convention)
    ("b27_embedding_index_release_lifecycle", False),
    # r15 addition: the streamed semantic gate (kept rows + cosine
    # evidence → midpoint tolerance)
    ("n22_stream_embedding_gate", False),
]


@pytest.mark.parametrize("name,exact", SCALE_QUERIES)
def test_scale_oracle(spark, name, exact):
    import __spark_entry__ as E
    from tests.oracle import duckdb_connect, compare

    con = duckdb_connect(SF_DIR)
    try:
        sdf = E.queries()[name](spark, SF_DIR)
        probs = compare(sdf, con, E.oracle_sql()[name])
        if exact:
            assert not probs, probs[:3]
        elif probs:
            # tolerate only the documented round()-midpoint class:
            # a tiny mismatch-rate, never row-count/schema drift
            assert all("row mismatch" in p or "total mismatching" in p for p in probs), probs[:3]
            totals = [p for p in probs if "total mismatching" in p]
            assert totals, probs[:3]
            bad, total = totals[0].split(":")[1].strip().split("/")
            assert int(bad) / int(total) <= 1e-4, totals[0]
    finally:
        con.close()
