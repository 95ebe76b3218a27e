"""Regenerate PLANS.md — formatted physical plans of headline queries.

Evidence artifact for the scale-design review (SCALE.md): shows pushed
filters, pruned read schemas, broadcast exchanges, single-shuffle window
pipelines, TakeOrderedAndProject top-k, and equality-join shapes for the
range/LSH operators. Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = "/root/testdata/sf0.001"

#: (query name, what the plan is evidence of)
SHOWCASE = [
    ("f1_f2_metrics_pipeline", "single Exchange feeds both windows; pruned ReadSchema"),
    ("c5_in_between_filter", "IN + BETWEEN predicates in PushedFilters"),
    ("d1_broadcast_left_join", "watermark dim builds a BroadcastExchange"),
    ("d9_star_join_revenue", "one shuffle join (lineitem⋈orders) + broadcast dims + partial agg"),
    ("g3_top_k", "TakeOrderedAndProject, no global sort"),
    ("d10_range_join_pairs", "range predicate runs as bin-equality join, not BNLJ"),
    ("x6_exact_dedup", "dedup shuffles (hash, id) pairs only"),
    ("x17_embedding_near_dup_lsh", "LSH candidate join is equality on (table, bucket)"),
    ("x24_sequence_pack", "two-phase prefix sum: chunk windows + broadcast offsets, no per-stratum hot task"),
    ("x26_contamination", "gram-keyed join; train side collapses to DISTINCT with partial agg before the shuffle"),
    ("x28_dataset_build", "six dataset stages fuse into one plan: scan-side filters, hash-pair dedup shuffle, broadcast anti-join, two-phase pack"),
    ("x33_tfidf_topk", "corpus stats without driver state: map-side-combined term counts, un-hinted vocab join (AQE decides) + 1-row broadcast N, bounded per-doc top-k window"),
    ("x34_bm25_topk", "query-term IN-filter prunes the token stream pre-agg; broadcast corpus stats; TakeOrderedAndProject top-k"),
    ("x36_document_chunks", "zero Exchange: chunk fan-out is a narrow transformation inside the scan stage"),
    ("x42_temperature_mix", "data-derived keep rates: stratum-grain count agg + un-hinted threshold join back onto the scan"),
    ("x44_shard_assignment", "two-phase chunked rank (no single-task global window) + broadcast offsets; floor(pos/size) shards"),
    ("x45_corpus_report", "one scan, one grouped agg: map-side-combined counts/sums + exact percentiles at group grain"),
    ("x48_curation_pipeline_lsh", "composed curation v2, LSH pair source: band-bucket equality join for candidates, id-only CC tables, one bounded 1-row BNLJ (n_min scalar)"),
    ("x58_dsir_importance", "bounded 4096-bucket model: bucket-count agg + single-partition window totals; the weight join back onto the gram stream is a BroadcastHashJoin, never SMJ"),
    ("e19_hourly_rollup_merge", "rollup-from-partials: partial+final HashAggregate at both grains — the first exchange carries hourly partials, the second the hourly grain itself"),
    ("x56_gopher_repetition", "one width-pinned REPARTITION_BY_NUM text exchange below the gram explode (AQE must never coalesce the ~19× fan-out's parallelism away); every doc-keyed groupBy reuses HashPartitioning(doc_id) — the gram stream never shuffles"),
    ("x60_boilerplate_prune", "binary-sha2 block keys: hash-grain count-distinct ban set broadcast into the LeftAnti; keep-lists broadcast into the doc-grain LeftOuter — text never enters a corpus-wide exchange"),
    ("e21_market_beta", "the only event-volume exchange carries map-side (user, day) partial aggregates; the |days|-row market frame is a BroadcastExchange; covar/corr/var fold in one HashAggregate"),
    ("x61_image_near_dup", "decode+hash MapInPandas materializes ONCE (InMemoryTableScan feeds both band-join sides); candidate join is equality on (band_idx, band_val) over 24 B rows — pixels never reach an exchange"),
    ("l5_scd2_dimension", "one key-grain full join decides all four SCD2 branches; closed history unions in below the join; the update batch side is AQE-broadcastable"),
    ("x65_winnow_near_dup", "Arrow-batched MapInPandas hash+winnow materializes ONCE (InMemoryTableScan feeds ban set + both pair sides); fingerprints exchange as 8-byte BIGINTs; ban set is a LeftAnti"),
    ("f15_ohlc_resample", "ONE partial-agg exchange: min_by/max_by/min/max/count combine map-side, (user, day) bar partials shuffle, never ticks"),
    ("d15_interpolation_join", "both bracket passes share one user_id hash exchange (two sorts, one partitioning); no range join, no BNLJ"),
    ("x66_keep_best_dedup", "id-only pair + CC exchanges; quality attaches by id-grain join; per-cluster argmax is a window over cluster ids"),
    ("d16_point_in_time_join", "PIT join runs as the as-of composition (one key exchange + ignore-nulls fill), never the interval BNLJ its oracle spells out"),
    ("f17_gap_fill", "day spine is a narrow Generate off the keys-sized span table; join + ffill window move bar-grain rows only"),
    ("f18_market_pipeline", "returns + TR/ATR + Bollinger fused: the whole indicator stack in two exchanges — one tick partial-agg, one shared bar-grain window re-key"),
    ("x70_fuzzy_sparse_pairs", "fuzzy join candidate generation exchanges the (variant, id) stream ONCE — a bounded variant-grain collect_list (objectHashAggregate) whose i<j pairs unfold scan-locally; only id pairs move afterwards"),
    ("b22_lake_lifecycle", "the four lifecycle read points union as four independent snapshot-scan aggregates — each reads exactly its manifest's file list, no cross-read-point exchange"),
    ("x71_substring_dup_spans", "overlapping k-token windows hash inside the scan; (id, pos, 16-byte digest) rows through the (hash,id) distinct + flagged semi-join + per-doc islands window — text never exchanges"),
    ("x72_substring_dedup_cut", "x71's flag pass + the cut: per-doc span lists join back by id (AQE-broadcastable) and reassembly is scan-local array logic — corpus text crosses at most ONE exchange"),
    ("b23_snapshot_skipping_read", "manifest band-prune happens BEFORE planning: the scan's InMemoryFileIndex lists only the matching slice's files; the residual BETWEEN filter still lands in PushedFilters"),
    ("x74_incremental_substring_spans", "batch windows flag against the corpus (hash, count) index via one hash-grain join; corpus text feeds only the index derivation, batch text never exchanges"),
    ("x75_curation_pipeline_v4", "composed flagship: the source gate is a BroadcastExchange semi-join ABOVE the scan, so the flag/cut/dedup stages all run on the pruned corpus — composition adds no exchange"),
    ("x76_substring_dedup_keep_one", "x72's shape with the keeper: the flag aggregate carries one extra 8-byte min(id) and the hit join is a BroadcastHashJoin + scan-local keeper inequality — no SortMergeJoin, no cartesian"),
    ("x77_containment_pairs", "gram arrays materialize ONCE (InMemoryTableScan feeds the banned-bucket candidate join and both id-grain array re-attach sides); 16-byte digests + id pairs exchange, text never does"),
    ("b25_window_index_lifecycle", "the batch probes the READ-BACK (hash, count) artifact: batch-side counts join the index parquet hash-grain, the flagged set broadcasts back, corpus text appears in NO stage; the BUILD half's exchanges are digest-grain only (tests/test_plans.py::test_window_index_build_shuffles_digests_only)"),
    ("a2_jdbc_scan", "the JDBC relation splits into 4 parallel range queries (numPartitions=4 on the scan node) — N connections each streaming a key range, never one connection streaming the table (tests/test_plans.py::test_jdbc_scan_partition_parallel)"),
    ("x78_hard_negative_mining", "M queries in ONE corpus token pass: the (doc, term) tf table materializes once (InMemoryTableScan feeds df-counts AND the scored stream), per-doc length rides the tf aggregate (no doc-grain length join), corpus stats are one bounded scalar-row BNLJ, positives drop broadcast-anti, and the per-query top-k runs two-phase with WindowGroupLimit partials bounding every exchange (tests/test_plans.py::test_hard_negatives_single_token_pass)"),
    ("x79_curation_lineage", "drop-reason lineage in one digest-grain move: content digests compute scan-side, the keeper min-id aggregate is the ONLY hash exchange (keyed on the 32-byte digest, never text), and the keeper table joins back broadcast (tests/test_plans.py::test_curation_lineage_digest_grain_only)"),
    ("x83_bitext_margin_pairs_ann", "ANN bitext tier: the bucketed table materializes once (InMemoryTableScan feeds both candidate sides), the candidate join is equality on (lsh_table, lsh_bucket) over (id, table, bucket) rows, unit vectors re-attach by id AFTER the pair dedup, and the margin tail's three exchanges carry (id_a, id_b, cos) only — embedding arrays never enter an O(candidates) exchange"),
    ("x84_substring_decontamination", "decontamination flag+cut: the eval split feeds ONLY its (hash, distinct-doc-count) index, the train window stream semi-joins the count-filtered flag set (AQE-broadcastable), spans aggregate at id grain, and train text crosses exactly ONE exchange in the cut reassembly"),
    ("x88_bloom_decontamination", "the bloom tier: NO join in the flag path — the train window stream filters through one ArrowEvalPython (the bitmap membership test; bit positions are JVM-side xxhash64), then the same islands window + cut as x84; the eval set appears in NO stage of this plan (its bitmap was folded once at build time)"),
    ("b26_window_index_release_lifecycle", "the multi-release probe: the PUBLISHED merged artifact feeds the flag semi-join exactly like x84's inline index — release-1 text appears in NO stage (it lives only as (16 B, 8 B) parquet rows), release-2 text fed only the merge step's one digest-grain sum (tests/test_plans.py::test_window_index_merge_shuffles_digests_only), and train text crosses one exchange in the cut"),
    ("b27_embedding_index_release_lifecycle", "b26's semantic sibling: the PUBLISHED embedding artifact feeds the probe as a bare (id, vector, norm) parquet scan — release-1 vectors never re-normalize (their norms ride the ReadSchema), the release merge is a hash-exchange-free union (tests/test_plans.py::test_embedding_index_merge_is_exchange_free), and the exact-tier pair table + verdict window are x85's plan shape unchanged"),
    ("b28_embedding_ann_release_lifecycle", "the lifecycle's 100 TB probe: eval side is TWO bare parquet scans (stored buckets + stored vectors/norms) with zero compute — the only ArrowEvalPython stages are the TRAIN side's bucketing matmul and the per-candidate dot, the candidate join is equality on (table, bucket), and no exchange carries a vector array (tests/test_plans.py::test_embedding_ann_artifact_probe_plan)"),
    ("b29_bloom_index_release_lifecycle", "the bloom tier's frozen-release probe: x88's join-free flag path (JVM xxhash64 bit positions → one ArrowEvalPython membership test → islands merge) fed by a bitmap LOADED from the chunked artifact instead of rebuilt — the eval corpus appears in NO stage; the release merge happened driver-side at bitmap grain (m/8 bytes OR'd, the bounded IVF-centroid class)"),
]

#: Operators whose scale-relevant plan can't be dumped through
#: queries() (streaming sinks): documented here so every operator's
#: plan assertion is named in PLANS.md, per the r11 verdict.
EXTRA_NOTES = [
    (
        "n20_stream_drift_monitor",
        "per-micro-batch body: the batch folds to its own (source, "
        "bin) histogram in one aggregate and joins the read-back "
        "baseline artifact full-outer at histogram grain — documents "
        "never shuffle, the corpus never re-scores "
        "(tests/test_plans.py::test_psi_drift_histogram_grain_only "
        "pins the shared batch-form shape; redelivery idempotence is "
        "per-batch partition OVERWRITE, the n17 move, asserted in "
        "tests/test_streaming.py).",
    ),
    (
        "n19_stream_substring_gate",
        "per-micro-batch body pinned via its single-micro-batch twin "
        "(tests/test_plans.py::test_stream_substring_gate_batch_plan): "
        "landed-id anti-join + b25-index probe + span cut compose "
        "with no cartesian and broadcast joins on the batch-sized "
        "sides — each batch pays batch-sized work plus one hash-grain "
        "probe of the artifact, regardless of corpus size. Exactly-"
        "once and frozen-release behavior are data-level contracts "
        "pinned in tests/test_streaming.py.",
    ),
    (
        "n21_stream_decontamination_gate",
        "per-micro-batch body is x84's plan (dumped above) with the "
        "frozen eval index read back from its b25 artifact: "
        "landed-id anti-join + presence-in-reference semi-join + "
        "span cut, batch-sized work per batch regardless of corpus "
        "size; stateless across batches (no cross-batch count can "
        "flip a verdict) so batch order is immaterial. Exactly-once "
        "and statelessness are data-level contracts pinned in "
        "tests/test_streaming.py::"
        "test_decontamination_gate_multibatch_and_redelivery.",
    ),
]


def main() -> None:
    from stock_market_etl_spark.catalog import all_queries
    from stock_market_etl_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        f"Generated by `python tools/dump_plans.py` at sf0.001 "
        "(plan shape is scale-invariant; AQE re-plans sizes at runtime). "
        "What to look for per plan is noted above each block; the "
        "assertions live in `tests/test_plans.py`.",
        "",
    ]
    for name, evidence in SHOWCASE:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*Evidence:* {evidence}", "", "```"]
        out.append(buf.getvalue().rstrip())
        out += ["```", ""]

    for name, note in EXTRA_NOTES:
        out += [f"## {name}", "", f"*Evidence:* {note}", ""]

    with open(os.path.join(REPO_ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
