"""bench.py is driver-facing infrastructure: it must print exactly one
JSON line with the contract keys, whatever else happens. A regression
here costs a full driver round, so it gets its own subprocess test at
smoke scale."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import REPO_ROOT, SF_SMOKE


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_SMOKE,
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        # 65 queries × (warm-up + 3 reps) at sf0.001. History: 420 s
        # started flaking at 63 queries (r11) → 720 s; r15 measured
        # the SAME code at 858–890 s wall on a slower/noisier
        # sandbox (Firecracker co-tenancy, per-query swings up to
        # 5×) where the r14/r15 build hosts ran it in ~6–7 min —
        # the r15 optimizations brought the quiet reading there back
        # to ~600 s, but 720 s left only 20 % headroom against
        # documented host variance. 1500 s keeps the guard
        # meaningful (a hung bench still fails fast relative to the
        # 25-min suite) without failing the whole suite on host
        # placement.
        timeout=1500,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 2, out.stdout[-2000:]
    detail, payload = (json.loads(ln) for ln in json_lines)
    assert payload["metric"] == "bench_total_wall"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float))
    assert payload["queries"] and all(
        isinstance(v, (int, float)) for v in payload["queries"].values()
    )
    # the headline total is the FULL-precision sum of the measured
    # timings (ADVICE r12: summing the 2-sig-fig per-query values put
    # ~2.5% quantization noise into cross-round total comparisons);
    # the rounded per-query map must still reconcile with it to within
    # the 2-sig-fig band (≤5% relative per value, plus float noise)
    assert (
        abs(sum(payload["queries"].values()) - payload["value"])
        <= 0.05 * payload["value"] + 0.002
    )
    assert payload["sf"] == 0.001
    # BENCH-membership policy (VERDICT r12 task 4, decided r13): the
    # driver's capture is EXACTLY the last 2000 chars of output
    # (measured: len(BENCH_r12.json "tail") == 2000), and the
    # headline is the LAST line, so it survives whole iff it fits in
    # ~1999 chars. Contract bound: 1950 — a 50-char guard against the
    # hard cap. Per-query values ride at 2 significant figures
    # (bench._headline_val); at r13's 66 rows the headline measures
    # ~1905 chars, leaving room for ~1-2 more rows. WHEN the 1950
    # bound is reached: retire the cheapest rows whose machinery is
    # timed by a composed row (e.g. the five sub-0.4 s dashboard
    # queries are all sub-plans of f1_f2/f18-style composites), and
    # record each retirement in BASELINE.md as "retired rN, covered
    # by <row>" so the baseline sum stays comparable. Never raise the
    # bound past 1950 — the 2000 cap is the driver's, not ours.
    assert json_lines[-1] == json.dumps(payload, separators=(",", ":"))
    # bench now enforces this bound AT EMIT TIME (bench._render_headline
    # refuses past HEADLINE_BUDGET — ADVICE r13: the protection must
    # fire on every run, not only when this test happens to run before
    # the driver captures a clipped line); this assertion stays as the
    # CI-visible early warning with the policy note above.
    assert len(json_lines[-1]) < 1950, len(json_lines[-1])
    # per-rep evidence rides the detail line: every query ships all
    # rep times at full 3-decimal precision, and the headline number
    # is their min through the headline rounding (noise vs regression
    # in one glance)
    from bench import _headline_val

    assert detail["metric"] == "bench_detail"
    assert set(detail["reps"]) == set(payload["queries"])
    for name, rep_times in detail["reps"].items():
        assert len(rep_times) == 3
        assert _headline_val(min(rep_times)) == payload["queries"][name]


# Pinned per-query shuffle bytes at sf0.1 under the test session
# (local[8], 8 shuffle partitions). Wall-clock on this shared host
# swings up to 5x run-to-run (BASELINE.md), so plan regressions are
# detected on the stable signal instead: a payload slipping into a
# shuffle moves bytes by integer factors (x6's r04 regression was
# 0.99 -> 3.8 MB), far outside the [0.5x, 1.6x] band — which in turn
# is wide enough for partition-count overhead (the same queries move
# <20% between 8 and 32 shuffle partitions).
# ALL pins re-measured r09 under the stage-grain metric
# (bench._shuffle_mb_since): the former SQL-execution-store reading
# lost AQE-replanned exchange metrics (observed 0.0 for a query whose
# stages wrote 40 MB) and saw only the LAST execution of multi-exec
# queries. Stage grain counts every byte a query actually shuffled —
# several figures moved (both directions) purely from the measurement
# fix; the per-query rationales below are unchanged.
SHUFFLE_MB_PINS = {
    "f1_f2_metrics_pipeline": 2.01,
    "x6_exact_dedup": 0.37,
    "x10_minhash_lsh_pairs": 0.88,
    "x17_embedding_near_dup_lsh": 8.61,
    "x26_contamination": 4.64,
    "x28_dataset_build": 0.28,
    "x33_tfidf_topk": 3.54,
    "x34_bm25_topk": 0.39,
    "x44_shard_assignment": 0.21,
    "x48_curation_pipeline_lsh": 2.74,
    # block keys shuffle as 32-byte binary sha2 digests (unhex),
    # never 64-char hex
    "x49_paragraph_dedup": 0.73,
    "x50_session_transcripts": 1.73,
    # x58 shuffles bucket ids + doc-grain partials only (the
    # 4096-bucket model broadcasts — a payload or SMJ regression would
    # jump this by orders of magnitude); e19's figure IS the hourly
    # partial grain (the contract: raw events never shuffle).
    "x58_dsir_importance": 0.11,
    "x59_perplexity_buckets": 0.17,
    "e19_hourly_rollup_merge": 3.35,
    # x56's one exchange is the doc-grain TEXT repartition (the
    # exploded gram stream is aggregated in place); x57 composes it
    # with x49's block dedup; x60's figure is the (binary-sha2,
    # doc_id) ban aggregation + id-grain keep lists — a re-fattening
    # means text or hex leaked back into a corpus-wide exchange.
    "x56_gopher_repetition": 2.10,
    "x57_gopher_pipeline": 2.71,
    "x60_boilerplate_prune": 1.21,
    # e21's figure is the (user, day) partial-agg exchange +
    # daily-grain window/agg rows — a re-fattening means raw events
    # started shuffling. x61's figure is the spread() round-robin of
    # the (id, TEXT) fixture rows (r10: the asset builder spreads a
    # narrow source before its compute-bound Python stages — decode
    # payloads still never enter an exchange; payload BYTES here
    # would read ~3× the text) plus the tiny id+hash band rows
    # (pre-r10 pin: 0.006 MB, bands only).
    "e21_market_beta": 1.05,
    "x61_image_near_dup": 0.83,
    # x63's figure is LSH bucket keys + id-pair candidates + the
    # id-keyed vector re-attach (raw vectors in the candidate
    # exchange would blow it up); x64's is spread()'s round-robin of
    # id+text (the only text motion — fingerprints leave as 8-byte
    # BIGINTs); x65 adds the fingerprint-grain dedup/ban/pair
    # exchanges on top — hex or text leaking back in means ~4x.
    "x63_knn_label_propagation_lsh": 6.02,
    "x64_winnow_fingerprints": 0.81,
    "x65_winnow_near_dup": 9.71,
    # f15's figure is the (user, day) bar-partial exchange — raw
    # ticks in the shuffle would scale it with tick volume; x67
    # moves band keys + id pairs + id-grain quality rows only.
    "f15_ohlc_resample": 1.54,
    "x67_keep_best_dedup_lsh": 1.11,
    # f16 = f15's bar-partial exchange + the bar-grain window re-key —
    # raw ticks in either would scale it with volume; f18 fuses the
    # whole indicator stack into the same two exchanges, so its
    # figure must stay ~f16's (a jump means a third exchange).
    "f16_atr": 1.97,
    "f18_market_pipeline": 1.94,
    # r09: the sparse fuzzy-join operating point — ONE bounded
    # variant-grain collect_list exchange + the guard histogram job
    # (r10: its ban set is collected and broadcast back, cache
    # released eagerly) + a near-empty pair stream (planted typos
    # only). r10 re-pin: variants exchange as 16-byte md5 DIGESTS
    # (25.6 → 22.4 MB same-session A/B on this 32-char-name fixture;
    # the real point is the BOUNDED key — 16 B/variant regardless of
    # entity-name length, where strings scale the exchange with
    # name bytes). r11 re-pin 22.41 → 28.87: the ban set went from a
    # collected broadcast (an unbounded driver collect_list at
    # pathological density) to the lazy HAVING-shrunk aggregate the
    # main plan anti-joins — structurally driver-safe at any density
    # for one extra map-side-combined hist exchange of the variant
    # stream (~6.5 MB here), wall-clock identical. The pre-r09
    # distinct → anti-join → self-join shape creeping back means
    # ~1.5-2x.
    "x70_fuzzy_sparse_pairs": 28.87,
    # r09: overlapping-window exact-substring spans — (id, pos,
    # 16-byte digest) rows through the (hash,id) distinct, the
    # flagged semi-join, and the per-doc islands window; TEXT in any
    # of the three would multiply this several-fold.
    "x71_substring_dup_spans": 10.08,
    # r10: the span-CUT consumer = x71's three hash/id-grain
    # exchanges + the per-doc span aggregation + ONE id-grain join
    # where the corpus text crosses (the honest reassembly cost);
    # text in the FLAG pass too would roughly double this.
    "x72_substring_dedup_cut": 10.82,
    # r10: incremental substring spans — the catalog form derives the
    # corpus (hash, count) index inline, so the figure is the
    # corpus-side (h, id) distinct + the batch-side counts/semi-join/
    # islands; batch TEXT (or corpus text post-index) in an exchange
    # would multiply it.
    "x74_incremental_substring_spans": 9.98,
    # r10: composed flagship v4 — the gate prunes sources BEFORE the
    # flag/cut stages, so its figure sits BELOW x72's despite doing
    # strictly more work; creeping back above x72's ~10.8 means the
    # gate stopped pruning ahead of the window hashing.
    "x75_curation_pipeline_v4": 5.97,
    # r10: source reputation — source-grain partial-agg rows only
    # (count/sum/distinct-hash partials); corpus text in the exchange
    # would be ~600x.
    "x73_source_reputation_gate": 0.24,
    # r11: keep-one substring cut — x72's exchanges + one extra
    # 8-byte min(id) keeper riding the flag aggregate (the ~1 MB
    # delta over x72's 10.8); keeper text or a cluster table in an
    # exchange would blow well past it.
    "x76_substring_dedup_keep_one": 11.80,
    # r11: containment pairs — the (16-byte gram digest, id) stream
    # for the banned-bucket candidate join + id pairs + the two
    # id-grain gram-ARRAY re-attach joins (arrays bounded by doc
    # length); text in any exchange would multiply this.
    "x77_containment_pairs": 9.49,
    # r12: batch hard-negative mining — ONE (doc, term) tf exchange
    # of the query-term-filtered token stream (per-doc length rides
    # it; corpus stats broadcast as a scalar row) + the tiny df/
    # window-survivor exchanges; a doc-grain length JOIN creeping
    # back in (the bm25_topk shape) or text in the tf rows would
    # multiply this.
    "x78_hard_negative_mining": 1.11,
    # r12: curation lineage — one digest-grain keeper aggregate +
    # the (digest, id, lang, n_chars) join rows; text in the
    # exchange would scale this with corpus bytes.
    "x79_curation_lineage": 0.17,
    # r13: ANN bitext mining — (id, table, bucket) rows through the
    # bucket-local candidate join, then (id_a, id_b) pairs + one
    # 8-byte cos each through the dedup and the three margin-tail
    # exchanges (two background windows + the re-join); the 64-double
    # embedding arrays re-attach via the tiny broadcast unit-vector
    # table and NEVER enter an O(candidates) exchange — raw vectors
    # in the pair stream would read ~15-20× this.
    "x83_bitext_margin_pairs_ann": 19.03,
    # r13: substring decontamination — the eval split's (16-byte
    # digest, count) index + the train-side (digest, id, pos) window
    # stream through the flag semi-join and the islands window + the
    # id-grain span lists and ONE train-text exchange in the cut;
    # far below x72's ~10.8 because only the eval-derived flag set
    # (20% of docs' distinct windows) gates the stream. Train text
    # in the FLAG pass or eval text anywhere would multiply this.
    "x84_substring_decontamination": 2.66,
    # r13: semantic-contamination ANN tier — (id, table, bucket)
    # rows through the bucket-local train×eval candidate join, id
    # pairs + one 8-byte cos through the dedup and the per-train
    # verdict window; embedding arrays re-attach by id and never
    # enter an O(candidates) exchange. Smaller than x83's 19 MB
    # because the verdict tail is ONE window (no dual background
    # aggregates re-reading the pair table).
    "x86_embedding_contamination_lsh": 4.24,
    # r13: flagship v5 — x75's exchanges (gate broadcast, flag/cut
    # hash+id grain, one text exchange, 32-byte dedup hashes) + the
    # decontamination stage: the eval window-hash set + the
    # survivor-text window stream + one more survivor-text exchange
    # in the second cut. Sits above x75's 5.97 by roughly the
    # decon stage's share; eval TEXT in any exchange would blow it.
    "x87_curation_pipeline_v5": 6.78,
}


def test_headline_refuses_past_budget_at_emit_time():
    """ADVICE r13: the headline-size protection must fire on every
    bench RUN, not only when the contract test happens to run — an
    over-budget headline is a loud SystemExit naming the retirement
    policy, never a silently clipped driver capture; an in-budget
    payload round-trips through the same seam byte-identically."""
    import pytest

    from bench import HEADLINE_BUDGET, _render_headline

    ok = {"metric": "bench_total_wall", "value": 1.0, "queries": {}}
    assert _render_headline(ok) == json.dumps(
        ok, separators=(",", ":")
    )
    fat = {
        "metric": "bench_total_wall",
        "value": 1.0,
        "queries": {f"q{i:04d}_padpadpad": 1.23 for i in range(200)},
    }
    assert len(json.dumps(fat, separators=(",", ":"))) > HEADLINE_BUDGET
    with pytest.raises(SystemExit, match="retire"):
        _render_headline(fat)
    # the boundary agrees with this file's `len < 1950` assertion
    # exactly (review r14): a line of EXACTLY the budget refuses too
    edge = {"m": "a" * (HEADLINE_BUDGET - 8)}
    assert len(json.dumps(edge, separators=(",", ":"))) == HEADLINE_BUDGET
    with pytest.raises(SystemExit, match="retire"):
        _render_headline(edge)
    under = {"m": "a" * (HEADLINE_BUDGET - 9)}
    assert _render_headline(under)


def test_headline_prevalidates_before_timing_loop():
    """ADVICE r14: a BENCH addition that cannot possibly fit the
    headline budget fails BEFORE the timing loop pays for the full
    run (and before the SystemExit would skip spark.stop()). The
    rehearsal is a LOWER bound (1-char values) so it can never
    falsely refuse a run the emit guard passes: the CURRENT query
    set must prevalidate clean, a hopeless set must raise, and
    main() must call the rehearsal ahead of the warm-up pass."""
    import inspect

    import pytest

    import bench

    # the real set passes (no false refusal)
    bench._prevalidate_headline(bench.BENCH_QUERIES, 0.1)
    # a set that cannot fit even at minimum width refuses up front
    hopeless = [f"q{i:04d}_padpadpadpadpad" for i in range(200)]
    with pytest.raises(SystemExit, match="retire"):
        bench._prevalidate_headline(hopeless, 0.1)
    # ordering: rehearsal strictly before Spark startup (pure Python
    # refusal — no JVM paid, no un-stopped session; review r15)
    src = inspect.getsource(bench.main)
    assert src.index("_prevalidate_headline") < src.index(
        "get_spark("
    )


def test_shuffle_bytes_hold_their_pins(spark):
    """The shuffle-economy contract as a test, not prose: each benched
    query's total 'shuffle bytes written' at sf0.1 must stay inside
    [0.5x, 1.6x] of its pinned value. Catches id-only shuffles
    re-fattening with payload columns (dedup/LSH family), lost
    broadcast decisions, and lost exchange reuse — the regressions
    wall-clock noise hides."""
    from bench import (
        _force,
        _shuffle_mb_since,
        _stage_cursor,
        _stage_frontier,
    )
    from stock_market_etl_spark.catalog import all_queries

    queries = all_queries()
    failures = []
    # seed past whatever the shared test session already ran — its
    # oldest stages may be evicted from the status store, and a 0 seed
    # stops at the first evicted id, misreading every query as 0 MB
    cursor = _stage_frontier(spark)
    for name, pin in SHUFFLE_MB_PINS.items():
        spark.catalog.clearCache()
        cursor = _stage_cursor(spark, cursor)
        _force(queries[name](spark, "/root/testdata/sf0.1"))
        mb = _shuffle_mb_since(spark, cursor)
        if mb is None:
            failures.append(f"{name}: shuffle metric unavailable")
        elif not (0.5 * pin <= mb <= 1.6 * pin):
            failures.append(f"{name}: {mb} MB outside [0.5, 1.6]x {pin}")
    assert not failures, failures
