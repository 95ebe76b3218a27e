"""Structured Streaming surface (SURVEY §2.N).

The reference's hourly cron job is semantically a micro-batch stream:
source offsets = the DB high-watermark (`scripts/ingest_hourly.py:48-53`),
idempotent sink = the same-day merge (`scripts/ingest_hourly.py:117-131`),
late-data policy = the strictly-newer filter
(`scripts/load_stock_metrics.py:78-80`). True streaming is roadmap-only
in the reference (`README.md:72,75`); here it is real: file-source
streams over the events table, tumbling/sliding/session windows with
watermarks, stateful dedup, and a foreachBatch upsert sink running the
batch merge.

Every aggregation here is expressed so the IDENTICAL transform runs in
batch mode — stream-batch parity is the correctness contract
(tests/test_streaming.py), since streaming results are not
DuckDB-oracle-checkable.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# the single home of the PATH_NOT_FOUND classification lives with
# the other artifact-seam helpers (review r15, second move — batch
# artifact readers need it too and must not import streaming)
from stock_market_etl_spark.operators.artifacts import (
    read_if_exists as _read_if_exists,
)
from stock_market_etl_spark.pipeline import merge_increment

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture. Source offsets (which
    files have been consumed) are tracked by the engine — the streaming
    analogue of the reference's MAX(date) watermark read (L1).

    File streams require an explicit schema; it is sniffed from ONE
    batch read of the same path (a footer read, no data scan) instead
    of being hardcoded, so the stream sees exactly the physical shape
    the batch reader sees and ``io.canon_events_ts`` normalizes both
    identically — parquet-nanos type drift (bigint vs timestamp_ntz vs
    timestamp) cannot desynchronize the stream from its batch twin.
    """
    from stock_market_etl_spark.io import canon_events_ts

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        # file streams take a directory; select just the events table
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return canon_events_ts(raw)


def batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same source, batch mode — parity twin of `stream_events`."""
    from stock_market_etl_spark.io import load_table

    return load_table(spark, sf_dir, "events")


def tumbling_counts(
    events: DataFrame, watermark: str = "2 hours", width: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-user aggregation — the streaming form of the
    reference's per-(year,ticker) batch grouping
    (`scripts/ingest_hourly.py:117-124`)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    watermark: str = "2 hours",
    width: str = "6 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding-window average — time-based analogue of the 30-row
    rolling volatility (F2, `scripts/transform.py:71-76`)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), "user_id")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "user_id",
            "avg_value",
        )
    )


def ohlc_bars(
    events: DataFrame, watermark: str = "2 hours", width: str = "1 day"
) -> DataFrame:
    """Tumbling-window OHLC bar maintenance — the streaming form of the
    f15 tick→bar resample (catalog/windows.py): per (user, bar) open /
    high / low / close / tick count, kept current as ticks arrive.
    ``min_by``/``max_by`` on the tick timestamp are declarative
    aggregates, so the state per open bar is five scalars + two
    timestamps — never the ticks — and a 1-day window aligned to the
    epoch makes the bar key equal f15's calendar date (UTC session TZ),
    so a complete-mode drain equals the batch resample exactly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), "user_id")
        .agg(
            F.round(F.min_by("value", "ts"), 6).alias("open_px"),
            F.round(F.max("value"), 6).alias("high_px"),
            F.round(F.min("value"), 6).alias("low_px"),
            F.round(F.max_by("value", "ts"), 6).alias("close_px"),
            F.count("*").cast("long").alias("n_ticks"),
        )
        .select(
            F.to_date(F.col("win.start")).alias("bar_date"),
            "user_id",
            "open_px",
            "high_px",
            "low_px",
            "close_px",
            "n_ticks",
        )
    )


def session_counts(
    events: DataFrame, watermark: str = "2 hours", gap: str = "30 minutes"
) -> DataFrame:
    """Session-window aggregation (no reference analogue — engine
    superset): sessions close after ``gap`` of per-user inactivity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "user_id",
            "n_events",
        )
    )


def session_transcripts_stream(
    events: DataFrame, watermark: str = "2 hours", gap: str = "30 minutes"
) -> DataFrame:
    """Streaming session transcript assembly — the stateful streaming
    twin of operators/sessions.session_transcripts (catalog x50):
    every ``gap``-bounded per-user session becomes one ordered
    transcript document. ``session_window`` carries open sessions in
    the state store and MERGES them when a later micro-batch extends
    one (the semantics the multi-batch test pins); the transcript agg
    is collect_list of (ts, event_id, payload) structs, sorted at emit
    time — deterministic output regardless of arrival interleaving
    within the session. The drained result equals the batch operator
    exactly (session_window's gap rule IS gaps-and-islands), so the
    catalog form carries a full hash oracle."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("o"),
                F.col("event_type").alias("p"),
            )
        )
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
            F.count("*").cast("long").alias("n_turns"),
            F.concat_ws(
                " ", F.transform(ordered, lambda x: x["p"])
            ).alias("transcript"),
        )
        .select("user_id", "sess_start", "sess_end", "n_turns", "transcript")
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on the natural key — the streaming form
    of E6 (`scripts/load_stock_metrics.py:88`): duplicates arriving
    within the watermark horizon are dropped, state is evicted beyond
    it."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "ts"]
    )


#: output / state schemas for the custom stateful operator below.
RUNNING_TOTALS_OUTPUT = "user_id LONG, n_events LONG, sum_value DOUBLE"
RUNNING_TOTALS_STATE = "n_events LONG, sum_value DOUBLE"


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (`applyInPandasWithState`): per-user
    running event count + value total, carried across micro-batches in
    engine-managed state. This is the streaming generalization of the
    reference's cross-run watermark accounting (`scripts/
    load_stock_metrics.py:40-49` keeps per-ticker progress in Postgres
    between cron ticks; here the engine's state store plays that role).

    State is one (count, sum) pair per key — O(keys), not O(rows) — so
    it holds at 100 TB input: the shuffle is on the group key and state
    never grows with history. Emission is `update`-mode: each
    micro-batch emits the new running totals for keys it touched; the
    latest emission per key equals the batch groupBy aggregate
    (asserted in tests/test_streaming.py).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_OUTPUT,
        RUNNING_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """PySpark 4's `transformWithStateInPandas` needs the protobuf
    Python package for its driver-side state server; gate on it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_running_totals_tws(events: DataFrame) -> DataFrame:
    """`stateful_running_totals` on PySpark 4's arbitrary-state API
    (`transformWithStateInPandas` + RocksDB state store): same
    per-key (count, sum) state and update-mode emission, but with
    typed state handles (getValueState) and timer support for
    TTL/eviction at scale. Requires the protobuf package
    (`tws_available()`); raises ImportError otherwise — the
    applyInPandasWithState form above is the portable twin, and the
    parity test runs whichever the environment supports.
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package, "
            "not present in this environment; use stateful_running_totals"
        )
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, s = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(s, 6)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=T.StructType.fromDDL(RUNNING_TOTALS_OUTPUT),
        outputMode="Update",
        timeMode="None",
    )


def batch_running_totals(events: DataFrame) -> DataFrame:
    """Batch parity twin of `stateful_running_totals`: the final state
    per key must equal this plain grouped aggregate."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias("sum_value"),
    )


def run_available_now(
    stream_df: DataFrame,
    sink_table: str,
    checkpoint: str,
    output_mode: str = "append",
):
    """Drain the whole source with availableNow and stop — the testable
    micro-batch form (the reference's cron tick, but offset-tracked).

    Append mode only emits windows already finalized by the watermark —
    windows inside the final watermark horizon stay in state. Parity
    tests that compare the FULL result therefore drain aggregations in
    ``complete`` mode; production append sinks accept the
    horizon-lagged emission (that lag IS the late-data guarantee).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def upsert_sink(
    stream_df: DataFrame,
    lake_path: str,
    checkpoint: str,
    keys: tuple[str, ...] = ("user_id", "ts"),
):
    """foreachBatch idempotent upsert sink: each micro-batch runs the L2
    anti-join merge against the lake (reference merge core
    `scripts/ingest_hourly.py:117-131`). Exactly-once lake state =
    at-least-once delivery + idempotent merge."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Only a missing lake may fall through to the bootstrap write.
        # Any other read failure (corrupt file, FS hiccup) must re-raise
        # so the micro-batch retries — falling through would overwrite
        # the whole lake with one batch (the shared `_read_if_exists`
        # classification, review r15).
        existing = _read_if_exists(spark, lake_path)
        if existing is not None:
            existing = existing.select(*batch_df.columns)
            merged = merge_increment(existing, batch_df, keys)
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(lake_path)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet table directory — the arrival
    stream for the ingest sinks (documents for `dedup_ingest_sink`,
    embeddings for `ivf_append_sink`). Schema is sniffed from one batch
    footer read of the same path (same contract as `stream_events`).
    ``max_files_per_trigger`` bounds micro-batch size (and in tests
    forces multi-batch replays)."""
    schema = (
        spark.read.option("pathGlobFilter", glob).parquet(path).schema
    )
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.load(path)


def dedup_ingest_sink(
    stream_docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
    transform=None,
):
    """Streaming corpus builder with dedup-on-arrival: each micro-batch
    is (1) exact-deduped within itself, (2) anti-joined on content hash
    against the corpus built so far — plus, when ``threshold`` is set,
    a MinHash-LSH near-dup tier (`incremental_dedup(source="lsh")`) —
    and (3) APPENDED to the corpus. The streaming composition of x6 +
    x38 over the reference's watermark-gated incremental load
    (`scripts/ingest_hourly.py:48-53`, `scripts/load_stock_metrics.py:76-88`),
    lifted from (ticker, date) row identity to content identity.

    Exactly-once at content grain WITHOUT transactional writes: the
    sink only appends, and a redelivered micro-batch re-runs the hash
    anti-join against a corpus that already contains its survivors, so
    every redelivered row drops out — at-least-once delivery plus
    content-keyed idempotence composes to exactly-once corpus state
    (the same algebra `upsert_sink` gets from the L2 merge; asserted by
    replaying the whole stream in tests/test_streaming.py).

    ``transform`` (DataFrame → DataFrame, schema-preserving) is the
    clean-on-arrival hook, applied to every micro-batch BEFORE dedup —
    quality filters, PII redaction (`text.pii_redact`), length
    floors. Cleaning precedes dedup deliberately: redaction changes
    content, so the corpus's content identity must be the CLEANED
    text's, or a later redacted duplicate would slip past the hash
    anti-join. Must be deterministic — a redelivered batch re-runs it
    and relies on identical output for idempotence.

    Scale notes: per-batch cost is increment-sized — the corpus side
    enters only as a hash column scan (or, with ``threshold``,
    materialized signature tables; see `dedup.corpus_signatures`), and
    the append never rewrites existing corpus files. The within-batch
    `exact_dedup` keeps full rows (the batch IS the payload to land),
    which shuffles one increment, not the corpus."""
    from stock_market_etl_spark.operators.dedup import (
        exact_dedup,
        incremental_dedup,
    )

    out_cols = list(stream_docs.columns)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        if transform is not None:
            batch_df = transform(batch_df)
            if batch_df.isEmpty():
                return
        batch_dd = exact_dedup(
            batch_df, text_col=text_col, id_col=id_col
        ).select(*out_cols)
        # missing corpus ⇒ bootstrap append; other read errors retry
        # (the shared `_read_if_exists` classification, review r15)
        corpus = _read_if_exists(spark, corpus_path)
        if corpus is not None:
            corpus = corpus.select(*out_cols)
            if threshold is None:
                c_hash = corpus.select(
                    F.sha2(F.col(text_col), 256).alias("__h")
                ).distinct()
                batch_dd = (
                    batch_dd.withColumn(
                        "__h", F.sha2(F.col(text_col), 256)
                    )
                    .join(c_hash, "__h", "left_anti")
                    .drop("__h")
                )
            else:
                batch_dd = incremental_dedup(
                    corpus,
                    batch_dd,
                    threshold=threshold,
                    text_col=text_col,
                    id_col=id_col,
                    source="lsh",
                )
        batch_dd.select(*out_cols).write.mode("append").parquet(
            corpus_path
        )

    q = (
        stream_docs.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream–static broadcast enrichment: each micro-batch left-joins
    the (bounded) static dimension — the STATELESS streaming join
    (no watermark, no join state store; contrast `view_purchase_join`,
    whose both-stream sides must buffer). The broadcast hint keeps the
    stream side unshuffled; Spark re-plans the static side per
    micro-batch, so a dim backed by a lake table picks up refreshes
    between batches without restarting the query. The streaming form
    of D1's fact ⟕ watermark-dim join (reference
    `scripts/load_stock_metrics.py:77`)."""
    return events.join(F.broadcast(dim), key, "left")


def ivf_append_sink(
    stream_vecs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming IVF index maintenance — the ANN twin of
    `dedup_ingest_sink`: each arriving embedding micro-batch is
    assigned to its nearest centroid against the index's FIXED
    centroid table (`similarity.assign_cells` — a zero-shuffle literal
    projection; centroids are trained once per index build by
    `ivf_index`, never re-fit per batch) and APPENDED to the
    cell-partitioned ``cells`` table, so `ivf_probe` over
    `read_ivf_index` sees new vectors immediately with unchanged
    partition pruning.

    Exactly-once at vector-id grain without transactional writes, by
    the same algebra as the dedup sink: the batch anti-joins on
    ``id_col`` against the ids already in the index (an id-column scan
    of ``cells`` — never embeddings), so a redelivered micro-batch
    lands nothing (replay-tested in tests/test_streaming.py).

    Scale notes: per-batch cost is increment-sized — assignment is
    |batch| × n_lists JVM folds inside the scan stage, the idempotence
    guard reads one id column, and the append only adds files under
    each cell directory, never rewriting existing index files. Index
    quality drifts as the corpus distribution drifts away from the
    trained centroids — re-running `ivf_index` periodically is a
    REBUILD (new index version), deliberately not part of the
    per-batch path.
    """
    from stock_market_etl_spark.operators.similarity import assign_cells

    out_cols = list(stream_vecs.columns)
    spark0 = stream_vecs.sparkSession
    # static per index version: read once at sink setup, reuse across
    # micro-batches (the artifact `write_ivf_index` laid down)
    centers_df = spark0.read.parquet(f"{index_path}/centroids")
    cells_path = f"{index_path}/cells"

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        # missing cells table ⇒ bootstrap; other read errors retry
        # (the shared `_fresh_minus_landed` seam, review r15)
        fresh = _fresh_minus_landed(
            batch_df.dropDuplicates([id_col]), cells_path, id_col
        )
        assigned = assign_cells(fresh, centers_df, vec_col=vec_col)
        assigned.select(*out_cols, "__cell").write.mode(
            "append"
        ).partitionBy("__cell").parquet(cells_path)

    q = (
        stream_vecs.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def substring_gate_sink(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    index_path: str,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming SUBSTRING-DEDUP gate — the suffix-ladder's ingest
    face (x71 flag → x72 cut, run on arrival against the b25
    materialized window index): each arriving micro-batch is flagged
    with `exact_substring_spans_incremental(corpus_index=…)` (batch
    windows vs the frozen corpus release PLUS batch-internal
    duplication — the incremental contract), its flagged spans are
    CUT (`dedup.cut_spans`, every-copy stance), and the cleaned
    ``(id, clean_text)`` rows APPEND to ``out_path``. The corpus
    never re-hashes; each batch pays its own windows + one hash-grain
    join against the artifact.

    Exactly-once at doc-id grain by the `ivf_append_sink` algebra:
    the batch anti-joins on ``id_col`` against ids already landed, so
    a redelivered micro-batch lands nothing (replay-tested in
    tests/test_streaming.py).

    Release cadence contract: the index is a FROZEN corpus release —
    duplication across two stream batches is visible only to the
    later batch if the index is re-released in between
    (`dedup.merge_window_index` folds new docs in at increment cost;
    merged ≡ rebuilt is pinned in tests). Maintaining the index
    inside the per-batch path is deliberately out: the artifact
    overwrite is not atomic with the data append, and a crash between
    the two would double-count a batch's windows on retry — the same
    reason `ivf_append_sink` treats centroid refits as rebuilds."""
    from stock_market_etl_spark.operators.dedup import (
        exact_substring_spans_incremental,
        read_window_index,
    )

    # static per index release: read once at sink setup (b25 artifact)
    index, built_k = read_window_index(stream_docs.sparkSession, index_path)

    def flag_spans(fresh: DataFrame) -> DataFrame:
        return exact_substring_spans_incremental(
            None,
            fresh,
            k=built_k,
            min_docs=min_docs,
            text_col=text_col,
            id_col=id_col,
            corpus_index=index,
            built_k=built_k,
        )

    return _span_gate_sink(
        stream_docs, out_path, checkpoint, flag_spans, text_col, id_col
    )


def _fresh_minus_landed(
    fresh: DataFrame, out_path: str, id_col: str
) -> DataFrame:
    """The exactly-once-at-id-grain seam shared by every gate/append
    sink (extracted r15 — it existed inline in `_span_gate_sink`,
    `ivf_append_sink`, and the embedding gate would have copied it):
    anti-join ids already landed at ``out_path`` so a redelivered
    micro-batch lands nothing. Missing out table ⇒ bootstrap (first
    batch) via `_read_if_exists`."""
    landed = _read_if_exists(fresh.sparkSession, out_path)
    if landed is None:
        return fresh
    return fresh.join(landed.select(id_col), id_col, "left_anti")


def _span_gate_sink(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    flag_spans,
    text_col: str,
    id_col: str,
):
    """The shared flag-and-cut streaming gate (review r13 — the
    bootstrap/anti-join/cut/append algebra existed verbatim in both
    span gates; a fix to the error-class matching or the exactly-once
    seam must land ONCE): each arriving micro-batch deduplicates on
    ``id_col``, anti-joins ids already landed (exactly-once at doc-id
    grain via `_fresh_minus_landed`, the `ivf_append_sink` algebra —
    a redelivered micro-batch lands nothing), gets its spans from
    ``flag_spans(fresh)`` (the one seam the public sinks differ in),
    and APPENDS the `cut_spans` result to ``out_path``."""
    from stock_market_etl_spark.operators.dedup import cut_spans

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fresh = _fresh_minus_landed(
            batch_df.dropDuplicates([id_col]), out_path, id_col
        )
        cut_spans(
            fresh, flag_spans(fresh), text_col=text_col, id_col=id_col
        ).write.mode("append").parquet(out_path)

    q = (
        stream_docs.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def decontamination_gate_sink(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    index_path: str,
    min_ref_docs: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming TRAIN-TEST DECONTAMINATION gate — x84 run on arrival
    (`substring_gate_sink`'s lifecycle with `contaminated_spans`'s
    flag condition): each arriving training micro-batch is flagged
    against the FROZEN eval-split window index (a b25
    `write_window_index` artifact — write-once PER RELEASE: a new
    eval release folds in at increment cost via
    `dedup.merge_window_index` and publishes as the NEXT frozen
    release with `dedup.publish_window_index`, never mutating the one
    a running gate reads — the multi-release lifecycle pinned in
    tests/test_streaming.py::
    test_decontamination_multi_release_lifecycle), flagged
    spans are CUT, and the cleaned ``(id, clean_text)`` rows APPEND
    to ``out_path``. Presence-in-reference is the whole condition:
    batch-internal duplication lands untouched (dedup is the n19
    gate's job; chain the two sinks for both), which also means the
    gate is stateless across batches — no cross-batch count can
    change a verdict, so redelivery and batch order can never flip a
    cut decision.

    Exactly-once at doc-id grain by the `ivf_append_sink` algebra
    (via `_span_gate_sink`, the shared flag-and-cut gate): the batch
    anti-joins on ``id_col`` against ids already landed, so a
    redelivered micro-batch lands nothing (replay-tested in
    tests/test_streaming.py)."""
    from stock_market_etl_spark.operators.dedup import (
        contaminated_spans,
        read_window_index,
    )

    # static per release: the eval index reads once at sink setup
    index, built_k = read_window_index(stream_docs.sparkSession, index_path)

    def flag_spans(fresh: DataFrame) -> DataFrame:
        return contaminated_spans(
            None,
            fresh,
            k=built_k,
            min_ref_docs=min_ref_docs,
            text_col=text_col,
            id_col=id_col,
            reference_index=index,
            built_k=built_k,
        )

    return _span_gate_sink(
        stream_docs, out_path, checkpoint, flag_spans, text_col, id_col
    )


def bloom_gate_sink(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    bloom_index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming decontamination gate at the BLOOM tier — x88 run on
    arrival (`decontamination_gate_sink`'s lifecycle with the
    memory-bounded flag path): each arriving training micro-batch
    flags spans through `bloom_contaminated_spans` against a FROZEN
    `write_bloom_index` release (loaded ONCE at sink setup — m/8
    bytes, no join in the flag path, the eval corpus never appears),
    flagged spans are CUT, and the cleaned rows APPEND. Conservative
    by construction (flags ⊇ the exact n21 gate's, the safe
    direction); a new eval release folds in via `merge_window_bloom`
    at increment cost and re-publishes as the NEXT frozen release —
    never mutating the one a running gate reads. Stateless across
    batches and exactly-once at doc-id grain via the shared
    `_span_gate_sink` algebra (same redelivery/bootstrap contracts
    as n19/n21)."""
    from stock_market_etl_spark.operators.dedup import (
        bloom_contaminated_spans,
        read_bloom_index,
    )

    # static per release: the frozen filter reads once at sink setup
    bloom = read_bloom_index(stream_docs.sparkSession, bloom_index_path)

    def flag_spans(fresh: DataFrame) -> DataFrame:
        return bloom_contaminated_spans(
            bloom, fresh, k=bloom[4], text_col=text_col, id_col=id_col
        )

    return _span_gate_sink(
        stream_docs, out_path, checkpoint, flag_spans, text_col, id_col
    )


def embedding_gate_sink(
    stream_vecs: DataFrame,
    out_path: str,
    checkpoint: str,
    vector_index_path: str,
    bucket_index_path: str | None = None,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming SEMANTIC decontamination gate — x85 run on arrival
    (the n21 lifecycle applied to the embedding tier, closing the
    last streamed-gate symmetry gap: every contamination rung now
    gates on ingest): each arriving training micro-batch of vectors
    is verdicted against the FROZEN eval vector artifact (a b27
    `write_embedding_index` / `publish_embedding_index` release —
    write-once per release, a new eval release folds in at increment
    cost and publishes as the NEXT release, never mutating the one a
    running gate reads), contaminated vectors (max cosine ≥
    ``threshold`` to any eval vector) are DROPPED, and the kept rows
    land as ``(id, nearest_eval_id, max_cosine)`` — the audit-grain
    gate record (the vector itself re-joins by id downstream;
    landing the evidence keeps the table oracle-comparable, the x26
    audit stance).

    Pass ``bucket_index_path`` (a b28 `write_lsh_buckets` release of
    the SAME vector artifact) to probe through the ANN tier: the
    batch pays its own bucketing only and the eval side is two
    parquet scans with zero compute — the 100 TB shape. Candidate
    semantics then apply: a vector with NO bucket-close eval
    candidate is clean by construction and lands with NULL evidence
    columns (it never met an eval vector to be scored against).

    Stateless across batches (presence-in-frozen-reference is the
    whole condition — no cross-batch count can flip a verdict), so
    batch order and redelivery can never change a decision;
    exactly-once at id grain via `_fresh_minus_landed`."""
    from stock_market_etl_spark.operators.similarity import (
        embedding_contamination_ann_incremental,
        embedding_contamination_incremental,
        read_embedding_index,
        read_lsh_buckets,
    )

    spark = stream_vecs.sparkSession
    # static per release: both artifacts read once at sink setup
    index, built_dim = read_embedding_index(spark, vector_index_path)
    buckets = params = None
    if bucket_index_path is not None:
        buckets, params = read_lsh_buckets(spark, bucket_index_path)
        if params[0] != built_dim:
            raise ValueError(
                f"bucket index at {bucket_index_path} was built at "
                f"dim={params[0]} but the vector index at "
                f"{vector_index_path} holds dim={built_dim} — the "
                "artifacts belong to different releases; regenerate "
                "the buckets from this vector release"
            )

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # persist: fresh feeds the verdict AND the absent-id
        # anti-join (both tiers); without it each consumer re-runs
        # dropDuplicates — which is NONDETERMINISTIC in which
        # duplicate survives, so two evaluations could score
        # different copies of the same id and land a contaminated
        # row as "kept" (review r15)
        fresh = _fresh_minus_landed(
            batch_df.dropDuplicates([id_col]), out_path, id_col
        ).persist()
        try:
            if buckets is None:
                verdict = embedding_contamination_incremental(
                    index,
                    fresh,
                    threshold=threshold,
                    built_dim=built_dim,
                    id_col=id_col,
                    vec_col=vec_col,
                )
            else:
                verdict = embedding_contamination_ann_incremental(
                    index,
                    buckets,
                    fresh,
                    params,
                    threshold=threshold,
                    id_col=id_col,
                    vec_col=vec_col,
                    persist_train=False,  # batch dies with the call;
                    # a per-batch persist would leak blocks forever
                    # (review r15) — recomputation reads `fresh`
                )
            # ONE evaluation of the verdict DAG per batch: kept =
            # the verdict's own non-contaminated rows PLUS every
            # fresh id absent from the verdict, landed with NULL
            # evidence. The absent-id union runs on BOTH tiers
            # (review r15 pass 3): on the ANN tier it is the
            # candidate-free rows (clean by construction); on the
            # exact tier it is normally empty — but an EMPTY eval
            # release (a legal bootstrap artifact) yields an empty
            # verdict, and deriving kept only from the verdict would
            # silently drop every clean row forever (the anti-join
            # re-drops them on redelivery). Deriving everything from
            # one persisted verdict (not a second evaluation of the
            # probe) is what makes the landed table a pure function
            # of one verdict.
            verdict = verdict.persist()
            try:
                # verdict keys on the literal "vec_id" output name
                # (contamination_from_pairs' audit schema); NULL
                # evidence is cast to the VERDICT's own types — a
                # hardcoded bigint would make unionByName coerce (or
                # crash, under ANSI) non-bigint id columns (review
                # r15 pass 3)
                out = verdict.filter(~F.col("contaminated")).select(
                    F.col("vec_id").alias(id_col),
                    "nearest_eval_id",
                    "max_cosine",
                )
                noverdict = (
                    fresh.select(id_col)
                    .join(
                        verdict.select(F.col("vec_id").alias(id_col)),
                        id_col,
                        "left_anti",
                    )
                    .withColumn(
                        "nearest_eval_id",
                        F.lit(None).cast(
                            verdict.schema["nearest_eval_id"].dataType
                        ),
                    )
                    .withColumn(
                        "max_cosine",
                        F.lit(None).cast(
                            verdict.schema["max_cosine"].dataType
                        ),
                    )
                )
                out.unionByName(noverdict).write.mode(
                    "append"
                ).parquet(out_path)
            finally:
                verdict.unpersist()
        finally:
            fresh.unpersist()

    q = (
        stream_vecs.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def daily_rollup(events: DataFrame) -> DataFrame:
    """The continuous aggregate's state shape: per-(user, day)
    mergeable state (count, sum, min, max) — shared by the n17
    streaming partial writer, its read-side merge, and the l6 batch
    IVM twin so the state algebra can't drift between them."""
    return events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def agg_partials_sink(
    stream_df: DataFrame, lake_path: str, checkpoint: str
) -> None:
    """Streaming CONTINUOUS AGGREGATE with idempotent partials: each
    micro-batch writes its own daily_rollup under ``batch_id=N``
    (OVERWRITE — a redelivered batch replaces its own partials
    byte-for-byte, b14's exactly-once move applied to aggregate
    state), and the read side merges partials by state arithmetic
    (`read_agg_state`). No micro-batch ever reads or rewrites another
    batch's state — contrast a read-modify-write merge, which at
    100 TB serializes every batch behind a state-table scan. The
    partial count grows with batch count, so a compaction pass
    (b16's move, or l6's merge_agg_state) periodically folds history
    — partials + merge + compaction IS the continuous-aggregate
    contract."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        daily_rollup(batch_df).write.mode("overwrite").parquet(
            os.path.join(lake_path, f"batch_id={batch_id}")
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_agg_state(spark: SparkSession, lake_path: str) -> DataFrame:
    """Merge n17's per-batch partials into current state: counts/sums
    add, min/max fold — the same algebra as pipeline.merge_agg_state,
    expressed as one grouped aggregate over the partial rows (state
    grain × batches, never raw events)."""
    partials = spark.read.parquet(lake_path)
    return partials.groupBy("user_id", "day").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def view_purchase_join(events: DataFrame, max_lag: str = "1 hour") -> DataFrame:
    """Stream-stream inner join: each purchase matched to every view by
    the same user in the preceding ``max_lag`` (attribution). The one
    §N capability with no batch-side analogue in the reference at all —
    its loader only ever joins a stream to a static watermark table
    (`scripts/load_stock_metrics.py:77`).

    Both sides carry watermarks and the join condition bounds buy_ts
    relative to view_ts, so each side's buffered state is evicted once
    the other side's watermark passes the bound — state stays
    O(watermark window), not O(stream). On a batch DataFrame
    `withWatermark` is a no-op and the identical expression is the
    parity twin (and the DuckDB oracle query).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("buy_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
            F.round("value", 6).alias("buy_value"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    joined = views.join(
        buys,
        (F.col("user_id") == F.col("buy_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag}")),
        "inner",
    )
    return joined.select(
        "user_id", "view_id", "buy_id", "view_ts", "buy_ts", "buy_value"
    )


def view_purchase_left_join(events: DataFrame, max_lag: str = "1 hour") -> DataFrame:
    """Left-outer stream-stream join: every view, with its attributed
    purchase columns null when no same-user purchase follows within
    ``max_lag`` (abandonment detection). The outer semantics are where
    watermarks stop being an optimization and become part of the
    MEANING: a null match can only be emitted once the purchase-side
    watermark proves no match can still arrive, so unmatched rows
    stream out with exactly that delay — and rows inside the final
    horizon at shutdown are still undecided (the parity test compares
    the watermark-decided region).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("buy_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    joined = views.join(
        buys,
        (F.col("user_id") == F.col("buy_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag}")),
        "left_outer",
    )
    return joined.select("user_id", "view_id", "view_ts", "buy_id", "buy_ts")


def attributed_purchases_hourly(events: DataFrame) -> DataFrame:
    """Chained stateful operators: a tumbling-window count DOWNSTREAM
    of the stream-stream attribution join — two stateful stages in one
    streaming query (join state + window state), which Spark only
    supports with watermarks propagating through the join. The payoff
    is fusing what would otherwise be two jobs with an intermediate
    topic/table into one exactly-once pipeline.

    Counts attributed (view→purchase) pairs per user per purchase
    hour; identical expression runs in batch as the oracle twin.
    """
    j = view_purchase_join(events)
    return (
        j.groupBy(F.window("buy_ts", "1 hour"), F.col("user_id"))
        .agg(F.count("*").alias("n_attributed"))
        .select(
            F.col("window.start").alias("win_start"),
            "user_id",
            "n_attributed",
        )
    )


def observe_stream_audit(
    stream_df: DataFrame,
    keys: tuple[str, ...],
    watermark_col: str | None = None,
    name: str = "audit",
) -> DataFrame:
    """Streaming twin of ``quality.observe_audit``: attach the K3/L1
    audit metrics to a stream by NAME (the ``Observation`` handle class
    is batch-only; named observations are the streaming API). Each
    micro-batch's metrics arrive in its ``StreamingQueryProgress.
    observedMetrics[name]`` — counters are per-batch and additive, the
    watermark max is a running per-batch max — so an ingest pipeline
    gets its audit trail from the SAME job that ingests, with no
    second pass over the stream (the 100 TB rule k5 proves in batch).
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in keys:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    if watermark_col is not None:
        metrics.append(F.max(watermark_col).alias(f"max_{watermark_col}"))
    return stream_df.observe(name, *metrics)


def serving_totals(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running totals — the serving-table shape
    for `jdbc_serving_sink`. Expressed so the identical transform runs
    in batch mode (parity contract). No watermark: the serving table
    covers all time, so every key's state stays live (key cardinality
    = |users| × |event types|, the serving table's own size — state is
    as bounded as the table it feeds)."""
    return events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def jdbc_serving_sink(
    stream_agg: DataFrame,
    url: str,
    table: str,
    keys: tuple[str, ...],
    checkpoint: str,
    properties: dict | None = None,
):
    """Streaming → relational serving: drain an UPDATE-mode aggregated
    stream into a JDBC table via per-batch key-grain upsert — the
    streaming lift of the reference's serving load
    (`scripts/load_stock_metrics.py:57-89`, DELETE today + insert).

    Each micro-batch emits only the keys whose running totals changed
    (update mode); `jdbc_upsert` delete-then-appends exactly those
    keys. End-state correctness needs no exactly-once delivery:
    at-least-once foreachBatch + idempotent key-grain upsert ⇒ the
    serving table converges to the stream state even across redelivery
    (a replayed batch re-writes the same totals — the state store, not
    the batch, owns the numbers). The per-batch key set is an
    increment (changed keys only), so `jdbc_upsert`'s bounded
    driver-side DELETE assumption holds by construction."""
    from stock_market_etl_spark.sinks import jdbc_table_exists, jdbc_upsert

    def serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if jdbc_table_exists(spark, url, table, properties):
            jdbc_upsert(batch_df, url, table, keys, properties)
        else:
            # first batch bootstraps the serving table; the metadata
            # probe (not a read attempt) keeps redelivered batch 0 on
            # the upsert path — a wrong guess here would double-append.
            # String KEY columns get explicit VARCHAR DDL: Spark's
            # default StringType mapping is CLOB on Derby (TEXT-ish
            # elsewhere), and CLOB cannot sit in the upsert's
            # `key = ?` comparison.
            str_keys = [
                f.name
                for f in batch_df.schema.fields
                if f.name in keys and f.dataType.typeName() == "string"
            ]
            writer = batch_df.write.mode("append")
            if str_keys:
                writer = writer.option(
                    "createTableColumnTypes",
                    ", ".join(f"{k} VARCHAR(512)" for k in str_keys),
                )
            writer.jdbc(url, table, properties=properties or {})

    q = (
        stream_agg.writeStream.foreachBatch(serve_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def snapshot_lake_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    stat_columns: list[str] | None = None,
    legacy_txn_compat: bool = False,
) -> None:
    """Streaming → MANIFEST-VERSIONED lake: every micro-batch commits
    as its own snapshot (`io.commit_snapshot` with the batch id as the
    idempotency txn), marrying b14's exactly-once discipline with the
    b18/b19 snapshot family — the streaming lakehouse ingest shape:

    - exactly-once from at-least-once: a redelivered batch's txn id is
      already in a manifest, so the re-commit returns the existing
      version without writing a byte (a crashed commit left no
      manifest, so ITS retry re-commits cleanly — orphans are
      vacuum's job). Txn ids are scoped by a hash of the checkpoint
      location (Delta keys txn identity on (appId, version) for the
      same reason): two different streaming queries writing one table,
      or one query restarted with a FRESH checkpoint (batch ids reset
      to 0), get distinct txn namespaces instead of silently colliding
      with already-committed ids. Corollary: exactly-once holds across
      restarts only while the checkpoint directory is kept — wiping it
      makes the next run a new producer, exactly as in Delta.
      ``legacy_txn_compat=True`` is the ONE-TIME migration step for a
      producer resuming its own pre-format-change checkpoint on a
      table with bare 'stream-batch-{id}' history (see the in-batch
      comment); leave it False everywhere else — a new producer with
      it on would have its first batches swallowed by another
      producer's legacy ids;
    - every batch boundary is a time-travel point: version N re-reads
      byte-stably forever, and `read_increment(N-1, N)` IS batch N —
      downstream CDC consumers pin the last version they processed
      and read only new files, no timestamp column, no rescan;
    - commits are O(batch files) metadata; the table never rewrites.

    ``stat_columns`` opts the table into manifest-level data skipping
    (`io.commit_snapshot(stat_columns=…)`): the FIRST batch creates
    the table recording per-file footer min/max for those columns and
    every later commit inherits the column set, so
    `read_snapshot(predicate=…)` / `read_increment(predicate=…)`
    prune files on a stream-fed table exactly as on a batch-built one
    — the streaming half of the b23 lakehouse piece.

    Contrast `lake_batch_sink` (per-batch-directory overwrite: same
    exactly-once guarantee, no version history) — use this form when
    downstream needs pinned releases or incremental reads."""

    # Stable per-producer namespace: the checkpoint path identifies the
    # logical streaming query across restarts (its offsets/commit log
    # lives there), so it is exactly the scope batch-id idempotence is
    # valid in. StreamingQuery.id would also work but is only known
    # after .start(); the checkpoint hash is available up front and
    # survives restarts of the same checkpoint.
    ns = hashlib.sha256(os.path.abspath(checkpoint).encode()).hexdigest()[:12]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from stock_market_etl_spark.io import _txn_version, commit_snapshot

        # OPT-IN migration shim (``legacy_txn_compat``): tables written
        # before txn ids were checkpoint-scoped committed batches as
        # 'stream-batch-{id}'. A producer RESUMING ITS OWN pre-change
        # checkpoint must pass True for its first post-upgrade run, or
        # the replayed last batch commits as duplicate rows under the
        # new scoped id. It must stay False (the default) for any NEW
        # producer: bare legacy ids carry no namespace, so a new
        # stream's batches 0..N would collide with another producer's
        # history and be silently swallowed — and the probe itself
        # costs an O(versions) manifest scan per batch whenever the
        # marker fast-path misses, a price only the migration window
        # should pay.
        if (
            legacy_txn_compat
            and _txn_version(table_path, f"stream-batch-{batch_id}")
            is not None
        ):
            return
        commit_snapshot(
            batch_df.sparkSession,
            table_path,
            batch_df,
            txn_id=f"stream-{ns}-batch-{batch_id}",
            stat_columns=stat_columns,
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def lake_batch_sink(
    stream_df: DataFrame,
    lake_path: str,
    checkpoint: str,
    date_col: str = "ts",
) -> None:
    """Exactly-once streaming → partitioned-lake writer: each
    micro-batch lands under its own ``batch_id=N`` directory (inner
    partitioning by event date) with OVERWRITE mode, so a redelivered
    batch replaces its own prior output byte-for-byte instead of
    double-appending — exactly-once lake state from at-least-once
    delivery, with no lake-wide read-modify-write (contrast
    `upsert_sink`, which pays an anti-join against the whole lake per
    batch; this sink is the bulk-ingest shape for append-only event
    feeds at 100 TB). Readers see ``batch_id`` and the date as
    partition columns; date-range queries prune to matching
    directories across every batch."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("event_date", F.to_date(date_col))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(os.path.join(lake_path, f"batch_id={batch_id}"))
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drift_monitor_sink(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    baseline_path: str,
    text_col: str = "text",
    group_col: str = "source",
) -> None:
    """Streaming DRIFT MONITOR — x80's PSI gate run on arrival against
    a frozen baseline release (the b25 → n19 lifecycle applied to
    score distributions): each micro-batch's documents are
    quality-scored, binned, and compared per-source against the
    materialized `write_score_histogram` artifact
    (`importance.psi_vs_baseline`); the monitor rows
    (source, psi, drift_flag, n_docs) land under ``batch_id=N``.

    Exactly-once by the `agg_partials_sink` move, not the anti-join
    one: monitor rows are per-batch FACTS keyed by batch id, so each
    batch overwrites its OWN ``batch_id=N`` subdirectory directly —
    conf-independent (a `partitionBy` overwrite would truncate the
    whole table under the default static `partitionOverwriteMode`;
    review r12) — and a redelivered micro-batch replaces its rows
    byte-for-byte instead of appending duplicates. Partition
    discovery surfaces ``batch_id`` as a column on read.

    Release cadence contract: the baseline is a FROZEN release — the
    sink adopts the bin width RECORDED in the artifact's meta
    sidecar, so probe/build widths cannot diverge (callers asserting
    a specific width pass ``bins=`` to `read_score_histogram`
    directly and get the loud refusal). Refreshing the baseline is a
    rebuild — maintaining it inside the per-batch path would make
    PSI self-referential (every batch folded in drags the baseline
    toward the drift it should be flagging)."""
    import os

    from stock_market_etl_spark.operators.importance import (
        psi_vs_baseline,
        read_score_histogram,
    )
    from stock_market_etl_spark.operators.text import quality_score

    spark0 = stream_docs.sparkSession
    baseline, bins = read_score_histogram(spark0, baseline_path)
    # the artifact is tiny (B × |groups| rows) and frozen by
    # contract: cache it so a long-running monitor's per-batch join
    # doesn't re-list and re-read the parquet every trigger
    baseline = baseline.cache()

    def monitor_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = batch_df.select(
            F.col(group_col),
            F.round(quality_score(F.col(text_col)), 6).alias("__q"),
        )
        psi_vs_baseline(
            scored, baseline, "__q", group_col, bins
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    q = (
        stream_docs.writeStream.foreachBatch(monitor_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
