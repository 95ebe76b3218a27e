"""Shared seam helpers for the release-artifact family (window-hash
index, bloom bitmap, embedding vectors, LSH buckets — the
``path/{data, meta}`` layout every ``write_*_index`` /
``publish_*_index`` pair in this package produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_if_exists(
    spark: SparkSession, path: str
) -> DataFrame | None:
    """Parquet read that returns None when the table does not exist
    yet (a bootstrap state) and RE-RAISES any other read error —
    swallowing a real failure would fork a parallel output (the
    upsert_sink policy). The single home of the PATH_NOT_FOUND
    classification (review r15 — it existed inline in four ingest
    sinks; a Spark error-class rename fixed in one copy would leave
    the others mis-classifying real read errors as bootstrap).
    Moved here from streaming/core so batch artifact readers can
    share it without importing the streaming layer."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" not in (
            getattr(exc, "getErrorClass", lambda: "")() or str(exc)
        ) and "Path does not exist" not in str(exc):
            raise
        return None


def invalidate_meta(
    spark: SparkSession, path: str, schema: str
) -> None:
    """Overwrite ``path/meta`` with a ZERO-row table of the family's
    meta schema — the FIRST step of an in-place (mode ``overwrite``)
    artifact rebuild (review r15). Data-before-meta ordering only
    yields the advertised loud refusal when a crash leaves meta
    ABSENT: an in-place rebuild that dies between the data and meta
    writes instead leaves the NEW data under the STALE meta, which
    the readers silently accept whenever the recorded identity
    happens to fit — e.g. a k=8 meta over a bitmap rebuilt at k=4
    with matching geometry probes pure noise (~fpp of clean text
    cut, every true leak passed unflagged). Emptying the sidecar
    before touching the data turns EVERY crash window of the rebuild
    into the readers' malformed-meta refusal; the final meta write
    restores validity. Publish seams (mode ``error``) don't need
    this: their data write refuses an existing release before
    anything is touched."""
    spark.createDataFrame([], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
