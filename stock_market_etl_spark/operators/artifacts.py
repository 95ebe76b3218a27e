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
        # getCondition is the Spark 4 name; getErrorClass the
        # deprecated 3.x one (it warns on call) — being the single
        # home of this classification means absorbing that drift
        # here (review r15, pass 5)
        getter = getattr(exc, "getCondition", None) or getattr(
            exc, "getErrorClass", None
        )
        cond = (getter() if getter is not None else "") or str(exc)
        if (
            "PATH_NOT_FOUND" not in cond
            and "Path does not exist" not in str(exc)
        ):
            raise
        return None


def read_required_meta(
    spark: SparkSession,
    path: str,
    fields: tuple[str, ...],
    what: str,
    rebuild_with: str,
    required: bool = True,
) -> tuple[int, ...] | None:
    """Load and validate a ``path/meta`` identity sidecar as a tuple
    of ints in ``fields`` order — the one home of the malformed-meta
    classification for the r15 multi-dir artifacts (three readers
    carried the same collect → one-row → no-null shape inline; a
    change to the classification must land once, the `read_if_exists`
    rationale). A missing, empty, multi-row, or null-field sidecar —
    what a crashed (re)build leaves behind — raises the family's
    loud ValueError naming ``what`` and the rebuild seam. With
    ``required=False`` an ABSENT meta dir returns None instead (the
    IVF streaming-maintained layout) while a present-but-malformed
    one still refuses."""
    meta = read_if_exists(spark, f"{path}/meta")
    if meta is None and not required:
        return None
    rows = [] if meta is None else meta.collect()
    if len(rows) != 1 or any(rows[0][f] is None for f in fields):
        raise ValueError(
            f"{what} at {path} has a missing or malformed meta "
            "sidecar — a (re)build crashed between its data and "
            "meta writes, so the data dirs may be from different "
            f"builds; rebuild with {rebuild_with}"
        )
    return tuple(int(rows[0][f]) for f in fields)


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
