"""Shared seam helpers for the release-artifact family (window-hash
index, bloom bitmap, embedding vectors, LSH buckets — the
``path/{data, meta}`` layout every ``write_*_index`` /
``publish_*_index`` pair in this package produces).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


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
