"""Version/deployment-gated private-API shims.

Everything in this module is BEST-EFFORT by contract: each helper
detects whether the private surface it needs exists on this Spark
deployment (classic py4j vs Spark Connect, plan-shape drift across
releases) and degrades to a safe no-op when it doesn't. Callers must
never depend on a helper succeeding for correctness — only for
resource hygiene. This is the single place `._jdf` may appear in the
package (enforced by tests/test_no_private_api.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Drop a SUPERSEDED ``localCheckpoint``'s cached blocks now, not
    at GC time (N rounds of retained snapshots is a storage leak for
    iterative algorithms at scale). Safe only when the df is never
    read again — a truncated-lineage checkpoint cannot recompute.

    Gated: under Spark Connect the DataFrame has no ``_jdf`` and the
    helper returns ``False`` immediately (the server's ContextCleaner
    handles release at GC time); the same is true if the classic
    plan shape ever drifts (``queryExecution().analyzed().rdd()`` is
    the LogicalRDD's backing RDD in Spark 3.x/4.x). Returns ``True``
    only when the blocks were actually unpersisted.
    """
    jdf = getattr(df, "_jdf", None)  # absent under Spark Connect
    if jdf is None:
        return False
    try:
        jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:
        return False


def best_effort_delete(spark, *paths: str) -> None:
    """Recursively delete ``paths`` via the Hadoop FS API (so any
    scheme — file/hdfs/s3a — works), swallowing every failure: the
    publish-seam crash cleanup (ADVICE r14 + review r15). Callers
    must never depend on the delete for correctness — the artifact
    readers refuse half-written releases loudly either way; this
    only restores retry-to-same-path. Under Spark Connect there is
    no ``_jvm`` and the helper is a silent no-op (the documented
    manual recovery applies: delete the release dir, re-publish)."""
    for p in paths:
        try:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        except Exception:
            pass
