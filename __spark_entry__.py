"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; every named
query in ``queries()`` is cross-checked against ``oracle_sql()`` via
DuckDB (row-count + schema + order-insensitive value hash) at sf0.01.

The real surface lives in ``stock_market_etl_spark/catalog/``; this
module stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from stock_market_etl_spark.catalog import all_oracles, all_queries  # noqa: E402
from stock_market_etl_spark.session import prepare_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    prepare_session(spark)
    from stock_market_etl_spark.catalog.flagship import metrics_pipeline

    return metrics_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return all_oracles()
