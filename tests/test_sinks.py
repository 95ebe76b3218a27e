"""Sink tests (SURVEY §2.B3-B6): warehouse-table round-trips, predicate
delete semantics, CSV snapshot. JDBC wrappers are call-shape only (no
database in this container).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from stock_market_etl_spark import sinks
from stock_market_etl_spark.io import load_table


def _dim(spark, sf_smoke):
    return load_table(spark, sf_smoke, "nation")


def test_save_append_and_overwrite(spark, sf_smoke, tmp_path):
    name = f"t_{uuid.uuid4().hex[:8]}"
    dim = _dim(spark, sf_smoke)
    sinks.save_serving_table(dim, name, str(tmp_path / "t1"))
    assert spark.table(name).count() == dim.count()
    sinks.save_serving_table(dim, name, mode="append")
    assert spark.table(name).count() == 2 * dim.count()
    spark.sql(f"DROP TABLE {name}")


def test_delete_where(spark, sf_smoke, tmp_path):
    name = f"t_{uuid.uuid4().hex[:8]}"
    dim = _dim(spark, sf_smoke)
    sinks.save_serving_table(dim, name, str(tmp_path / "t2"))
    n_region0 = dim.filter("n_regionkey = 0").count()
    assert n_region0 > 0
    sinks.delete_where(spark, name, "n_regionkey = 0")
    out = spark.table(name)
    assert out.filter("n_regionkey = 0").count() == 0
    assert out.count() == dim.count() - n_region0
    spark.sql(f"DROP TABLE {name}")


def test_csv_snapshot_roundtrip(spark, sf_smoke, tmp_path):
    dim = _dim(spark, sf_smoke)
    path = str(tmp_path / "snap")
    sinks.csv_snapshot(dim, path)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == dim.count()
    assert set(back.columns) == set(dim.columns)
