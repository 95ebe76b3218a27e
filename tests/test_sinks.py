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


def test_write_compacted_bounds_file_count(spark, sf_smoke, tmp_path):
    """A deliberately over-partitioned tiny frame must land in few
    files under REBALANCE (AQE coalesces the shuffle output), while the
    plain write emits one file per task."""
    import glob

    from stock_market_etl_spark import io as eio

    ev = load_table(spark, sf_smoke, "events").repartition(64)
    naive = str(tmp_path / "naive")
    ev.write.mode("overwrite").parquet(naive)
    n_naive = len(glob.glob(naive + "/*.parquet"))
    compacted = str(tmp_path / "compacted")
    eio.write_compacted(ev, compacted)
    n_comp = len(glob.glob(compacted + "/*.parquet"))
    assert n_naive >= 32  # the failure mode is real
    assert n_comp <= 4, n_comp  # ~1 MB of data -> a handful of files

    # partitioned form: rebalance keyed on the partition column
    parted = str(tmp_path / "parted")
    eio.write_compacted(
        ev.withColumn("etype", F.col("event_type")),
        parted,
        partition_cols=("etype",),
    )
    per_dir = {
        d: len(glob.glob(d + "/*.parquet"))
        for d in glob.glob(parted + "/etype=*")
    }
    assert per_dir and all(n <= 2 for n in per_dir.values()), per_dir
