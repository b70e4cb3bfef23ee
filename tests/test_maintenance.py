"""Small-file compaction: content-preserving, file-count-reducing, atomic."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.sources.maintenance import compact_parquet
from data_integration_and_processing_spark.sources.tables import load_table


def test_compaction_reduces_files_and_preserves_content(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shattered")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    # simulate streaming-append damage: 64 tiny files
    li.repartition(64).write.mode("overwrite").parquet(path)
    before = spark.read.parquet(path)
    before_rows = sorted(map(tuple, before.collect()))

    stats = compact_parquet(spark, path, target_file_bytes=8 << 20)
    assert stats["files_before"] == 64
    assert stats["files_after"] < stats["files_before"] / 4
    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.collect())) == before_rows


def test_compaction_keeps_hive_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "by_type")
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.repartition(40).write.mode("overwrite").partitionBy("event_type").parquet(path)
    stats = compact_parquet(
        spark, path, target_file_bytes=32 << 20, partition_by=["event_type"]
    )
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.parquet(path)
    # partition layout survives (pruned scan still possible)
    plan = (
        after.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert after.count() == e.count()
