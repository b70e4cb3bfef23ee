"""Storage-layout scale features: bucketed co-located joins and partition
pruning — the two levers that remove shuffle/scan cost before any query
runs. Verified by inspecting the physical plan, not just results."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from data_integration_and_processing_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def scratch(spark):
    path = f"/tmp/diaps_layout_{uuid.uuid4().hex[:8]}"
    yield path
    for t in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(path, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, scratch):
    """Both sides bucketed by the join key => sort-merge join reads
    co-located buckets directly; the plan contains no Exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (l.write.mode("overwrite").option("path", f"{scratch}/li_bucketed")
     .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed"))
    (o.write.mode("overwrite").option("path", f"{scratch}/ord_bucketed")
     .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed"))

    lb = spark.table("li_bucketed")
    ob = spark.table("ord_bucketed")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderpriority"
    )
    # AQE can hide the shape until execution: force broadcast off so the
    # bucket-co-located sort-merge path is what gets planned.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == l.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partitioned_write_prunes_scan(spark, sf_dir, scratch):
    """Writing partitioned by a filter column turns the filter into
    directory pruning: the scan's PartitionFilters carries the predicate
    and only matching partitions are read."""
    e = load_table(spark, sf_dir, "events")
    out = f"{scratch}/events_by_type"
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)

    one_type = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(one_type)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    expected = e.filter(F.col("event_type") == "click").count()
    assert one_type.count() == expected


class TestZOrderLayout:
    """Z-order writes must make row-group min/max pruning effective on ALL
    indexed dimensions, where a single-column sort helps only its own
    column. Measured from actual parquet footer statistics, not plans."""

    @staticmethod
    def _skip_fraction(root: str, col: str, lo: int, hi: int) -> float:
        import glob

        import pyarrow.parquet as pq

        total = kept = 0
        for f in glob.glob(f"{root}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                stats = {
                    g.column(i).path_in_schema: g.column(i).statistics
                    for i in range(g.num_columns)
                }
                s = stats[col]
                total += 1
                if not (s.max < lo or s.min > hi):
                    kept += 1
        return 1 - kept / total

    def test_zorder_prunes_on_both_dimensions(self, spark, sf_dir, scratch):
        from data_integration_and_processing_spark.operators.layout import zorder_write

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_extendedprice"
        )
        zorder_write(li, f"{scratch}/li_z", by=["l_orderkey", "l_partkey"], n_files=16)
        (
            li.repartitionByRange(16, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite")
            .parquet(f"{scratch}/li_single")
        )
        max_ok = li.agg(F.max("l_orderkey")).first()[0]
        max_pk = li.agg(F.max("l_partkey")).first()[0]
        ok_range = (1, int(max_ok * 0.05))
        pk_range = (1, int(max_pk * 0.05))

        z_ok = self._skip_fraction(f"{scratch}/li_z", "l_orderkey", *ok_range)
        z_pk = self._skip_fraction(f"{scratch}/li_z", "l_partkey", *pk_range)
        s_ok = self._skip_fraction(f"{scratch}/li_single", "l_orderkey", *ok_range)
        s_pk = self._skip_fraction(f"{scratch}/li_single", "l_partkey", *pk_range)

        # single sort: near-perfect on its column, useless on the other
        assert s_ok >= 0.8
        assert s_pk == 0.0
        # z-order: substantial pruning on BOTH dimensions
        assert z_ok >= 0.4, f"z-order l_orderkey skip {z_ok}"
        assert z_pk >= 0.4, f"z-order l_partkey skip {z_pk}"

    def test_zorder_preserves_data(self, spark, sf_dir, scratch):
        from data_integration_and_processing_spark.operators.layout import zorder_write

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        zorder_write(li, f"{scratch}/li_z_rt", by=["l_orderkey", "l_partkey"], n_files=8)
        back = spark.read.parquet(f"{scratch}/li_z_rt")
        assert back.count() == li.count()
        assert back.exceptAll(li).isEmpty() and li.exceptAll(back).isEmpty()


def test_dynamic_partition_pruning_reaches_fact_scan(spark, sf_dir):
    """join_dynamic_partition_pruning must actually prune at runtime: the
    fact scan's PartitionFilters must carry a dynamicpruning subquery fed by
    the broadcast calendar dim, and the pruned plan must read only the
    matching quarter's directories."""
    from data_integration_and_processing_spark.queries.etl_parity import (
        join_dynamic_partition_pruning,
    )

    df = join_dynamic_partition_pruning(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result is the quarter only
    months = [r["month"] for r in df.collect()]
    assert months == [4, 5, 6]
