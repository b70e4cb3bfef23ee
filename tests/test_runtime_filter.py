"""Runtime bloom-filter join pruning — the shuffle-join analogue of
broadcast-side dynamic pruning.

At 100 TB a fact-fact join where one side carries a selective predicate
should not shuffle the unselective side in full: Spark builds a bloom
filter from the filtered (creation) side's join keys and applies it as a
`might_contain` semi-filter on the application side BEFORE its exchange,
cutting shuffle volume by the predicate's selectivity. The production
defaults gate injection on a 10 GB application-side scan, so the lever is
invisible at fixture scale unless the thresholds are lowered — which is
exactly what this test does to pin that the plan rewrite itself works.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_and_processing_spark.sources.tables import load_table

_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fixture tables are far below the production injection thresholds
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # force the shuffle-join path: broadcast joins get DPP/reused-exchange
    # pruning instead and never need the bloom filter
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)


def test_selective_dim_filter_injects_bloom_filter(spark, sf_dir, bloom_conf):
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized, f"no runtime bloom filter injected:\n{optimized}"
    # the filter is a pure reduction: results must equal the unfiltered plan
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        expected = {
            (r.o_orderpriority, r.n)
            for r in l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert {(r.o_orderpriority, r.n) for r in j.collect()} == expected


def test_unselective_join_skips_bloom_filter(spark, sf_dir, bloom_conf):
    """No predicate on either side => nothing to build a useful filter from;
    the optimizer must not pay the build cost."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in optimized
