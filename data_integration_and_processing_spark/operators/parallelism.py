"""Scan-parallelism guard for compute-heavy per-row operators.

A parquet scan parallelizes at row-group granularity, so a small corpus
written as one file with one row group (exactly what the fixture's
``documents`` table is) scans as ONE task — and a shingle/signature/regex
pass over it runs on a single core of the whole cluster. At production
scale inputs arrive in thousands of row groups and this guard is a no-op;
it exists for the general "small but hot table feeding expensive per-row
compute" case, where one tiny shuffle buys full-cluster fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * min_factor`` partitions
    — but ONLY when the plan currently has fewer: the common case (a big
    scan already wider than the core count) passes through untouched, so
    no shuffle is ever added at scale. Use upstream of compute-heavy
    per-row stages (shingling, signatures, regex packs); do NOT use above
    order-sensitive float aggregations — repartitioning reorders rows.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
