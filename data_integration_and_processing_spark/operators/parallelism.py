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

from concurrent.futures import Future, ThreadPoolExecutor

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


def background_materialize(build) -> "Future[DataFrame]":
    """Run ``build()`` (plan construction INCLUDING any driver-side work —
    index model loads, bounded collects, numpy training) and its eager
    ``localCheckpoint`` on a driver worker thread. The §2.6 overlap pattern
    one level up from :func:`background_checkpoint`: use it when the arm's
    CONSTRUCTION is itself driver-heavy, so that work too runs while the
    foreground arm's jobs occupy the cluster. py4j is thread-safe (each
    thread gets its own gateway connection); concurrent jobs schedule FIFO."""
    pool = ThreadPoolExecutor(max_workers=1)
    try:
        return pool.submit(lambda: build().localCheckpoint(eager=True))
    finally:
        pool.shutdown(wait=False)


def background_checkpoint(df: DataFrame) -> "Future[DataFrame]":
    """Materialize ``df`` (eager ``localCheckpoint``) on a driver worker
    thread and return the Future, so the caller can keep building/driving
    the OTHER arm of a multi-arm plan meanwhile — the guide-§2.6
    overlap-independent-jobs pattern applied inside one query. Spark's
    scheduler runs concurrent jobs FIFO, so the background job backfills
    executor slots the foreground's driver-side stretches (model training,
    index loads, plan construction) leave idle. Call ``.result()`` before
    composing the checkpointed frame onward; exceptions re-raise there."""
    pool = ThreadPoolExecutor(max_workers=1)
    try:
        return pool.submit(lambda: df.localCheckpoint(eager=True))
    finally:
        pool.shutdown(wait=False)
