"""Distributed contiguous-ID assignment.

The naive form — ``row_number() OVER (ORDER BY ...)`` with no partition key
— forces every row through ONE task (Spark plans a global sort into a
single-partition window). This operator produces the identical numbering
with no single-task stage:

1. range-repartition on the order keys (partition i holds keys < partition
   i+1's — a shuffle Spark already knows how to do at any scale),
2. number rows *within* each partition (parallel windows keyed by
   ``spark_partition_id()``),
3. add each partition's cumulative row-count offset, computed from a
   partition-count aggregate that is tiny (one row per partition) and
   broadcast back.

Cost: one range shuffle + one broadcast join, both scale-safe. The result
is deterministic for unique order keys, so a SQL oracle can check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    start: int = 0,
) -> DataFrame:
    """Add ``id_col`` = ``start``, ``start+1``, ... in ``order_cols`` order,
    without a single-task global sort. Order keys must be unique for the
    numbering to be deterministic."""
    ranged = df.repartitionByRange(*order_cols).withColumn("_pid", F.spark_partition_id())
    # per-partition numbering runs in parallel: the window key is the
    # partition itself
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    numbered = ranged.withColumn("_rn", F.row_number().over(w))
    # one row per partition: cumulative offsets are a broadcast-size table
    offsets = (
        numbered.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, F.col("_offset") + F.col("_rn") - 1 + F.lit(start))
        .drop("_pid", "_rn", "_offset")
    )
