"""SparkSession factory with scale-oriented defaults.

The reference engine is single-threaded pandas in one process
(``/root/reference/ClickHouseDatabase.py:118`` materializes whole tables via
``fetchall()``). Here every pipeline runs on a partitioned, lazily-planned
DataFrame; these session defaults are the ones we'd ship to a 1000-executor
cluster, only ``master`` and the shuffle-partition count differ locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-integration-and-processing-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults chosen for scale-out behavior:

    - **AQE on** (+ coalescing + skew-join): runtime re-planning fixes
      over-partitioned shuffles and skewed join keys without manual salting
      in the common case.
    - **Arrow on**: every pandas UDF / ``toPandas`` crosses the JVM boundary
      in columnar batches, not pickled rows.
    - **Broadcast threshold 64 MB**: dimension tables (region/nation/
      supplier/part at typical star-schema ratios) broadcast instead of
      shuffling the fact table.
    - ``shuffle_partitions`` defaults to ``SPARK_GRAFT_CPUS`` (local test
      rig) — on a real cluster leave it to AQE's coalescing with a high
      initial count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE merges post-shuffle partitions up to this floor BY BYTES; the
        # engine's hot reduce stages carry compute-dense array rows (hashed
        # shingle sets, embeddings, candidate-pair verify) whose per-row cost
        # is orders of magnitude above their byte size, and the default 1m
        # floor was measured collapsing those stages to 1-10 tasks at bench
        # scale (4.4s of dedup_chunk_neardup's 5.9s ran single-task). 64k
        # keeps small-byte/high-compute stages wide; at production volumes
        # partitions sit at the advisory size and the floor never binds.
        # Env-tunable so a deployment with byte-bound stages can restore 1m.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark's DataFrame-debugging wrapper sends the Python call site to
        # the JVM around EVERY DataFrame API call (a conf read + origin
        # set/clear = ~3 extra py4j round-trips per call, measured ~0.06s of
        # the 0.35s plan-construction time of the widest builders, paid by
        # every catalog query). The only cost of disabling it is that error
        # messages lose the Python-side call-site line; plans and results
        # are untouched. Env-tunable for debugging sessions.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUGGING", "false"),
        )
        # Python UDTFs evaluate via Arrow batches (ArrowEvalPythonUDTF)
        # instead of the pickled row-at-a-time BatchEvalPython path —
        # caught by scripts/plan_lint.py's PY_ROW_UDF rule
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI on (the Spark 4 default, and what any stock deployment runs):
        # every operator must be ANSI-clean — permissive per-row degradation
        # is expressed explicitly with try_cast/try_divide where a 100 TB
        # pipeline needs it, never by relying on session-wide wrap-around.
        # SPARK_GRAFT_ANSI=false restores the legacy permissive session.
        .config("spark.sql.ansi.enabled", os.environ.get("SPARK_GRAFT_ANSI", "true"))
        # local mode runs every executor thread inside the driver JVM, so
        # this is the whole memory budget; 8g showed broadcast-OOM cliffs in
        # heavy multi-persist sessions on the 50k-doc dedup probes
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
