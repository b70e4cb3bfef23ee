"""Table maintenance for parquet lakes: small-file compaction.

The small-files problem is the classic 100 TB failure mode — streaming
foreachBatch appends, per-trigger sinks, and over-partitioned writes leave
thousands of KB-sized files; every downstream scan then pays task-per-file
scheduling and footer-read overhead. Compaction rewrites a table (or one
hive partition of it) into size-targeted files:

- file count = ceil(total_bytes / target_file_bytes), derived from the
  files' actual on-disk size (no data pass);
- one `repartition(n)` round-robin shuffle -> uniformly sized outputs —
  coalesce() is cheaper but inherits input skew, exactly what compaction
  exists to remove;
- write to a sibling temp dir, then atomically swap directories so readers
  never observe a half-written table (the staging-table pattern from
  SURVEY.md's sink semantics, applied to files).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if not f.startswith(("_", ".")))
    return total


def _data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite the parquet table at ``path`` into ~``target_file_bytes``
    files (per hive partition when ``partition_by`` is given, preserving the
    partitioned layout). Returns {files_before, files_after, bytes}.

    Local-path implementation (os.walk + rename swap); on object stores the
    same plan runs against the FileSystem API, and table formats with a
    transaction log (Iceberg/Delta) replace the swap with a metadata commit.
    """
    before = _data_file_count(path)
    total = _dir_bytes(path)
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    if partition_by:
        # size-target per partition: repartition on the partition columns so
        # each hive dir is written by few tasks, then cap rows per file
        per_file = max(1, df.count() // n_files)
        writer = (
            df.repartition(*partition_by)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", per_file)
            .partitionBy(*partition_by)
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(tmp)

    swap = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, swap)
    os.rename(tmp, path)
    shutil.rmtree(swap)
    return {"files_before": before, "files_after": _data_file_count(path), "bytes": total}
