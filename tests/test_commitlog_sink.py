"""Custom Python streaming SINK: exactly-once commit-log protocol."""

from __future__ import annotations

import uuid

from data_integration_and_processing_spark.sources.commitlog_sink import (
    CommitLogDataSource,
    CommitLogStreamWriter,
    _AttemptFile,
    committed_batches,
    read_committed,
)


def _registered(spark):
    try:
        spark.dataSource.register(CommitLogDataSource)
    except Exception:  # noqa: BLE001
        pass
    return spark


def test_stream_lands_exactly_the_input(spark, sf_dir, tmp_path):
    import shutil

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id").limit(0)
    full = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    full.write.mode("overwrite").parquet(src)
    q = (
        _registered(spark)
        .readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(src)
        .writeStream.format("commitlog")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = read_committed(sink)
    got = sorted(int(r[0]) for r in rows)
    want = sorted(r["event_id"] for r in full.collect())
    assert got == want  # every row exactly once, across multiple batches
    assert len(committed_batches(sink)) >= 1
    # no stray attempts survive a clean run
    import glob

    assert not glob.glob(f"{sink}/_attempts/*.csv")
    shutil.rmtree(src, ignore_errors=True)


def test_redelivered_batch_is_discarded(tmp_path):
    sink = str(tmp_path / "sink")
    w = CommitLogStreamWriter({"path": sink})
    # first delivery of batch 7
    a1 = w.write(iter([(1, "a"), (2, "b")]))
    w.commit([a1], 7)
    assert committed_batches(sink) == [7]
    assert len(read_committed(sink)) == 2
    # crash-replay: the same batch id arrives again with fresh attempts
    a2 = w.write(iter([(1, "a"), (2, "b")]))
    w.commit([a2], 7)
    assert committed_batches(sink) == [7]
    assert len(read_committed(sink)) == 2  # NOT doubled
    # abort cleans attempts
    a3 = w.write(iter([(9, "z")]))
    w.abort([a3], 8)
    assert len(read_committed(sink)) == 2
