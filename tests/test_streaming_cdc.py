"""Streaming CDC replay must be independent of micro-batch boundaries and
delivery order: the seq-aware tombstone-retaining merge makes (sink ∪
batch) re-collapse associative, so any file/batch split yields the batch
cdc_apply result."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.plans.pipelines import cdc_apply
from data_integration_and_processing_spark.streaming.pipelines import run_streaming_cdc_apply


def _changelog(spark):
    rows = [
        (1, "a", 1, "I"),
        (1, "b", 4, "U"),   # final state for key 1
        (2, "x", 2, "I"),
        (2, None, 5, "D"),  # deleted
        (3, "m", 3, "I"),
        (3, None, 6, "D"),
        (3, "n", 7, "I"),   # delete-then-reinsert survives
    ]
    return spark.createDataFrame(rows, "k INT, v STRING, seq INT, op STRING")


def test_streaming_equals_batch_cdc(spark, tmp_path):
    log = _changelog(spark)
    streamed = run_streaming_cdc_apply(
        spark, log, key_cols=["k"], scratch_dir=str(tmp_path / "cdc")
    )
    batch = cdc_apply(log, key_cols=["k"], seq_col="seq", op_col="op")
    assert {(r.k, r.v) for r in streamed.collect()} == {(r.k, r.v) for r in batch.collect()}
    assert {(r.k, r.v) for r in batch.collect()} == {(1, "b"), (3, "n")}


def test_delete_in_later_batch_wins_over_earlier_update(spark, tmp_path):
    # seq ordering, not arrival ordering, decides: the tombstone (seq 5)
    # beats an update with seq 4 even if they land in different batches
    rows = [(9, "early", 4, "U"), (9, None, 5, "D"), (9, "first", 1, "I")]
    log = spark.createDataFrame(rows, "k INT, v STRING, seq INT, op STRING")
    out = run_streaming_cdc_apply(
        spark, log, key_cols=["k"], scratch_dir=str(tmp_path / "cdc2")
    )
    assert out.count() == 0
