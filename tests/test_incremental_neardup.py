"""Semantics of neardup_against_snapshot (the steady-state near-dedup
ingest): batch docs near-duplicating the snapshot are dropped, novel docs
survive, and the surviving batch is near-deduped within itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.dedup import (
    neardup_against_snapshot,
)

_BASE_A = " ".join(f"alpha{i}" for i in range(40))
_BASE_B = " ".join(f"beta{i}" for i in range(40))
_BASE_C = " ".join(f"gamma{i}" for i in range(40))
_BASE_D = " ".join(f"delta{i}" for i in range(40))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_snapshot_neardups_dropped_novel_survive(spark):
    snapshot = _df(spark, [(1, _BASE_A), (2, _BASE_B)])
    batch = _df(
        spark,
        [
            # near-copy of snapshot doc A (2 of 40 words trimmed): dropped
            (10, " ".join(_BASE_A.split()[:-2])),
            # novel: survives
            (11, _BASE_C),
            # novel near-copy pair: only the min id survives the in-batch pass
            (12, _BASE_D),
            (13, " ".join(_BASE_D.split()[:-2])),
        ],
    )
    out = neardup_against_snapshot(batch, snapshot, id_col="id", text_col="text")
    assert sorted(r["id"] for r in out.collect()) == [11, 12]


def test_empty_batch_and_disjoint_batch(spark):
    snapshot = _df(spark, [(1, _BASE_A)])
    disjoint = _df(spark, [(20, _BASE_B), (21, _BASE_C)])
    out = neardup_against_snapshot(disjoint, snapshot, id_col="id", text_col="text")
    assert sorted(r["id"] for r in out.collect()) == [20, 21]
    empty = _df(spark, []).filter(F.lit(False))
    assert neardup_against_snapshot(empty, snapshot, id_col="id", text_col="text").count() == 0


def test_exact_copy_of_snapshot_also_dropped(spark):
    snapshot = _df(spark, [(1, _BASE_A)])
    batch = _df(spark, [(30, _BASE_A), (31, _BASE_B)])
    out = neardup_against_snapshot(batch, snapshot, id_col="id", text_col="text")
    assert sorted(r["id"] for r in out.collect()) == [31]
