"""Semantic + plan-shape tests for operators/temporal.py.

The catalog queries are oracle-checked against DuckDB; these tests pin the
behaviors an oracle can't see — edge-case semantics on degenerate series,
the EWMA recurrence against a literal driver-side recompute, and the
single-shuffle plan shapes the scale claims rest on.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.temporal import (
    event_deltas,
    ewma_fold,
    merge_intervals,
    ohlc_bars,
    time_weighted_avg,
)
from data_integration_and_processing_spark.queries.catalog import all_specs

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=seconds)


def test_merge_intervals_overlap_touch_disjoint(spark):
    # a: [0,10] overlaps [5,15], [15,20] touches (start == running max end,
    # NOT > it) => all one island; [30,40] is disjoint => second island.
    rows = [
        ("a", 0, 10, 1),
        ("a", 5, 15, 2),
        ("a", 15, 20, 3),
        ("a", 30, 40, 4),
        # b: the sort is by start — an early long interval swallows a later
        # short one entirely ([0,100] covers [50,60])
        ("b", 0, 100, 5),
        ("b", 50, 60, 6),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long, id long")
    out = {
        (r["g"], r["island_id"]): (r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(df, ["g"], "s", "e", tiebreak_col="id").collect()
    }
    assert out == {
        ("a", 1): (0, 20, 3),
        ("a", 2): (30, 40, 1),
        ("b", 1): (0, 100, 2),
    }


def test_time_weighted_avg_locf_semantics(spark):
    # value 10 held for 30s, then 20 held for 10s => (10*30 + 20*10) / 40
    # = 12.5; the final observation (value 99) has zero remaining span.
    rows = [
        ("a", _ts(0), 10.0),
        ("a", _ts(30), 20.0),
        ("a", _ts(40), 99.0),
        ("single", _ts(0), 7.0),  # no span => NULL twa
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = {r["g"]: r for r in time_weighted_avg(df, ["g"], "ts", "value").collect()}
    assert out["a"]["time_weighted_avg"] == 12.5
    assert out["a"]["span_us"] == 40_000_000
    assert out["single"]["time_weighted_avg"] is None
    assert out["single"]["n_obs"] == 1


def test_ewma_fold_matches_driver_recurrence(spark):
    alpha = 0.3
    vals = [3.0, -1.5, 4.25, 0.0, 2.5, 10.0, -7.75]
    rows = [("u", _ts(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, event_id long, value double")
    acc = vals[0]
    for x in vals[1:]:
        acc = alpha * x + (1 - alpha) * acc
    out = ewma_fold(df, ["g"], "ts", "value", alpha=alpha).collect()[0]
    assert out["n_obs"] == len(vals)
    assert out["ewma"] == round(acc, 6)
    assert out["last_value"] == -7.75


def test_ewma_fold_orders_by_time_not_input_order(spark):
    # Same observations delivered in reverse input order must fold in
    # timestamp order — shuffles don't preserve arrival order at scale.
    rows = [("u", _ts(i), i, float(v)) for i, v in enumerate([1, 2, 3])]
    fwd = ewma_fold(
        spark.createDataFrame(rows, "g string, ts timestamp, event_id long, value double"),
        ["g"],
    ).collect()[0]
    rev = ewma_fold(
        spark.createDataFrame(rows[::-1], "g string, ts timestamp, event_id long, value double"),
        ["g"],
    ).collect()[0]
    assert fwd["ewma"] == rev["ewma"]
    assert fwd["last_value"] == rev["last_value"] == 3.0


def test_ohlc_open_close_use_tiebreak_on_equal_ts(spark):
    # two observations at the identical timestamp: event_id breaks the tie
    # for both open (lowest id) and close (highest id)
    rows = [
        ("a", _ts(0), 1, 100.0),
        ("a", _ts(0), 2, 200.0),
        ("a", _ts(10), 3, 50.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, event_id long, value double")
    out = ohlc_bars(df, ["g"], "ts", "value").collect()[0]
    assert out["open"] == 100.0
    assert out["close"] == 50.0
    assert out["high"] == 200.0
    assert out["low"] == 50.0
    assert out["n_events"] == 3
    assert out["sum_value"] == 350.0


def test_event_deltas_gap_and_rate(spark):
    rows = [("u", _ts(0), 1, 10.0), ("u", _ts(4), 2, 18.0)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, event_id long, value double")
    out = event_deltas(df, ["g"]).collect()
    assert len(out) == 1  # first observation has no predecessor
    assert out[0]["gap_us"] == 4_000_000
    assert out[0]["delta_value"] == 8.0
    assert out[0]["rate_per_sec"] == 2.0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_merge_plans_one_shuffle(spark, sf_dir):
    """Both window passes and the island aggregate reuse ONE hash
    partitioning on user_id — a second hashpartitioning Exchange means the
    aggregation re-shuffles what the windows already partitioned. (The
    final rangepartitioning Exchange is the presentation orderBy every
    catalog query carries for deterministic oracle comparison.)"""
    plan = _plan(all_specs()["temporal_interval_merge"].spark(spark, sf_dir))
    keyed = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(keyed) <= 1, f"interval merge should hash-shuffle once:\n{plan}"


def test_ohlc_is_partial_final_aggregate_without_window(spark, sf_dir):
    """min_by/max_by keep OHLC a two-phase declarative aggregate (struct
    ordering keys plan as SortAggregate): no Window node, a map-side
    partial (partial_min_by) before the one keyed shuffle, so the shuffle
    carries one row per (series, bucket) per map task."""
    plan = _plan(all_specs()["temporal_ohlc_bars"].spark(spark, sf_dir))
    assert "Window" not in plan
    assert "partial_min_by" in plan, f"no map-side partial aggregate:\n{plan}"
    keyed = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(keyed) <= 1


def test_ewma_stays_in_codegen(spark, sf_dir):
    """The fold is F.aggregate over a sorted collect_list — JVM-side
    expression evaluation, never a Python worker."""
    plan = _plan(all_specs()["temporal_ewma"].spark(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_streaming_ewma_invariant_to_chunking(spark, sf_dir):
    """Under the ordered-delivery contract the fold result must not depend
    on how many micro-batches the replay used (1 chunk == pure batch)."""
    from data_integration_and_processing_spark.streaming.pipelines import run_streaming_ewma

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    one = {
        r["user_id"]: (r["n_obs"], r["ewma"], r["last_value"])
        for r in run_streaming_ewma(spark, e, alpha=0.3, n_chunks=1).collect()
    }
    many = {
        r["user_id"]: (r["n_obs"], r["ewma"], r["last_value"])
        for r in run_streaming_ewma(spark, e, alpha=0.3, n_chunks=6).collect()
    }
    assert one == many


def test_watermarked_ewma_survives_disorder(spark, sf_dir):
    """Late rows delayed into later micro-batches must neither drop nor
    fold out of order: result equals the batch fold, and every event is
    seen (n_obs matches the per-user event count)."""
    from data_integration_and_processing_spark.operators.temporal import ewma_fold
    from data_integration_and_processing_spark.streaming.pipelines import (
        run_streaming_ewma_watermarked,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    wm = {
        r["user_id"]: (r["n_obs"], r["ewma"], r["last_value"])
        for r in run_streaming_ewma_watermarked(spark, e, alpha=0.3).collect()
    }
    batch = {
        r["user_id"]: (r["n_obs"], r["ewma"], r["last_value"])
        for r in ewma_fold(e, ["user_id"], alpha=0.3).collect()
    }
    assert wm == batch
