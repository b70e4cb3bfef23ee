"""Mergeable quantile-digest rollup guarantees.

Same discipline as the HLL / CMS sketch families (tests/test_analytics.py):
the rows-only catalog entry is backed here by hard bounds — merging per-day
equi-depth summaries must land within the 1/B rank-error budget of the true
quantile, deterministically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.queries.scale_queries import (
    _QD_RANK_TOL,
    _QD_TARGETS,
    agg_quantile_digest_rollup,
    quantile_digest_curve,
)


def test_rank_error_within_budget(spark, sf_dir):
    out = quantile_digest_curve(spark, sf_dir).collect()
    types = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type").distinct().count()
    assert len(out) == types * len(_QD_TARGETS)
    assert all(r["rank_err"] <= _QD_RANK_TOL for r in out)
    # the registered (driver-checked) projection: every rank bound must hold
    audit = agg_quantile_digest_rollup(spark, sf_dir).collect()
    assert len(audit) == types * len(_QD_TARGETS)
    assert all(r["rank_ok"] for r in audit)


def test_merged_estimate_tracks_exact_quantile_in_rank_space(spark, sf_dir):
    """The merged estimate's CDF position is within tolerance of the target —
    checked independently of the query's own audit columns."""
    est = {(r["event_type"], r["p"]): r["est_value"] for r in quantile_digest_curve(spark, sf_dir).collect()}
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    for (etype, p), v in est.items():
        frac = (
            e.filter(F.col("event_type") == etype)
            .agg(F.avg(F.when(F.col("value") <= F.lit(v), 1.0).otherwise(0.0)))
            .collect()[0][0]
        )
        assert abs(frac - p) <= _QD_RANK_TOL, (etype, p, frac)


def test_deterministic(spark, sf_dir):
    a = sorted(map(tuple, quantile_digest_curve(spark, sf_dir).collect()))
    b = sorted(map(tuple, quantile_digest_curve(spark, sf_dir).collect()))
    assert a == b


def test_streaming_digest_rank_error_within_budget(spark, sf_dir):
    """Replay-merged streaming summaries stay within the compounded 1/B
    budget of the true quantiles (B=256, multi-chunk replay => ~0.03;
    pinned at 0.05)."""
    import uuid

    from data_integration_and_processing_spark.streaming.pipelines import (
        run_streaming_quantile_digest,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value", "ts"
    )
    scratch = f"/tmp/diaps_qd_test_{uuid.uuid4().hex[:8]}"
    out = run_streaming_quantile_digest(spark, e, scratch_dir=scratch).collect()
    types = e.select("event_type").distinct().count()
    assert len(out) == types * 3
    assert all(r["rank_err"] <= 0.05 for r in out), sorted(
        (r["event_type"], r["p"], r["rank_err"]) for r in out
    )
