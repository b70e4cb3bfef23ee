"""Round-13 operators: IVFPQ tuning frontier + two-stage rerank eval.

Floors in similarity_queries._IVFPQ_FRONTIER_FLOORS / _RERANK_FLOORS are the
SINGLE source for both the registered queries' booleans and these tests
(measured sf0.001/0.01/0.1 — see the constants' derivation comments).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_frontier_recalls_bounded_and_refine_monotone(spark, sf_dir):
    """Recall in [0,1]; recall is non-decreasing in refine at fixed nprobe:
    a larger refine rescans a SUPERSET of ADC candidates with the exact
    score, so the exact top-10 can only gain true neighbors. (No such
    guarantee holds along nprobe — more cells can displace true neighbors
    out of the k*refine ADC cut, which the measured sf0.001 (8,4) < (4,4)
    inversion demonstrates — hence the audit pins floors, not nprobe
    monotonicity.)"""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_ivfpq_tuning_frontier_raw,
    )

    rows = {
        (r["nprobe"], r["refine"]): r["mean_recall"]
        for r in sim_ivfpq_tuning_frontier_raw(spark, sf_dir).collect()
    }
    assert len(rows) == 6
    assert all(0.0 <= v <= 1.0 for v in rows.values()), rows
    assert rows[(4, 1)] <= rows[(4, 4)] + 1e-12, rows
    assert rows[(4, 4)] <= rows[(4, 16)] + 1e-12, rows


def test_frontier_audit_booleans_all_true(spark, sf_dir):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_ivfpq_tuning_frontier,
    )

    rows = sim_ivfpq_tuning_frontier(spark, sf_dir).collect()
    assert len(rows) == 6
    assert all(r["mean_ok"] for r in rows), rows


def test_rerank_never_worse_per_query_and_audit_true(spark, sf_dir):
    """The mathematical invariant: the rerank arm's candidate set is a
    superset of stage1's (same ADC ordering, deeper cut) and both order by
    the exact score, so rerank DCG >= stage1 DCG for EVERY query."""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _DCG_W,
        _eval_scored,
        _exact_ranked,
        sim_rerank_eval,
        sim_rerank_eval_raw,
    )
    from data_integration_and_processing_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    exact = _exact_ranked(
        _eval_scored(spark, sf_dir, e=e).withColumnRenamed("cos_exact", "s"), "s"
    )
    served = sim_rerank_eval_raw(spark, sf_dir, e=e)
    disc = F.element_at(F.array(*[F.lit(w) for w in _DCG_W]), F.col("rank"))
    per_q = (
        served.join(
            exact.select("query_id", "neighbor_id", F.col("g").alias("_eg")),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("arm", "query_id")
        .agg(F.sum(F.coalesce(F.col("_eg"), F.lit(0.0)) * disc).alias("dcg"))
    )
    paired = {
        (r["arm"], r["query_id"]): r["dcg"] for r in per_q.collect()
    }
    qids = {q for (_, q) in paired}
    assert qids
    for q in qids:
        assert paired[("rerank", q)] >= paired[("stage1", q)] - 1e-12, (
            q,
            paired[("stage1", q)],
            paired[("rerank", q)],
        )

    out = sim_rerank_eval(spark, sf_dir).collect()
    assert {r["arm"] for r in out} == {"stage1", "rerank"}
    assert all(r["ndcg_ok"] and r["no_worse_ok"] for r in out), out
    # idcg is per-query ground truth, identical across arms
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["idcg_micro"])
    assert all(len(v) == 1 for v in by_q.values())
