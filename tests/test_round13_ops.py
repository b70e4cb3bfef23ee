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


def test_ivfpq_delete_tombstone_semantics(spark, sf_dir, tmp_path):
    """FAISS remove_ids semantics on the tombstone path: deleted ids are
    never served (single probe AND batch probe — the bit-for-bit parity
    contract must hold WITH tombstones), deletes compose with upserts,
    repeated deletes are idempotent at read time, and deleting an unknown
    id is a no-op."""
    import pyspark.sql.functions as F

    from data_integration_and_processing_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_delete,
        ivfpq_probe,
        ivfpq_probe_batch,
        ivfpq_upsert,
        load_ivfpq_tombstones,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") != 0)
    path = str(tmp_path / "delidx")
    build_ivfpq_index(e.filter(F.col("vec_id") % 10 != 3), path, n_cells=4, m=8, nbits=4)
    ivfpq_upsert(e.filter(F.col("vec_id") % 10 == 3), path)

    q_row = e.filter(F.col("vec_id") == 1).select("embedding").first()
    q = [float(x) for x in q_row["embedding"]]
    before = {r["vec_id"] for r in ivfpq_probe(spark, path, q, k=10, nprobe=4, refine=16).collect()}
    assert before, "probe must return candidates before any delete"

    # delete everything the probe just served, including upserted (%10==3)
    # ids if any — composition with upsert
    doomed = sorted(before)
    ivfpq_delete(spark, path, spark.createDataFrame([(i,) for i in doomed], "vec_id long"))
    after = {r["vec_id"] for r in ivfpq_probe(spark, path, q, k=10, nprobe=4, refine=16).collect()}
    assert after.isdisjoint(before), (before, after)
    assert after, "survivors must backfill the k slots"

    # batch path applies the same tombstone filter (parity contract)
    batch = ivfpq_probe_batch(spark, path, [(1, q)], k=10, nprobe=4, refine=16)
    batch_ids = {r["vec_id"] for r in batch.collect()}
    assert batch_ids == after, (batch_ids, after)

    # idempotent: re-deleting the same ids and deleting an unknown id
    # changes nothing served; the distinct tombstone set stays the same
    ivfpq_delete(
        spark, path, spark.createDataFrame([(i,) for i in doomed] + [(10**9,)], "vec_id long")
    )
    again = {r["vec_id"] for r in ivfpq_probe(spark, path, q, k=10, nprobe=4, refine=16).collect()}
    assert again == after
    tomb = load_ivfpq_tombstones(spark, path)
    assert tomb.count() == len(doomed) + 1  # distinct ids (unknown id included)


def test_ivfpq_delete_audit_booleans_true(spark, sf_dir):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_ivfpq_delete_audit,
    )

    rows = sim_ivfpq_delete_audit(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(
        r["tombstone_count_ok"] and r["no_deleted_served_ok"] and r["recall_ok"]
        for r in rows
    ), rows
    # the exact ground truth itself must contain no deleted id
    assert all(r["vec_id"] % 10 != 7 for r in rows)
