"""Round-14 operator: IVFPQ compaction (the lifecycle closer).

Invariants pinned here (VERDICT r13 item 4):
- accounting: compacted data-plane rows == survivor rows, tombstone set gone;
- probe-equality: the compacted index serves the same (id, score) top-10 as
  an independent from-scratch rebuild over the survivors (every training
  collect is hash-deterministic on id and stored vectors round-trip exactly);
- recall: the audit's floor boolean holds (>= the tombstoned index's floor);
- the in-place swap path retires tombstones and never serves a deleted id.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _tiny_corpus(spark, n=64, dim=8):
    """Deterministic synthetic vectors (no RNG: value = trig of id) so the
    in-place test owns its fixture instead of mutating the shared one."""
    rows = [
        (i, [float(math.sin(0.7 * i + 0.3 * j) + 0.01 * j) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_compact_in_place_retires_tombstones(spark, tmp_path):
    from data_integration_and_processing_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_compact,
        ivfpq_delete,
        ivfpq_probe,
        load_ivfpq_tombstones,
    )

    path = str(tmp_path / "idx")
    corpus = _tiny_corpus(spark)
    build_ivfpq_index(corpus, path, n_cells=2, m=4, nbits=2)
    doomed = corpus.filter(F.col("vec_id") % 4 == 1).select("vec_id")
    n_doomed = doomed.count()
    ivfpq_delete(spark, path, doomed)
    assert load_ivfpq_tombstones(spark, path).count() == n_doomed

    out = ivfpq_compact(spark, path)
    assert out == path  # in-place mode returns the original path
    # tombstones retired, survivors (and only survivors) servable
    assert load_ivfpq_tombstones(spark, path) is None
    data = spark.read.parquet(f"{path}/data")
    assert data.count() == 64 - n_doomed
    assert data.filter(F.col("id") % 4 == 1).count() == 0
    # the compacted index still serves: probe for a survivor finds itself
    probe_row = corpus.filter(F.col("vec_id") == 2).first()
    top = ivfpq_probe(
        spark, path, [float(x) for x in probe_row["embedding"]], k=1, nprobe=2, refine=8
    ).collect()
    assert top and top[0]["vec_id"] == 2


def test_compact_equals_from_scratch_rebuild(spark, tmp_path):
    """Bit-equality of the whole served surface on the synthetic corpus:
    same centroids, same codebooks, same per-id codes as building from
    scratch over the survivor rows."""
    from data_integration_and_processing_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_compact,
        ivfpq_delete,
    )

    corpus = _tiny_corpus(spark)
    survivors = corpus.filter(F.col("vec_id") % 4 != 1)
    a = str(tmp_path / "tombstoned")
    b = str(tmp_path / "scratch")
    build_ivfpq_index(corpus, a, n_cells=2, m=4, nbits=2)
    ivfpq_delete(spark, a, corpus.filter(F.col("vec_id") % 4 == 1).select("vec_id"))
    c = ivfpq_compact(spark, a, out_path=str(tmp_path / "compacted"))
    build_ivfpq_index(survivors, b, n_cells=2, m=4, nbits=2)

    for plane, key in (("centroids", ["cell"]), ("codebooks", ["subspace", "code"])):
        lhs = spark.read.parquet(f"{c}/{plane}").orderBy(*key).collect()
        rhs = spark.read.parquet(f"{b}/{plane}").orderBy(*key).collect()
        assert lhs == rhs, plane
    lhs = spark.read.parquet(f"{c}/data").select("id", "codes", "_cell").orderBy("id")
    rhs = spark.read.parquet(f"{b}/data").select("id", "codes", "_cell").orderBy("id")
    assert lhs.collect() == rhs.collect()


def test_compact_audit_booleans_all_true(spark, sf_dir):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_ivfpq_compact_audit,
    )

    rows = sim_ivfpq_compact_audit(spark, sf_dir).collect()
    assert len(rows) == 10
    for col in ("compact_rows_ok", "rebuild_probe_equal_ok", "recall_ok"):
        assert all(r[col] for r in rows), (col, rows)


def test_model_rerank_slot_parity_and_recall(spark, sf_dir):
    """The pluggable stage-2 slot: audit booleans hold, served ranks are
    dense 1..10 per query, and the pandas scorer's outputs agree with the
    JVM weighted-dot fold (<= 2e-6 after rounding — numpy pairwise vs
    sequential accumulation)."""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_model_rerank_eval,
        sim_model_rerank_raw,
    )

    rows = sim_model_rerank_eval(spark, sf_dir).collect()
    assert rows and len(rows) % 10 == 0
    assert all(r["recall_ok"] for r in rows)
    assert all(r["slot_parity_ok"] for r in rows)
    served = sim_model_rerank_raw(spark, sf_dir).collect()
    per_q = {}
    for r in served:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, 11)), (q, ranks)


def test_model_rerank_swappable_scorer(spark, tmp_path):
    """Swapping the model = passing a different callable: a constant scorer
    must rank purely by id tiebreak, proving stage-2 is genuinely pluggable
    (no hidden dependence on the default bilinear head)."""
    from data_integration_and_processing_spark.operators.similarity import (
        build_ivfpq_index,
        model_rerank_batch,
    )

    corpus = _tiny_corpus(spark)
    path = str(tmp_path / "idx")
    build_ivfpq_index(corpus, path, n_cells=2, m=4, nbits=2)
    q = corpus.filter(F.col("vec_id") == 0).first()
    qs = [(0, [float(x) for x in q["embedding"]])]

    def constant(qm, cm):
        import numpy as np

        return np.zeros(len(qm))

    top = model_rerank_batch(
        spark, path, qs, constant, k=5, nprobe=2, n_candidates=16
    ).collect()
    ids = [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ids == sorted(ids), ids  # constant scores -> pure id tiebreak
    assert all(r["model_score"] == 0.0 for r in top)
