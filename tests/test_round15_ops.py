"""Round-15 operators: IVFPQ serving-cost model, the RAG-ingest pipeline
composite, and streaming ANN ingest (VERDICT r14 item 7 a/b/c).

Invariants pinned here:
- serving cost: work units are exact and obey the model (ADC strictly
  grows with nprobe, refine bounds stage-2 rows by construction, the
  balanced-cell ratio is exactly 1 at nprobe == n_cells);
- the hash embedder: deterministic, unit-norm, Arrow-batched with the
  (doc_id, embedding) contract the model-UDF slot promises;
- RAG pipeline: every held-out query is served exactly k rows and the
  recall floor holds on the real fixture;
- streaming ingest: each micro-batch lands exactly its slice, the live
  index accounting matches base + ingested-so-far, and the per-batch
  recall audit stays above the registered floor.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF_DIR_TINY = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# serving-cost model audit
# ---------------------------------------------------------------------------


def test_serving_cost_raw_work_units(spark):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_ivfpq_serving_cost_raw,
    )

    rows = {
        (r["nprobe"], r["refine"]): r
        for r in sim_ivfpq_serving_cost_raw(spark, SF_DIR_TINY).collect()
    }
    assert len(rows) == 6
    nq = next(iter(rows.values()))["n_queries"]
    assert nq > 0
    # ADC work strictly grows with nprobe at fixed refine
    assert rows[(1, 4)]["adc_rows"] < rows[(2, 4)]["adc_rows"] < rows[(4, 4)]["adc_rows"]
    # refine knob bounds stage-2 rows: never more than k*refine per query
    for (np_, rf), r in rows.items():
        assert r["refine_rows"] <= nq * 10 * rf
    # at nprobe == n_cells every cell is scanned -> model exactly 1
    assert rows[(8, 4)]["model_ratio_micro"] == 1_000_000
    # refine does not change ADC work (stage-1 is refine-independent)
    assert rows[(4, 4)]["adc_rows"] == rows[(4, 16)]["adc_rows"]


def test_serving_cost_verdicts_all_true(spark):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_ivfpq_serving_cost,
    )

    out = sim_ivfpq_serving_cost(spark, SF_DIR_TINY).collect()
    assert len(out) == 6
    for r in out:
        assert r["adc_model_ok"] and r["adc_monotone_ok"]
        assert r["refine_capped_ok"] and r["full_scan_exact_ok"]


# ---------------------------------------------------------------------------
# hash embedder (the model-UDF slot stand-in)
# ---------------------------------------------------------------------------


def test_hash_embed_contract(spark):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _RAG_DIM,
        _hash_embed,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "pack my box"),
         (4, None), (5, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in _hash_embed(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # deterministic: identical text -> identical vector
    assert out[1] == out[2]
    assert out[1] != out[3]
    # unit norm for non-empty text, all dims present
    for did, v in out.items():
        assert len(v) == _RAG_DIM
        n = math.sqrt(sum(x * x for x in v))
        if did in (1, 2, 3):
            assert n == pytest.approx(1.0, abs=1e-5)
        else:  # null/empty text -> zero vector, not NaN
            assert n == 0.0


def test_rag_pipeline_serves_k_and_recall(spark):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        pipeline_rag_ingest,
    )

    out = pipeline_rag_ingest(spark, SF_DIR_TINY).collect()
    assert out  # at least one query source
    for r in out:
        assert r["n_served"] == 10 * r["n_queries"]
        assert r["recall_ok"]


# ---------------------------------------------------------------------------
# streaming ANN ingest
# ---------------------------------------------------------------------------


def test_stream_ingest_ledger(spark):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _STREAM_INGEST_BATCHES,
        _STREAM_INGEST_RECALL_FLOOR,
        stream_ivfpq_ingest_raw,
    )
    from data_integration_and_processing_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR_TINY, "embeddings")
    base_n = e.filter(
        (F.col("vec_id") % 100 != 0) & (F.col("vec_id") % 8 < 5)
    ).count()
    slice_n = {
        i: e.filter(
            (F.col("vec_id") % 100 != 0) & (F.col("vec_id") % 8 == 5 + i)
        ).count()
        for i in range(_STREAM_INGEST_BATCHES)
    }

    ledger = sorted(
        stream_ivfpq_ingest_raw(spark, SF_DIR_TINY).collect(),
        key=lambda r: r["batch_seq"],
    )
    assert [r["batch_seq"] for r in ledger] == list(range(_STREAM_INGEST_BATCHES))
    running = base_n
    for r in ledger:
        # each micro-batch is exactly its vec_id % 8 slice, in order
        assert r["n_ingested"] == slice_n[r["batch_seq"]]
        running += r["n_ingested"]
        assert r["total_indexed"] == running
        assert r["recall"] >= _STREAM_INGEST_RECALL_FLOOR
