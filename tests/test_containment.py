"""Containment near-dup semantics: inclusion pairs that Jaccard misses."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from data_integration_and_processing_spark.queries.dedup_queries import _with_prefix_copies


def test_prefix_copies_have_full_containment(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(500)
    u = _with_prefix_copies(d)
    pairs = {
        (r["id_a"], r["id_b"]): r["containment_micro"]
        for r in ngram_containment_pairs(u, text_col="text", id_col="id", n=3, threshold=0.9).collect()
    }
    # every prefix copy (id+20000) pairs with its original at containment 1.0
    want = [r["doc_id"] for r in d.filter(F.col("doc_id") % 5 == 0).select("doc_id").collect()]
    assert want
    for doc_id in want:
        assert pairs.get((doc_id, doc_id + 20000)) == 1_000_000, doc_id


def test_jaccard_misses_what_containment_catches(spark, sf_dir):
    """The fixture's inclusion pairs sit far below a 0.5 jaccard threshold —
    the asymmetry claim that justifies a second normalization."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(500)
    u = _with_prefix_copies(d)
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(u, text_col="text", id_col="id", n=3, threshold=0.5).collect()
    }
    doc_ids = [r["doc_id"] for r in d.filter(F.col("doc_id") % 5 == 0).select("doc_id").collect()]
    missed = [i for i in doc_ids if (i, i + 20000) not in jac]
    # prefix is 40% of the words => jaccard ~0.4 < 0.5 for essentially all
    assert len(missed) >= 0.9 * len(doc_ids)
