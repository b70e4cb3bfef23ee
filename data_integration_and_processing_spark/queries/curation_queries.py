"""Catalog queries for the corpus-curation operators (decontamination,
repetition metrics, snapshot-incremental dedup, sequence packing).

Benchmark/batch splits are derived deterministically from doc_id mod
rules so the DuckDB oracle can reconstruct the identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_integration_and_processing_spark.operators.curation import (
    dedup_against_snapshot,
    flag_contaminated,
    pack_sequences,
    repetition_metrics,
)
from data_integration_and_processing_spark.queries.catalog import register
from data_integration_and_processing_spark.operators.parallelism import fan_out_scan
from data_integration_and_processing_spark.sources.tables import load_table


@register(
    "text_decontaminate",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        bg AS (
            SELECT DISTINCT concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3]) AS gram
            FROM w, unnest(generate_series(1, len(words) - 3)) AS t(i)
            WHERE doc_id % 41 = 7
        ),
        dg AS (
            SELECT DISTINCT doc_id, concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3]) AS gram
            FROM w, unnest(generate_series(1, len(words) - 3)) AS t(i)
            WHERE doc_id % 41 <> 7
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM dg JOIN bg USING (gram)
        GROUP BY doc_id
    """,
    description=(
        "benchmark decontamination: training docs sharing any word 4-gram with the "
        "held-out benchmark split (doc_id % 41 = 7), with distinct-shared-gram counts. "
        "Benchmark gram set is broadcast -> zero corpus shuffle"
    ),
    tags=("text", "north-star", "curation"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out_scan(load_table(spark, sf_dir, "documents"))
    bench = d.filter(F.col("doc_id") % 41 == 7)
    train = d.filter(F.col("doc_id") % 41 != 7)
    return flag_contaminated(train, bench, n=4)


@register(
    "text_repetition_metrics",
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        g AS (
            SELECT doc_id, concat_ws(' ', words[i], words[i+1]) AS gram
            FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
        ),
        gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
        top AS (
            SELECT doc_id, max(c) AS maxc, CAST(sum(c) AS DOUBLE) AS total
            FROM gc GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               round(1 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6) AS dup_word_frac,
               round(maxc / total, 6) AS top_ngram_frac
        FROM w JOIN top USING (doc_id)
    """,
    description=(
        "Gopher-style repetition metrics per doc: duplicate-word fraction and "
        "most-frequent-2-gram share. Spark side is a sort + run-length aggregate fold "
        "over the gram array (zero shuffle); the oracle is the explode+groupBy form — "
        "their equality is the correctness claim"
    ),
    tags=("text", "north-star", "curation"),
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out_scan(load_table(spark, sf_dir, "documents"))
    return repetition_metrics(d, n=2)


@register(
    "dedup_incremental_snapshot",
    oracle="""
        WITH snap AS (
            SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0
        ),
        batch AS (
            SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id + 20000 AS id, text FROM documents WHERE doc_id % 7 = 1
        ),
        first_wins AS (SELECT md5(text) AS fp, min(id) AS id FROM batch GROUP BY md5(text))
        SELECT id, fp FROM first_wins WHERE fp NOT IN (SELECT fp FROM snap)
    """,
    description=(
        "incremental exact dedup of a new batch against a prior corpus snapshot "
        "(digest anti-join, first-wins within batch): O(batch) instead of re-deduping "
        "the whole corpus per ingest; only 16-byte digests shuffle"
    ),
    tags=("dedup", "north-star", "curation", "incremental"),
)
def dedup_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out_scan(load_table(spark, sf_dir, "documents"))
    snapshot = d.filter(F.col("doc_id") % 3 != 0).select(F.col("doc_id").alias("id"), "text")
    batch = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(F.col("doc_id").alias("id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 1).select(
                (F.col("doc_id") + 20000).alias("id"), "text"
            )
        )
    )
    return dedup_against_snapshot(batch, snapshot)


@register(
    "pack_sequences_budget",
    oracle=None,  # next-fit bin boundaries are decision-dependent — not a
    # window/prefix-sum expression; packing invariants (every doc exactly
    # once, no sequence over budget unless single-doc, determinism, in-seq
    # order) are pinned in tests/test_curation.py
    description=(
        "token-budget sequence packing for training (next-fit per deterministic hash "
        "bucket via applyInPandas; 256 buckets >> cores so the serial loop still "
        "saturates; globally unique seq ids without coordination)"
    ),
    tags=("text", "north-star", "curation", "udf"),
)
def pack_sequences_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out_scan(load_table(spark, sf_dir, "documents"))
    return pack_sequences(d, token_budget=256)
