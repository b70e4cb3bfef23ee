"""Multimodal-column queries over ``documents`` payloads (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.multimodal import attach_binary_payload, extract_features
from data_integration_and_processing_spark.queries.catalog import register
from data_integration_and_processing_spark.sources.tables import load_table


@register(
    "multimodal_binary_metadata",
    oracle="""
        SELECT doc_id,
               'application/octet-stream' AS mime_type,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_md5,
               hex(encode(substring(text, 1, 8))) AS head_hex
        FROM documents
    """,
    description="binary payload column + queryable metadata struct (no decode needed)",
    tags=("multimodal", "north-star"),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = attach_binary_payload(d)
    return m.select(
        "doc_id",
        F.col("media_meta.mime_type").alias("mime_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.hex(F.substring(F.col("text"), 1, 8).cast("binary")).alias("head_hex"),
    )


@register(
    "multimodal_feature_extract",
    oracle=None,  # mapInPandas feature extraction (stubbed decoder) — rows-only
    description="Arrow-batched mapInPandas feature extraction over binary payloads (decoder stubbed)",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = attach_binary_payload(d)
    return extract_features(m).orderBy("doc_id")
