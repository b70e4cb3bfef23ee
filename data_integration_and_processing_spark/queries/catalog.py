"""Registry mapping query names to (PySpark impl, DuckDB oracle SQL) pairs.

Keeping both halves in one registration site guarantees the column-name
contract: the driver's correctness gate sorts columns by name before value
hashing, so every computed column is aliased identically in the DataFrame
code and the oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import (order = SURVEY.md §7 build order).
_QUERY_MODULES = [
    "data_integration_and_processing_spark.queries.flagship",
    "data_integration_and_processing_spark.queries.etl_parity",
    "data_integration_and_processing_spark.queries.relational",
    "data_integration_and_processing_spark.queries.tpch_extra",
    "data_integration_and_processing_spark.queries.partsupp_queries",
    "data_integration_and_processing_spark.queries.functions_pack",
    "data_integration_and_processing_spark.queries.udf_surface",
    "data_integration_and_processing_spark.queries.dedup_queries",
    "data_integration_and_processing_spark.queries.similarity_queries",
    "data_integration_and_processing_spark.queries.text_queries",
    "data_integration_and_processing_spark.queries.curation_queries",
    "data_integration_and_processing_spark.queries.sampling_queries",
    "data_integration_and_processing_spark.queries.streaming_queries",
    "data_integration_and_processing_spark.queries.multimodal_queries",
    "data_integration_and_processing_spark.queries.analytics_queries",
    "data_integration_and_processing_spark.queries.quality_queries",
    "data_integration_and_processing_spark.queries.temporal_queries",
    "data_integration_and_processing_spark.queries.scale_queries",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


# The driver's correctness gate verifies the FIRST 50 registered queries, so
# registration order is a coverage decision, not cosmetics.  This list puts one
# oracle-checked representative of every operator family (dedup / similarity /
# text / sampling / UDF / skew / streaming / multimodal / function packs /
# relational / ETL sink semantics) inside that hard-signal window; everything
# else follows in module registration order and is covered by
# scripts/driver_replica.py + pytest.
_PRIORITY: tuple[str, ...] = (
    # flagship
    "q1_pricing_summary",
    # dedup family (r4.3: dedup_exact out — green r1/r3 — prefix-filtered
    # jaccard in for its first hard signal)
    "dedup_ngram_jaccard_prefix",
    "dedup_ngram_jaccard",
    "dedup_embedding_clusters",
    # similarity family (r4: sim_knn_join rotated in, sim_vector_ops_pack
    # out — proven green in r3)
    "sim_topk_bruteforce",
    "sim_neardup_pairs",
    "sim_knn_join",
    # storage layout (multi-dimensional skipping)
    "etl_zorder_layout",
    # text-analysis family (r4: text_fingerprint out, proven r3)
    "text_language_id",
    "text_quality_score",
    "pipeline_training_corpus",
    # corpus curation family (r2)
    "text_decontaminate",
    "dedup_incremental_snapshot",
    "text_chunk_documents",
    # deterministic sampling family
    "sample_hash_deterministic",
    # Arrow UDF surface (r4: udf_pandas_scalar out, proven r3)
    "udf_grouped_map_zscore",
    "udf_cogrouped_asof",
    # skew mitigation
    "skew_salted_agg",
    # streaming family (r4: stream_tumbling_window out, proven r3)
    "stream_session_window",
    "stream_sessionize_by_gap",
    "stream_stateful_user_stats",
    # multimodal plumbing
    "multimodal_binary_metadata",
    # scalar function packs
    "func_string_pack",
    # scale utilities
    "ids_contiguous_assign",
    "profile_column_stats",
    # lakehouse maintenance singletons (versioned / checksum tags)
    "etl_time_travel",
    "etl_checksum_reconcile",
    # relational engine representatives (r4 rotation: funnel, fuzzy-deletion
    # join and exact percentile out — proven green in r3 — broadcast-dim,
    # range-band, two-edit fuzzy join, rollup and weighted-median in: each
    # was replica-only until now)
    "filter_predicate_pushdown",
    "project_derived_columns",
    # r4.2 rotation: join_inner_shuffle out (proven green r3; the join family
    # keeps five other window rows), Bloom semi-join reduction in — first
    # hard signal for the runtime-filter family
    "join_bloom_prefilter",
    "join_asof_event",
    "join_broadcast_dim",
    "join_range_band",
    "join_fuzzy_two_edit",
    # r4.3: agg_groupby_stats out (green r3; rollup + weighted-median keep
    # the aggregation signal), SQL-text entry point in
    "sql_text_parity",
    "agg_rollup",
    "agg_weighted_median",
    "window_topk_per_group",
    "sort_multi_key_limit",
    "set_ops_nations",
    # temporal family (r3 + r4: temporal_ewma in)
    "temporal_interval_merge",
    "temporal_ewma",
    "subquery_correlated_avg",
    # TPC-H depth (r4: q2 partsupp variant in — carries the tpch tag — q3
    # out, proven r3)
    "q2_min_cost_supplier",
    # ETL parity, one per sink semantic
    "etl_transfer_overwrite_roundtrip",
    # r4.2 rotation: append roundtrip out (green r3; overwrite keeps the
    # sink-semantic signal), Merkle partition diff in
    "etl_partition_diff",
    "etl_upsert_merge",
    "etl_scd2_apply",
    "etl_cdc_apply",
    "etl_jdbc_live_roundtrip",
)

_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description or (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    """All query specs, priority-window queries first (see _PRIORITY)."""
    _load()
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
