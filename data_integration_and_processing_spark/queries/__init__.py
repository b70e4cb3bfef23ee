"""Query catalog: the engine's verifiable operator surface.

Every operator the engine claims (SURVEY.md §2) is registered here as a
named query — a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB runs
on the same parquet. ``__spark_entry__.py`` re-exports this registry.
"""

from data_integration_and_processing_spark.queries.catalog import (
    QuerySpec,
    all_specs,
    oracle_sql,
    queries,
    register,
)

__all__ = ["QuerySpec", "all_specs", "oracle_sql", "queries", "register"]
