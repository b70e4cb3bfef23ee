"""data_integration_and_processing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``ShamailovMax/data-integration-and-processing`` (a pandas-based
PostgreSQL<->ClickHouse ETL bridge; see SURVEY.md), extended with the
relational-operator and LLM-data-pipeline surface a 100 TB training-data
platform needs: full join/agg/window coverage, dedup (exact + MinHash/SimHash
near-dup), embedding similarity search, text analysis, multimodal column
plumbing, and Structured Streaming.

Design stance (SURVEY.md §7):
- Everything is declared with the DataFrame / SQL API; Catalyst + Tungsten
  choose the physical plan. No RDDs in the hot path, no driver-side loops.
- Small dimension tables are broadcast; wide ops shuffle on their keys; AQE
  is enabled for runtime coalescing and skew handling.
- Python crosses the JVM boundary only via Arrow-batched pandas UDFs, and
  only where built-in functions genuinely can't express the semantics.
"""

from data_integration_and_processing_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
