"""Fixture-table loaders.

The driver provides a deterministic TPC-H-ish star schema plus events /
documents / embeddings tables as parquet (TESTDATA.md). Parquet scans give
us column pruning + predicate pushdown for free — every query in the
catalog goes through here so ``.explain`` shows ``PushedFilters`` /
``ReadSchema`` trimmed to what the query actually touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor —
# at TPC-H ratios region/nation are constant-size and supplier/part grow
# ~100x slower than lineitem.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
