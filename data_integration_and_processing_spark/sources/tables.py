"""Fixture-table loaders.

The driver provides a deterministic TPC-H-ish star schema plus events /
documents / embeddings tables as parquet (TESTDATA.md). Parquet scans give
us column pruning + predicate pushdown for free — every query in the
catalog goes through here so ``.explain`` shows ``PushedFilters`` /
``ReadSchema`` trimmed to what the query actually touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# (session id, sf_dir, name) -> DataFrame. Fixture dirs are immutable, and a
# DataFrame is just a reusable logical plan, so caching skips re-listing
# files and re-reading parquet footers on every query (~50-100ms per call,
# paid hundreds of times across a catalog run).
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    key = (id(spark), sf_dir.rstrip("/"), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _read_table(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name not in _NANOS_TS_TABLES:
        try:
            return spark.read.parquet(path)
        except Exception as exc:  # noqa: BLE001 — schema resolution happens eagerly
            if "PARQUET_TYPE_ILLEGAL" not in str(exc):
                raise
    # Parquet TIMESTAMP(NANOS) columns (e.g. events.ts) are illegal for
    # Spark's reader. Re-read nanos as long, then truncate to microsecond
    # timestamps — the same truncation DuckDB applies, so both engines see
    # identical values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        for field, dtype in df.dtypes:
            if dtype == "bigint" and field in _NANOS_TS_COLUMNS:
                df = df.withColumn(field, F.timestamp_micros(F.expr(f"{field} div 1000")))
        return df
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")


# Known nanosecond-timestamp columns in the fixture set. Tables listed in
# _NANOS_TS_TABLES skip the plain-read probe entirely — the probe's failed
# schema-inference job costs ~0.5s and logs an executor ERROR per call.
_NANOS_TS_COLUMNS = frozenset({"ts"})
_NANOS_TS_TABLES = frozenset({"events"})


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
