"""Source connectors (reference parity: O1/O2/O3).

The reference reads whole tables into one pandas frame — XLSX via
``pd.read_excel`` (`/root/reference/PostgresDatabase.py:130`), ClickHouse via
``client.query_df`` (`/root/reference/PostgresDatabase.py:146-147`), Postgres
via ``fetchall`` (`/root/reference/ClickHouseDatabase.py:113-119`). Here every
source returns a partitioned, lazy DataFrame:

- file formats (parquet/csv/json) -> native distributed scans with predicate
  pushdown and column pruning;
- JDBC -> ``spark.read.format("jdbc")`` with partitioned-read options
  (``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``) so a
  100 TB table is read by N executors, not one ``fetchall``;
- XLSX -> documented driver-side pandas shim (Spark has no builtin Excel
  source); only sane for small control/lookup files — anything at scale
  should land as CSV/parquet first.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_integration_and_processing_spark.functions.schema_mapping import schema_for_pandas

FILE_FORMATS = {"parquet", "csv", "json", "orc", "xml"}  # xml: native in Spark 4


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Any | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Distributed file scan. CSV/JSON default to header+inferSchema to
    mirror the reference's pandas-inferred schemas (SURVEY.md §1.3)."""
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unsupported file format {fmt!r}; expected {sorted(FILE_FORMATS)}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_excel(spark: SparkSession, path: str, sheet_name: int | str = 0) -> DataFrame:
    """XLSX ingest (reference O1). Driver-side shim: fine for small control
    files, NOT a scale path — the frame materializes on the driver exactly
    once, then becomes a normal distributed DataFrame.

    Uses ``pd.read_excel`` when an engine (openpyxl) is installed, else the
    stdlib zipfile+ElementTree parser in ``sources/xlsx.py`` — so O1 runs
    for real either way (same first-row-header semantics for the simple
    tabular sheets the reference ingests)."""
    try:
        import pandas as pd
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:  # openpyxl not installed: stdlib parser
        from data_integration_and_processing_spark.sources.xlsx import read_xlsx_pandas

        pdf = read_xlsx_pandas(path, sheet_name)
    return spark.createDataFrame(pdf, schema=schema_for_pandas(pdf))


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan (reference O2/O3, minus the single-threaded
    fetchall). Pass ``query`` to push an arbitrary pushed-down SQL subquery;
    pass the partition_* quartet to split the read across executors."""
    reader = spark.read.format("jdbc").option("url", url).option("fetchsize", str(fetchsize))
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if partition_column is not None:
        if query is not None:
            raise ValueError("JDBC partitioned reads require dbtable, not query")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partition_column requires lower_bound, upper_bound and num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_fixed_width(
    spark: SparkSession,
    path: str,
    spec: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width text scan (the ``pandas.read_fwf`` surface, distributed).

    ``spec``: (column_name, start_1based, width, spark_type) per field.
    Mainframe/legacy extracts still arrive this way; the scan is
    ``spark.read.text`` (splittable, distributed) and every field is a JVM
    substring/trim/cast projection — whole-stage codegen, no Python. With
    ANSI enabled a malformed numeric field fails loudly; pass type
    ``"string"`` and ``try_cast`` downstream for permissive loads.
    """
    raw = spark.read.text(path)
    cols = []
    for name, start, width, dtype in spec:
        from pyspark.sql import functions as F  # noqa: PLC0415

        field = F.substring("value", start, width)
        if dtype == "string":
            cols.append(F.rtrim(field).alias(name))
        else:
            cols.append(F.trim(field).cast(dtype).alias(name))
    return raw.select(*cols)
