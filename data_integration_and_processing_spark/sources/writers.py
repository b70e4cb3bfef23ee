"""Sink connectors (reference parity: O7-O10).

Reference sink semantics, re-expressed on ``DataFrameWriter``:

- PostgreSQL: drop-and-recreate on every load
  (`/root/reference/PostgresDatabase.py:72-73`) -> ``mode("overwrite")``;
  the CSV+COPY fast path (`/root/reference/PostgresDatabase.py:84-94`) ->
  JDBC batched writes (``reWriteBatchedInserts=true`` + ``batchsize``),
  executed per-partition by executors instead of one driver COPY.
- ClickHouse: CREATE TABLE IF NOT EXISTS ... ENGINE=MergeTree then insert
  (`/root/reference/ClickHouseDatabase.py:86-109`) -> ``mode("append")``
  with ``createTableOptions``.

Semantic delta vs the reference (documented, SURVEY.md §7): distributed JDBC
writes are not transactional across partitions — the reference's
single-connection rollback (`/root/reference/PostgresDatabase.py:100`) has no
exact distributed equivalent; use staging tables + atomic rename for
all-or-nothing loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_integration_and_processing_spark.functions.schema_mapping import (
    clickhouse_create_table_options,
    postgres_create_column_types,
)


def write_file(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Distributed file sink; ``partition_by`` produces hive-style layout so
    downstream scans get partition pruning."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    column_types: str | None = None,
    options: dict[str, str] | None = None,
    post_ddl: list[str] | None = None,
) -> None:
    """Dialect-neutral JDBC sink — the shared core under the PG/CH wrappers,
    and the one to use against any other JDBC database (live-tested against
    embedded Derby in tests/test_jdbc_live.py). ``column_types`` overrides
    created column DDL ("name VARCHAR(64), ..."); values must parse as Spark
    SQL types AND be valid in the target dialect. ``post_ddl`` statements
    run after the load on a driver-side connection (GRANT/INDEX/ANALYZE)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if column_types is not None:
        writer = writer.option("createTableColumnTypes", column_types)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()
    if post_ddl:
        execute_jdbc_statements(df.sparkSession, url, post_ddl)


def execute_jdbc_statements(spark, url: str, statements: list[str]) -> None:
    """Run driver-side DDL/DCL statements over a raw JDBC connection — the
    post-load hook for things DataFrameWriter can't express: the reference
    grants read access after every load
    (`/root/reference/PostgresDatabase.py:95` GRANT SELECT), index builds,
    ANALYZE, etc. Uses java.sql.DriverManager through the session JVM, so
    any driver on the Spark classpath works (live-tested against Derby)."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001 — deliberate JVM bridge
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def write_jdbc_postgres(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 10_000,
    options: dict[str, str] | None = None,
    post_ddl: list[str] | None = None,
) -> None:
    """PG sink with reference O7+O9 semantics: overwrite = drop+recreate with
    a dtype-mapped schema; batched inserts approximate the COPY fast path.
    ``post_ddl`` statements run after the load on a driver-side connection —
    the reference's post-load ``GRANT SELECT`` (PostgresDatabase.py:95)
    belongs here."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("reWriteBatchedInserts", "true")
        .option("createTableColumnTypes", postgres_create_column_types(df.schema))
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()
    if post_ddl:
        execute_jdbc_statements(df.sparkSession, url, post_ddl)


def write_jdbc_clickhouse(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    order_by: str = "tuple()",
    engine: str = "MergeTree",
    engine_params: tuple[str, ...] = (),
    batchsize: int = 100_000,
    options: dict[str, str] | None = None,
) -> None:
    """CH sink with reference O8+O10 semantics: create-if-absent MergeTree
    (or ReplicatedMergeTree with params) + bulk append."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "NONE")  # CH has no transactions
        .option("createTableOptions", clickhouse_create_table_options(order_by, engine, engine_params))
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()
