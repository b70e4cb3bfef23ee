"""End-to-end ETL pipelines (reference parity: O11/O12/O13).

The reference's three menu actions (`/root/reference/ETLManager.py:50-99`)
are fixed read -> rename -> DDL -> load call chains that materialize the
whole table on one thread. Here each pipeline is a *lazy plan*: source scan
-> metadata-only rename/clean -> optional casts -> distributed sink write.
Nothing touches the driver; Catalyst fuses the projection into the scan.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_and_processing_spark.functions.naming import clean_columns, rename_columns
from data_integration_and_processing_spark.sources.readers import read_excel, read_file
from data_integration_and_processing_spark.sources.writers import write_file


def _prepare(df: DataFrame, column_mapping: dict[str, str] | None, casts: dict[str, str] | None) -> DataFrame:
    out = rename_columns(clean_columns(df), column_mapping)
    if casts:
        out = out.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})
    return out


def table_name_from_path(path: str) -> str:
    """Derive a sink table name from the source filename (reference behavior
    at /root/reference/PostgresDatabase.py:133-134)."""
    return os.path.splitext(os.path.basename(path))[0].lower()


def ingest_file(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    source_fmt: str = "csv",
    dest_fmt: str = "parquet",
    column_mapping: dict[str, str] | None = None,
    casts: dict[str, str] | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **write_options: Any,
) -> DataFrame:
    """File ingest pipeline (reference O13: XLSX -> clean/rename -> PG
    overwrite). Returns the prepared DataFrame for inspection/testing."""
    if source_fmt == "xlsx":
        df = read_excel(spark, source_path)
    else:
        df = read_file(spark, source_path, fmt=source_fmt)
    prepared = _prepare(df, column_mapping, casts)
    write_file(prepared, dest_path, fmt=dest_fmt, mode=mode, partition_by=partition_by,
               options=write_options or None)
    return prepared


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    strict_schema: bool = False,
) -> DataFrame:
    """Merge/upsert semantics — the sink mode the reference lacks (it only
    drops-and-recreates, `/root/reference/PostgresDatabase.py:72-73`, or
    blind-appends, `/root/reference/ClickHouseDatabase.py:91-95`):
    rows from ``updates`` replace same-key rows in ``target``; unmatched
    target rows survive; new keys append.

    Expressed as target-anti-join-updates UNION updates: one shuffle per
    side keyed on the merge key. On a format with native MERGE (Delta/
    Iceberg) this becomes `MERGE INTO`; the plan here is the
    format-agnostic equivalent with identical semantics.

    ``strict_schema=True`` runs the schema-evolution gate first
    (functions/schema_mapping.py::check_schema_compatibility): the updates
    feed may only widen — a producer's breaking change (dropped/narrowed/
    nullable-tightened column) raises HERE, at the boundary, instead of
    corrupting the merge or the sink downstream."""
    if strict_schema:
        from data_integration_and_processing_spark.functions.schema_mapping import (  # noqa: PLC0415
            check_schema_compatibility,
        )

        ok, reasons = check_schema_compatibility(target.schema, updates.schema)
        if not ok:
            raise ValueError(f"incompatible updates schema for upsert: {reasons}")
    surviving = target.join(updates.select(*key_cols), key_cols, "left_anti")
    return surviving.unionByName(updates)


def transfer(
    spark: SparkSession,
    source: DataFrame | str,
    dest_path: str,
    column_mapping: dict[str, str] | None = None,
    casts: dict[str, str] | None = None,
    mode: str = "overwrite",
    dest_fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Table-to-table transfer pipeline (reference O11/O12: full-table copy
    with rename between two stores). ``source`` is a DataFrame from any
    connector (read_file / read_jdbc) or a parquet path. ``mode`` carries
    the sink semantics: "overwrite" = the reference's PG drop-and-recreate,
    "append" = its CH insert-into-existing."""
    df = spark.read.parquet(source) if isinstance(source, str) else source
    prepared = _prepare(df, column_mapping, casts)
    write_file(prepared, dest_path, fmt=dest_fmt, mode=mode, partition_by=partition_by)
    return prepared


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out changed rows, append new
    versions, pass unchanged history through untouched.

    An update "changes" a key iff any tracked attribute differs from the
    key's current (open) row — no-op updates produce no new version, which
    is what keeps re-delivered batches idempotent. One equi-join on the key
    plus unions; the join broadcasts whenever the update batch is small
    (the common case: daily deltas against a big dimension), so applying a
    delta never shuffles the dimension.

    The reference's transfer pipelines overwrite or blind-append
    (/root/reference/PostgresDatabase.py:72-73,
    /root/reference/ClickHouseDatabase.py:91-95) — history is destroyed or
    duplicated; SCD2 is the standard warehouse answer.
    """
    open_rows = current.filter(F.col(valid_to).isNull())
    closed_rows = current.filter(F.col(valid_to).isNotNull())
    diff = F.lit(False)
    for c in tracked:
        diff = diff | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    changed = (
        open_rows.alias("cur")
        .join(updates.alias("upd"), F.col(f"cur.{key}") == F.col(f"upd.{key}"))
        .filter(diff)
    )
    to_close = changed.select(
        *[F.col(f"cur.{c}") for c in current.columns if c not in (valid_to,)],
        F.lit(effective).cast("date").alias(valid_to),
    ).select(*current.columns)
    new_versions = changed.select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{c}").alias(c) for c in tracked],
        F.lit(effective).cast("date").alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
    ).select(*current.columns)
    unchanged_open = open_rows.join(
        changed.select(F.col(f"cur.{key}").alias(key)), key, "left_anti"
    )
    return closed_rows.unionByName(unchanged_open).unionByName(to_close).unionByName(new_versions)


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse an ordered CDC changelog (insert/update/delete events) to the
    final table state: per key, the highest-sequence event wins; a trailing
    delete removes the key entirely.

    The reference has no change-data story at all — its transfers re-copy the
    full table (/root/reference/PostgresDatabase.py:72-73); replaying a
    changelog is how the same result is reached incrementally at scale.

    Scale shape: ONE shuffle keyed on `key_cols`, expressed as
    ``max_by(struct(...), seq)`` — a declarative aggregate, so Spark runs a
    partial (map-side) aggregate before the exchange and the shuffle carries
    one pre-collapsed row per key per input partition, not the raw event
    stream. A window/row_number formulation would sort every partition and
    cannot partially aggregate. `seq_col` must totally order events within a
    key (CDC readers guarantee this via log offsets/LSNs); the struct
    collapse is atomic, so mixed columns from different events are
    impossible even under re-delivery.
    """
    payload = [c for c in changelog.columns if c not in key_cols]
    latest = changelog.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(seq_col)).alias("_latest")
    )
    out = latest.select(*key_cols, "_latest.*")
    return out.filter(F.col(op_col) != delete_op).drop(op_col, seq_col)


def transfer_incremental(
    source: DataFrame,
    target: DataFrame,
    watermark_col: str,
) -> DataFrame:
    """High-watermark incremental load: append only source rows strictly newer
    than the target's max watermark (the standard alternative to the
    reference's full-table re-copy).

    The watermark is a scalar aggregate on the target (at production scale:
    read from sink metadata / partition names instead of scanning); the
    `>` predicate on the source is pushed into the parquet scan, so row
    groups whose max(watermark) precede the cutoff are skipped entirely —
    the incremental read costs O(new data), not O(table).
    """
    cutoff = target.agg(F.max(watermark_col)).collect()[0][0]
    fresh = source if cutoff is None else source.filter(F.col(watermark_col) > F.lit(cutoff))
    return target.unionByName(fresh)


def backfill(
    spark: SparkSession,
    partition_fn: Callable[[SparkSession, str], DataFrame],
    dest: str,
    partitions: Sequence[str],
    partition_col: str = "p",
    force: Sequence[str] = (),
) -> dict[str, str]:
    """Idempotent partitioned backfill: (re)compute each named partition
    through ``partition_fn(spark, p)`` and land it atomically under
    ``dest/{partition_col}={p}/``; partitions already present are skipped
    unless listed in ``force``.

    The unit of work and of atomicity is ONE partition: each lands in a
    ``_tmp`` sibling and is renamed into place, so a crash mid-backfill
    leaves every completed partition readable and every incomplete one
    invisible — re-running converges (the reference's whole-table re-copy,
    `/root/reference/ETLManager.py:60-99`, restarts from zero instead).
    Returns {partition: "written" | "skipped"} for the run's audit log.

    At cluster scale the driver loop only sequences job submission —
    each partition's compute is a full distributed job, and independent
    partitions can be submitted from concurrent threads because their
    directories never overlap.
    """
    import os as _os  # noqa: PLC0415
    import shutil as _shutil  # noqa: PLC0415

    outcome: dict[str, str] = {}
    for p in partitions:
        part_dir = f"{dest}/{partition_col}={p}"
        if _os.path.exists(part_dir) and p not in force:
            outcome[p] = "skipped"
            continue
        tmp_dir = f"{dest}/_tmp_{partition_col}={p}"
        _shutil.rmtree(tmp_dir, ignore_errors=True)
        partition_fn(spark, p).write.mode("overwrite").parquet(tmp_dir)
        _shutil.rmtree(part_dir, ignore_errors=True)
        _os.replace(tmp_dir, part_dir)
        outcome[p] = "written"
    return outcome


def incremental_agg_merge(
    snapshot_agg: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Materialized-view delta maintenance for distributive aggregates:
    merge a maintained aggregate table with the aggregates of an
    insert-delta and a delete-delta, never rescanning the base table.

    ``snapshot_agg`` has columns ``keys + n_rows + sum_<c> for c in
    sum_cols`` (the same shape this function returns, so maintenance
    composes across loads). Counts and sums are distributive: merged =
    snapshot (+) agg(inserts) (-) agg(deletes); groups whose count reaches
    zero vanish, new groups appear from the insert side. AVG and friends
    derive from (sum, count) downstream.

    At 100 TB the base table is never touched — the cost is
    O(|delta| + |groups|): one aggregate per delta (map-side combinable)
    and a full-outer join keyed by the group key against the O(groups)
    snapshot. The correctness claim is equational — maintained result ==
    full recompute over (base \\ deletes) U inserts — and the catalog
    query's oracle IS that full recompute.
    """

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count("*").alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        )

    ins, dels = agg_of(inserts), agg_of(deletes)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *keys,
            F.col("n_rows").alias(f"n_{tag}"),
            *[F.col(f"sum_{c}").alias(f"s_{tag}_{c}") for c in sum_cols],
        )

    merged = (
        side(snapshot_agg, "snap")
        .join(side(ins, "ins"), list(keys), "full_outer")
        .join(side(dels, "del"), list(keys), "full_outer")
    )
    z = F.lit(0)
    n = (
        F.coalesce("n_snap", z) + F.coalesce("n_ins", z) - F.coalesce("n_del", z)
    ).alias("n_rows")
    # zero-fill with the snapshot's own sum dtype: a bare 0.0 literal would
    # promote DECIMAL-maintained sums to DOUBLE in the coalesce and silently
    # reintroduce accumulation-order noise into the merge arithmetic
    ztype = {c: snapshot_agg.schema[f"sum_{c}"].dataType.simpleString() for c in sum_cols}
    sums = [
        (
            F.coalesce(f"s_snap_{c}", F.lit(0).cast(ztype[c]))
            + F.coalesce(f"s_ins_{c}", F.lit(0).cast(ztype[c]))
            - F.coalesce(f"s_del_{c}", F.lit(0).cast(ztype[c]))
        ).alias(f"sum_{c}")
        for c in sum_cols
    ]
    return merged.select(*keys, n, *sums).filter(F.col("n_rows") > 0)
