"""Type-system bridge: pandas dtypes <-> Spark types <-> sink DDL strings.

Reference parity for the two dtype->DDL lookup tables
(`/root/reference/PostgresDatabase.py:55-65` and
`/root/reference/ClickHouseDatabase.py:66-84`), rebuilt around Spark's
``StructType`` as the canonical schema:

- pandas -> Spark (ingest side), including the unsigned-int widening rule —
  Spark has no unsigned ints, so uint8/16/32 widen to the next larger
  signed type and uint64 becomes ``DecimalType(20, 0)``.
- Spark -> PostgreSQL DDL (for ``createTableColumnTypes`` on JDBC writes;
  overwrite sink, reference O7).
- Spark -> ClickHouse DDL (everything ``Nullable(...)``, matching the
  reference's all-nullable CH schema; append sink, reference O8).
"""

from __future__ import annotations

from pyspark.sql import types as T

# pandas dtype string -> Spark type. Unknown dtypes fall back to StringType
# (the reference defaults unknown dtypes to varchar/String).
_PANDAS_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),          # widen: no unsigned in Spark
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),  # full uint64 range needs 20 digits
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "object": T.StringType(),
    "string": T.StringType(),
    "category": T.StringType(),
    "datetime64[ns]": T.TimestampType(),
    "datetime64[us]": T.TimestampType(),
    "datetime64[ms]": T.TimestampType(),
    "datetime64[ns, UTC]": T.TimestampType(),
    # improvement over the reference, which stringifies timedeltas
    # (/root/reference/PostgresDatabase.py:63)
    "timedelta64[ns]": T.DayTimeIntervalType(),
}


def pandas_dtype_to_spark(dtype: str) -> T.DataType:
    return _PANDAS_TO_SPARK.get(str(dtype), T.StringType())


def schema_for_pandas(pdf) -> T.StructType:
    """Explicit StructType for a pandas frame (avoids inference drift)."""
    return T.StructType(
        [T.StructField(str(c), pandas_dtype_to_spark(d), nullable=True) for c, d in pdf.dtypes.items()]
    )


def spark_type_to_postgres_ddl(dt: T.DataType) -> str:
    """Spark type -> PostgreSQL column DDL (reference map at
    /root/reference/PostgresDatabase.py:55-65, default varchar)."""
    mapping: list[tuple[type, str]] = [
        (T.DoubleType, "double precision"),
        (T.FloatType, "real"),
        (T.DecimalType, "numeric"),
        (T.LongType, "bigint"),
        (T.IntegerType, "integer"),
        (T.ShortType, "smallint"),
        (T.ByteType, "smallint"),
        (T.BooleanType, "boolean"),
        (T.TimestampType, "timestamp"),
        (T.DateType, "date"),
        (T.DayTimeIntervalType, "interval"),
        (T.BinaryType, "bytea"),
    ]
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    for cls, ddl in mapping:
        if isinstance(dt, cls):
            return ddl
    return "varchar"


def spark_type_to_clickhouse_ddl(dt: T.DataType) -> str:
    """Spark type -> ClickHouse column DDL, all Nullable (reference map at
    /root/reference/ClickHouseDatabase.py:66-84, default Nullable(String))."""
    mapping: list[tuple[type, str]] = [
        (T.DoubleType, "Float64"),
        (T.FloatType, "Float32"),
        (T.LongType, "Int64"),
        (T.IntegerType, "Int32"),
        (T.ShortType, "Int16"),
        (T.ByteType, "Int8"),
        (T.BooleanType, "UInt8"),
        (T.TimestampType, "DateTime"),
        (T.DateType, "Date"),
        (T.BinaryType, "String"),
    ]
    if isinstance(dt, T.DecimalType):
        return f"Nullable(Decimal({dt.precision},{dt.scale}))"
    for cls, ddl in mapping:
        if isinstance(dt, cls):
            return f"Nullable({ddl})"
    return "Nullable(String)"


def postgres_create_column_types(schema: T.StructType) -> str:
    """Value for DataFrameWriter ``createTableColumnTypes`` targeting PG."""
    return ", ".join(f"{f.name} {spark_type_to_postgres_ddl(f.dataType)}" for f in schema.fields)


def clickhouse_create_table_options(order_by: str = "tuple()", engine: str = "MergeTree",
                                    engine_params: tuple[str, ...] = ()) -> str:
    """Value for DataFrameWriter ``createTableOptions`` targeting ClickHouse
    (reference engine selection at /root/reference/ClickHouseDatabase.py:86-100,
    incl. ReplicatedMergeTree params)."""
    if engine == "ReplicatedMergeTree" and engine_params:
        engine_clause = f"ReplicatedMergeTree({', '.join(repr(p) for p in engine_params)})"
    else:
        engine_clause = engine
    return f"ENGINE = {engine_clause} ORDER BY {order_by}"


# ---------------------------------------------------------------------------
# schema-evolution compatibility (CDC feed governance)
# ---------------------------------------------------------------------------

# Safe widenings a reader can apply losslessly (Spark's own ANSI store
# assignment rules, restricted to the always-safe subset).
_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
    ("float", "double"),
    ("date", "timestamp"),
}


def check_schema_compatibility(old, new) -> tuple[bool, list[str]]:
    """Can data written with ``old`` be read/merged under ``new``?

    The contract an evolving CDC feed must keep: every old column still
    exists with the same or a safely WIDENED type (int->bigint,
    float->double, date->timestamp); brand-new columns must be nullable
    (old rows have no value for them); a non-nullable old column may not
    become... anything missing. Returns (compatible, human reasons) — the
    gate a pipeline runs BEFORE cdc_apply/upsert so a producer's breaking
    change fails loudly at the boundary instead of corrupting the merge.
    """
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    reasons: list[str] = []
    for name, f in old_fields.items():
        nf = new_fields.get(name)
        if nf is None:
            reasons.append(f"column {name!r} dropped (old rows would lose data)")
            continue
        o_t, n_t = f.dataType.simpleString(), nf.dataType.simpleString()
        if o_t != n_t and (o_t, n_t) not in _WIDENINGS:
            reasons.append(f"column {name!r} narrowed or changed: {o_t} -> {n_t}")
        if f.nullable and not nf.nullable:
            reasons.append(f"column {name!r} tightened to non-nullable (old rows may hold NULL)")
    for name, nf in new_fields.items():
        if name not in old_fields and not nf.nullable:
            reasons.append(f"new column {name!r} is non-nullable (old rows have no value)")
    return (not reasons, reasons)
