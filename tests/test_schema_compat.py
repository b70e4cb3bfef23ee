"""Schema-evolution compatibility gate for CDC feeds."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_integration_and_processing_spark.functions.schema_mapping import (
    check_schema_compatibility,
)


def _schema(*fields):
    return StructType([StructField(n, t, nullable=nu) for n, t, nu in fields])


def test_identical_and_widened_schemas_pass():
    old = _schema(("id", IntegerType(), False), ("v", StringType(), True))
    ok, why = check_schema_compatibility(old, old)
    assert ok, why
    widened = _schema(("id", LongType(), False), ("v", StringType(), True))
    ok, why = check_schema_compatibility(old, widened)
    assert ok, why


def test_new_nullable_column_passes_non_nullable_fails():
    old = _schema(("id", LongType(), False))
    ok, _ = check_schema_compatibility(old, _schema(("id", LongType(), False), ("extra", StringType(), True)))
    assert ok
    ok, why = check_schema_compatibility(old, _schema(("id", LongType(), False), ("extra", StringType(), False)))
    assert not ok and "non-nullable" in why[0]


def test_drop_narrow_and_tighten_fail():
    old = _schema(("id", LongType(), False), ("v", DoubleType(), True))
    ok, why = check_schema_compatibility(old, _schema(("id", LongType(), False)))
    assert not ok and "dropped" in why[0]
    ok, why = check_schema_compatibility(
        old, _schema(("id", IntegerType(), False), ("v", DoubleType(), True))
    )
    assert not ok and "narrowed" in why[0]
    ok, why = check_schema_compatibility(
        old, _schema(("id", LongType(), False), ("v", DoubleType(), False))
    )
    assert not ok and "non-nullable" in why[0]


def test_upsert_strict_schema_gate(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from data_integration_and_processing_spark.plans.pipelines import upsert

    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    good = base.limit(3).withColumn("n_name", F.upper("n_name"))
    assert upsert(base, good, ["n_nationkey"], strict_schema=True).count() == base.count()
    # breaking change: a column narrowed int->smallint... emulate by drop
    bad = base.limit(3).drop("n_regionkey")
    with pytest.raises(ValueError, match="dropped"):
        upsert(base, bad, ["n_nationkey"], strict_schema=True)
