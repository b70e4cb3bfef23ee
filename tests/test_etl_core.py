"""Unit tests for the ETL core: naming, schema mapping, retry, pipelines."""

from __future__ import annotations

import logging

import pandas as pd
import pytest
from pyspark.sql import types as T

from data_integration_and_processing_spark.functions.naming import clean_columns, clean_name, rename_columns
from data_integration_and_processing_spark.functions.schema_mapping import (
    clickhouse_create_table_options,
    pandas_dtype_to_spark,
    postgres_create_column_types,
    schema_for_pandas,
    spark_type_to_clickhouse_ddl,
    spark_type_to_postgres_ddl,
)
from data_integration_and_processing_spark.plans.pipelines import table_name_from_path
from data_integration_and_processing_spark.plans.retry import retry


class TestCleanName:
    @pytest.mark.parametrize(
        ("raw", "expected"),
        [
            ("Product Name", "product_name"),
            ("acct-bal", "acct_bal"),
            ("a/b\\c", "a_b_c"),
            ("Total (%)?$", "total"),
            ("  Mixed Case-Col  ", "mixed_case_col"),
            ("already_clean", "already_clean"),
            ("a  b--c", "a_b_c"),
        ],
    )
    def test_clean(self, raw, expected):
        assert clean_name(raw) == expected

    def test_clean_columns_rejects_collisions(self, spark):
        df = spark.range(1).selectExpr("id as `A B`", "id as `a_b`")
        with pytest.raises(ValueError, match="duplicate"):
            clean_columns(df)

    def test_rename_ignores_missing_keys(self, spark):
        df = spark.range(1).selectExpr("id as x")
        out = rename_columns(df, {"x": "y", "nope": "z"})
        assert out.columns == ["y"]


class TestSchemaMapping:
    def test_unsigned_widening(self):
        assert pandas_dtype_to_spark("uint8") == T.ShortType()
        assert pandas_dtype_to_spark("uint16") == T.IntegerType()
        assert pandas_dtype_to_spark("uint32") == T.LongType()
        assert pandas_dtype_to_spark("uint64") == T.DecimalType(20, 0)

    def test_unknown_dtype_defaults_to_string(self):
        assert pandas_dtype_to_spark("complex128") == T.StringType()

    def test_schema_for_pandas_roundtrip(self, spark):
        pdf = pd.DataFrame(
            {
                "i": pd.array([1, 2], dtype="uint32"),
                "f": [1.5, 2.5],
                "s": ["a", "b"],
                "t": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                "b": [True, False],
            }
        )
        sdf = spark.createDataFrame(pdf, schema=schema_for_pandas(pdf))
        got = dict(sdf.dtypes)
        assert got == {"i": "bigint", "f": "double", "s": "string", "t": "timestamp", "b": "boolean"}
        assert sdf.count() == 2

    def test_pg_ddl(self):
        assert spark_type_to_postgres_ddl(T.DoubleType()) == "double precision"
        assert spark_type_to_postgres_ddl(T.StringType()) == "varchar"
        assert spark_type_to_postgres_ddl(T.DecimalType(20, 0)) == "numeric(20,0)"
        assert postgres_create_column_types(
            T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
        ) == "a bigint, b varchar"

    def test_ch_ddl_all_nullable(self):
        assert spark_type_to_clickhouse_ddl(T.LongType()) == "Nullable(Int64)"
        assert spark_type_to_clickhouse_ddl(T.StringType()) == "Nullable(String)"
        assert spark_type_to_clickhouse_ddl(T.BooleanType()) == "Nullable(UInt8)"

    def test_ch_create_options(self):
        assert clickhouse_create_table_options() == "ENGINE = MergeTree ORDER BY tuple()"
        assert (
            clickhouse_create_table_options("tuple()", "ReplicatedMergeTree", ("/zk/t", "r1"))
            == "ENGINE = ReplicatedMergeTree('/zk/t', 'r1') ORDER BY tuple()"
        )


class TestRetry:
    def test_succeeds_after_failures(self):
        calls = {"n": 0}

        @retry(retries=3, delay=0.0)
        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return "ok"

        assert flaky() == "ok"
        assert calls["n"] == 3

    def test_reraises_on_exhaustion(self, caplog):
        @retry(retries=2, delay=0.0, logger=logging.getLogger("t"))
        def always_fails():
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"), caplog.at_level(logging.WARNING, "t"):
            always_fails()


def test_table_name_from_path():
    assert table_name_from_path("/data/Wildberries_Reviews.XLSX") == "wildberries_reviews"


def test_read_excel_gated_without_openpyxl(spark, tmp_path):
    """O1 XLSX ingest: with no openpyxl in the container, the shim must
    fail with the documented NotImplementedError (pointing at the CSV/
    parquet path), not a raw ImportError mid-pipeline."""
    import zipfile

    import pytest as _pytest

    from data_integration_and_processing_spark.sources.readers import read_excel

    path = tmp_path / "mini.xlsx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", "<workbook/>")
        z.writestr("[Content_Types].xml", "<Types/>")
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError, match="CSV/parquet"):
            read_excel(spark, str(path))
    else:  # environment with openpyxl: the shim should read it or fail on content
        _pytest.skip("openpyxl present; gated path not reachable")


def test_scd2_reapply_is_noop(spark, sf_dir):
    """Re-delivering the same delta after it has been applied must produce
    no new versions (idempotent ingestion)."""
    from pyspark.sql import functions as F

    from data_integration_and_processing_spark.plans.pipelines import scd2_apply
    from data_integration_and_processing_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").limit(200)
    current = c.select(
        "c_custkey", "c_name", "c_acctbal",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 50.0).alias("c_acctbal")
    )
    once = scd2_apply(current, updates, "c_custkey", ["c_name", "c_acctbal"], "2024-06-01")
    n_versions = once.count()
    assert n_versions > current.count()  # changes created new versions
    twice = scd2_apply(once, updates, "c_custkey", ["c_name", "c_acctbal"], "2024-07-01")
    assert twice.count() == n_versions  # same delta again: nothing to do
    # exactly one open row per key, always
    open_per_key = twice.filter(F.col("valid_to").isNull()).groupBy("c_custkey").count()
    assert open_per_key.filter(F.col("count") != 1).count() == 0


def test_corrupt_csv_rows_are_quarantined(spark, tmp_path):
    """Malformed input must not abort a 100 TB load: PERMISSIVE CSV read
    nulls bad fields and captures the raw line in _corrupt_record, so bad
    rows can be split off to a dead-letter sink instead of killing the job."""
    from pyspark.sql import functions as F

    p = tmp_path / "dirty.csv"
    p.write_text("id,amount\n1,10.5\n2,not_a_number\n3,7.25\n")
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("id long, amount double, _corrupt_record string")
        .csv(str(p))
    ).cache()  # corrupt-record capture requires materializing the parsed row
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.collect()[0]["_corrupt_record"] == "2,not_a_number"


def test_cli_transfer_roundtrip(tmp_path):
    """The CLI twin of the reference's menu actions runs end-to-end in a
    fresh process: transfer with rename + overwrite semantics."""
    import subprocess
    import sys

    out = tmp_path / "sink"
    r = subprocess.run(
        [sys.executable, "-m", "data_integration_and_processing_spark", "transfer",
         "--source", "/root/testdata/sf0.001/region.parquet",
         "--dest", str(out), "--rename", "r_regionkey=region_key,r_name=region_name"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote 5 rows" in r.stdout
    import duckdb

    cols = {c[0] for c in duckdb.sql(f"DESCRIBE SELECT * FROM '{out}/*.parquet'").fetchall()}
    assert {"region_key", "region_name"} <= cols
