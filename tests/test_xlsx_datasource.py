"""Distributed XLSX source (Spark 4 Python DataSource): partition-per-file
parallelism, schema coercion, and inference."""

from __future__ import annotations

import pytest

from data_integration_and_processing_spark.sources.xlsx import write_minimal_xlsx


@pytest.fixture()
def xlsx_drop(tmp_path):
    for i in range(3):
        write_minimal_xlsx(
            str(tmp_path / f"part{i}.xlsx"),
            header=["name", "rating", "stocked"],
            rows=[[f"w{i}-{j}", float(i * 10 + j), j % 2 == 0] for j in range(4)],
        )
    return str(tmp_path)


def _registered(spark):
    from data_integration_and_processing_spark.sources.xlsx_datasource import XlsxDataSource

    try:
        spark.dataSource.register(XlsxDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    return spark


def test_partition_per_file_scan(spark, xlsx_drop):
    df = (
        _registered(spark)
        .read.format("xlsx")
        .schema("name string, rating double, stocked boolean")
        .option("path", f"{xlsx_drop}/*.xlsx")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one task per workbook file
    got = sorted(map(tuple, df.collect()))
    assert len(got) == 12
    assert got[0] == ("w0-0", 0.0, True)
    assert got[-1] == ("w2-3", 23.0, False)


def test_schema_inference_from_header(spark, xlsx_drop):
    df = (
        _registered(spark)
        .read.format("xlsx")
        .option("path", f"{xlsx_drop}/*.xlsx")
        .load()
    )
    assert df.columns == ["name", "rating", "stocked"]
    # schema-less mode: everything string (integral floats render as ints,
    # matching the parser's int-narrowing)
    row = sorted(map(tuple, df.collect()))[0]
    assert row == ("w0-0", "0", "True")


def test_missing_files_raise(spark, tmp_path):
    df_reader = (
        _registered(spark)
        .read.format("xlsx")
        .schema("a string")
        .option("path", f"{tmp_path}/nope/*.xlsx")
    )
    with pytest.raises(Exception, match="no files match|FileNotFound"):
        df_reader.load().collect()


def test_write_then_read_roundtrip(spark, tmp_path):
    """Distributed xlsx WRITE (one workbook per partition, rename-on-commit)
    then distributed read back."""
    from pyspark.sql import functions as F

    dest = str(tmp_path / "out")
    df = spark.range(0, 40, 1, 4).select(
        F.col("id").alias("k"), F.concat(F.lit("row-"), F.col("id")).alias("label")
    )
    (
        _registered(spark)
        .createDataFrame(df.collect(), df.schema)  # stable 4-partition input
        .repartition(4)
        .write.format("xlsx")
        .mode("append")
        .option("path", dest)
        .save()
    )
    import glob
    import os

    files = sorted(glob.glob(f"{dest}/part-*.xlsx"))
    assert len(files) == 4
    assert not glob.glob(f"{dest}/.part-*.tmp")  # commit swept temporaries
    back = (
        spark.read.format("xlsx")
        .schema("k bigint, label string")
        .option("path", f"{dest}/part-*.xlsx")
        .load()
    )
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want
    assert os.path.getsize(files[0]) > 0
