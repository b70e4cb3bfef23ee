"""Distributed XLSX source: a Spark 4 Python DataSource (one partition per
file, executor-side parsing).

The reference ingests XLSX with a single driver-side ``pd.read_excel``
(`/root/reference/PostgresDatabase.py:130`), and ``read_excel`` here keeps
that posture for one small file. This source upgrades O1 to Spark's actual
execution model for xlsx DROPS (directories of many workbook files, the
shape batch vendors deliver): ``partitions()`` lists the files, ``read``
parses one file per task with the same stdlib zipfile+ElementTree parser —
the driver never touches cell data, and a 10k-file drop scans with 10k-way
parallelism.

Usage::

    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("xlsx")
          .schema("name string, rating double")
          .option("path", "/drops/reviews/*.xlsx")
          .load())

Cells arrive as str/float/bool/None from the parser; values are coerced to
the user schema (string/double/bigint/boolean) per column — the same
pandas-free coercion read_excel applies.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from data_integration_and_processing_spark.sources.xlsx import read_xlsx_rows, write_minimal_xlsx


def _coerce(v, dtype: str):
    if v is None:
        return None
    try:
        if dtype in ("double", "float"):
            return float(v)
        if dtype in ("bigint", "long", "int", "integer"):
            return int(float(v))
        if dtype == "boolean":
            return bool(v)
        return str(v)
    except (TypeError, ValueError):
        return None


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict, schema) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("xlsx source requires .option('path', ...) or load(path)")
        self._sheet = int(options.get("sheet", 0))
        self._header = options.get("header", "true").lower() == "true"
        self._fields: Sequence[tuple[str, str]] = [
            (f.name, f.dataType.simpleString()) for f in schema.fields
        ]

    def partitions(self) -> list[InputPartition]:
        files = sorted(_glob.glob(self._path))
        if not files:
            raise FileNotFoundError(f"no files match {self._path!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        rows = read_xlsx_rows(partition.value, sheet_name=self._sheet)
        data = rows[1:] if (self._header and rows) else rows
        n = len(self._fields)
        for row in data:
            padded = list(row[:n]) + [None] * (n - len(row))
            yield tuple(_coerce(v, dt) for v, (_, dt) in zip(padded, self._fields))


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> str:
        # schema-less load: infer column names from the first file's header
        # row, everything string — explicit .schema() is the scale path
        # (inference reads one file on the driver)
        path = self.options.get("path")
        files = sorted(_glob.glob(path)) if path else []
        if not files:
            raise ValueError("xlsx source requires .option('path', ...) for schema inference")
        rows = read_xlsx_rows(files[0], sheet_name=int(self.options.get("sheet", 0)))
        if not rows:
            raise ValueError(f"cannot infer schema from empty workbook {files[0]!r}")
        return ", ".join(f"`{str(h)}` string" for h in rows[0])

    def reader(self, schema) -> XlsxReader:
        return XlsxReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "XlsxWriter":
        return XlsxWriter(self.options, schema)


@dataclass
class _XlsxCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str
    n_rows: int


class XlsxWriter(DataSourceWriter):
    """One workbook per partition with a rename-on-commit protocol: tasks
    land ``.tmp`` files under unique attempt names, the driver's commit()
    renames exactly the attempts that reported success — a lost/duplicated
    speculative attempt leaves only an orphaned tmp (swept here), never a
    half-visible or doubled shard."""

    def __init__(self, options: dict, schema) -> None:
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("xlsx sink requires .option('path', <directory>)")
        self._header = [f.name for f in schema.fields]

    def write(self, iterator) -> _XlsxCommit:
        import os as _os  # noqa: PLC0415
        import uuid as _uuid  # noqa: PLC0415

        from pyspark import TaskContext  # noqa: PLC0415

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        _os.makedirs(self._dir, exist_ok=True)
        attempt = _uuid.uuid4().hex[:8]
        tmp = f"{self._dir}/.part-{pid:05d}-{attempt}.xlsx.tmp"
        rows = [[None if v is None else v for v in row] for row in iterator]
        write_minimal_xlsx(tmp, header=self._header, rows=rows)
        return _XlsxCommit(tmp, f"{self._dir}/part-{pid:05d}.xlsx", len(rows))

    def commit(self, messages) -> None:
        import glob as _g  # noqa: PLC0415
        import os as _os  # noqa: PLC0415

        for m in messages:
            _os.replace(m.tmp_path, m.final_path)
        for stray in _g.glob(f"{self._dir}/.part-*.xlsx.tmp"):
            _os.remove(stray)

    def abort(self, messages) -> None:
        import os as _os  # noqa: PLC0415

        for m in messages:
            try:
                _os.remove(m.tmp_path)
            except OSError:
                pass
