"""Run every catalog query on Spark and its oracle on DuckDB; compare.

This is a local replica of the driver's CORRECTNESS gate (sf=0.01).
Queries without an oracle get a rows-only smoke check.
"""

from __future__ import annotations

import pytest

from data_integration_and_processing_spark.queries import catalog
from tests.oracle_harness import compare_frames

SPECS = catalog.all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, ddb, sf_dir):
    spec = SPECS[name]
    sdf = spec.spark(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only: must run and produce a stable schema
        assert spark_pdf is not None
        assert len(sdf.columns) > 0
        return
    oracle_pdf = ddb.execute(spec.oracle).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
