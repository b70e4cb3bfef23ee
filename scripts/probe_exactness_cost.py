#!/usr/bin/env python
"""A/B probe for VERDICT r13 item 5: can the two r13 exactness conversions
get cheaper WITHOUT changing their hashes?

Arms:
- etl_incremental_agg_maintenance: DECIMAL(18,2)-maintained sums (current)
  vs integer-CENTS longs (candidate). cents/100.0 is a correctly-rounded
  double division of an exact dyadic pair, i.e. the SAME binary64 the
  DECIMAL->DOUBLE cast produces — so the candidate is hash-preserving by
  construction; this probe verifies value equality row-for-row AND times
  both arms best-of-3 at the bench SF.
- analytics_rfm_segmentation: timed as-is for the record (its integer-micro
  chain has no cheaper exact alternative candidate; the DECIMAL it uses is
  only in the per-customer monetary sum).

Usage: python scripts/probe_exactness_cost.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _time(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def cents_variant(spark, sf_dir: str):
    """etl_incremental_agg_maintenance with long-cents maintained sums."""
    from data_integration_and_processing_spark.plans.pipelines import (
        incremental_agg_merge,
    )
    from data_integration_and_processing_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 5 != 0)
    deletes = base.filter(F.col("l_orderkey") % 7 == 3)
    inserts = li.filter(F.col("l_orderkey") % 5 == 0)
    keys = ["l_returnflag", "l_linestatus"]
    sums = ["l_quantity", "l_extendedprice"]
    to_cents = {c: F.round(F.col(c) * 100, 0).cast("long") for c in sums}
    base = base.withColumns(to_cents)
    inserts = inserts.withColumns(to_cents)
    deletes = deletes.withColumns(to_cents)
    snapshot = base.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sums],
    )
    merged = incremental_agg_merge(snapshot, inserts, deletes, keys, sums)
    return merged.select(
        *keys,
        "n_rows",
        # cents/100.0 is the correctly-rounded double of the exact cents
        # rational == the DECIMAL->DOUBLE cast's double: hash-identical
        F.round(F.col("sum_l_quantity") / F.lit(100.0), 2).alias("sum_l_quantity"),
        F.round(F.col("sum_l_extendedprice") / F.lit(100.0), 2).alias(
            "sum_l_extendedprice"
        ),
    ).orderBy(*keys)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from data_integration_and_processing_spark.queries import catalog
    from data_integration_and_processing_spark.session import get_spark

    spark = get_spark(app_name="exactness-cost-probe")
    specs = catalog.all_specs()
    cur = specs["etl_incremental_agg_maintenance"].spark
    sf = args.sf_dir

    cur_rows = sorted(map(tuple, cur(spark, sf).collect()))
    cand_rows = sorted(map(tuple, cents_variant(spark, sf).collect()))
    equal = cur_rows == cand_rows

    t_cur = _time(lambda: cur(spark, sf).collect())
    t_cand = _time(lambda: cents_variant(spark, sf).collect())
    t_rfm = _time(lambda: specs["analytics_rfm_segmentation"].spark(spark, sf).collect())

    print(json.dumps({
        "probe": "exactness_cost",
        "sf_dir": sf,
        "incremental_agg": {
            "decimal_sec": t_cur,
            "cents_sec": t_cand,
            "speedup": round(t_cur / t_cand, 3) if t_cand else None,
            "values_equal": equal,
        },
        "rfm_sec": t_rfm,
    }))
    return 0 if equal else 1


if __name__ == "__main__":
    sys.exit(main())
