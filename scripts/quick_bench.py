#!/usr/bin/env python
"""Subset bench for the optimization loop: time named headline queries
best-of-N through the noop sink WITHOUT the standing probes.

Same methodology as bench.py (warmups, noop sink, best-of-3) so numbers are
comparable within a session; cross-session comparisons still go through
bench.py's canary normalization. Never writes BENCH_DETAIL.json.

Usage:
  python scripts/quick_bench.py q1_pricing_summary sim_ann_join_ivf
  python scripts/quick_bench.py --runs 5 dedup_ngram_jaccard_prefix
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from data_integration_and_processing_spark.queries import catalog  # noqa: E402
from data_integration_and_processing_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="quick_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = catalog.all_specs()

    # warmups: flagship (JVM/codegen/parquet footers), Arrow workers, noop path
    specs["q1_pricing_summary"].spark(spark, args.sf_dir).collect()
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415
    from pyspark.sql.types import DoubleType  # noqa: PLC0415

    @pandas_udf(DoubleType())
    def _warm(v: pd.Series) -> pd.Series:
        time.sleep(0.3)
        return v * 1.0

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores, numPartitions=n_cores).select(_warm("id")).collect()
    spark.range(1).write.format("noop").mode("overwrite").save()

    import bench  # noqa: PLC0415

    raw_paths = bench._raw_headline_paths()
    timings: dict[str, float] = {}
    for name in args.names:
        fn = raw_paths[name] if name in raw_paths else specs[name].spark
        spark.sparkContext.setJobDescription(f"quick_bench: {name}")
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps(timings))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
