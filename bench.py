#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) — results are small
aggregates/top-ks by construction, so collect measures execution, not
driver materialization. A warmup run of the flagship query is excluded to
keep JVM/codegen startup out of per-query numbers (total still includes
everything measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_integration_and_processing_spark.queries import catalog  # noqa: E402
from data_integration_and_processing_spark.session import get_spark  # noqa: E402

# Representative slice of the catalog: ETL, relational joins/aggs/windows,
# every north-star family, and the streaming batch twin.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_volume_customers",
    "join_broadcast_dim",
    "join_asof_event",
    "agg_count_distinct",
    "agg_rollup",
    "window_topk_per_group",
    "etl_clean_rename_projection",
    "udf_grouped_map_zscore",
    "skew_salted_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "sim_neardup_pairs",
    "text_fingerprint",
    "text_quality_score",
    "stream_tumbling_window",
    "stream_session_window",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = catalog.all_specs()

    # warmup: JVM + codegen + parquet footer caches
    specs["q1_pricing_summary"].spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        n = len(specs[name].spark(spark, sf_dir).collect())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
