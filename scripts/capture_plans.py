#!/usr/bin/env python
"""Capture `.explain("formatted")` output for headline/catalog queries.

Optimization-round tooling (guide §1.1/§7.2): writes one
``plans/r15/<name>_<suffix>.txt`` per query so plan claims ("2 Exchange ->
1", "SortMergeJoin -> BroadcastHashJoin") are checkable without running
Spark.

Usage:
  python scripts/capture_plans.py --suffix before --only q1_pricing_summary,...
  python scripts/capture_plans.py --suffix after --only ...   # after an edit

Notes:
- Queries whose construction runs eager work (localCheckpoint, fixture
  index builds, bounded collects) execute that work during capture; the
  captured plan is the FINAL composed fragment the noop sink would run —
  the same thing bench.py times.
- Default SF dir matches the bench (sf0.1) so plan shapes (AQE thresholds,
  broadcast estimates) match what the bench measures.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_integration_and_processing_spark.queries import catalog  # noqa: E402
from data_integration_and_processing_spark.session import get_spark  # noqa: E402


def _explain_formatted(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True, help="before | after")
    ap.add_argument("--only", default="", help="comma-separated query names (default: bench HEADLINE)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"))
    args = ap.parse_args()

    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    else:
        import bench  # noqa: PLC0415

        names = list(bench.HEADLINE)

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = catalog.all_specs()

    import bench  # noqa: PLC0415

    raw_paths = bench._raw_headline_paths()

    rc = 0
    for name in names:
        t0 = time.time()
        try:
            fn = raw_paths[name] if name in raw_paths else specs[name].spark
            df = fn(spark, args.sf_dir)
            text = _explain_formatted(df)
        except Exception as exc:  # noqa: BLE001 — record the failure, keep capturing
            text = f"CAPTURE ERROR: {exc!r}\n"
            rc = 1
        out = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as f:
            f.write(text)
        print(f"# {name}: {len(text)} chars -> {out} ({time.time() - t0:.1f}s)", file=sys.stderr)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
