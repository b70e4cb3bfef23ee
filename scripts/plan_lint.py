#!/usr/bin/env python
"""Plan lint: sweep EVERY catalog query's physical plan for scale
anti-patterns that correctness gates cannot see.

Rules (each with a deliberate-usage whitelist):
- CARTESIAN: a CartesianProduct operator — an all-pairs join that did not
  broadcast; at 100 TB this is the difference between a job and an outage.
- PY_ROW_UDF: BatchEvalPython — a row-at-a-time (pickled) Python UDF in the
  data path; everything Python-side must be Arrow-batched (ArrowEvalPython /
  mapInPandas / applyInPandas).
- GLOBAL_WINDOW: a Window operator with an empty partition spec — a global
  sort onto ONE reducer. Fine on O(groups) intermediates (whitelisted per
  query); fatal on row-count-sized inputs.

Usage: python scripts/plan_lint.py [--only a,b] [--sf-dir ...]
Prints one JSON line per violation and a summary; exit 1 on any
non-whitelisted hit.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> rules deliberately allowed, with the reason the plan is still
# scale-sane (kept next to the whitelist so it can't rot silently).
WHITELIST: dict[str, dict[str, str]] = {
    # 5x5 region pairs: a deliberate constant-size cross join
    "join_cross": {"CARTESIAN": "deliberate 5x5 region cartesian (constant)"},
    # global windows over O(groups)/O(vocab)/O(candidates) intermediates,
    # never over row-count-sized inputs:
    "window_topk_per_group": {},
}


def find_violations(plan: str) -> list[str]:
    out = []
    if "CartesianProduct" in plan:
        out.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        out.append("PY_ROW_UDF")
    # Spark renders a partitioned window as `Window [exprs], [partition],
    # [order]` (two `], [` separators) and a GLOBAL window as
    # `Window [exprs], [order]` (one separator).
    for m in re.finditer(r"^[\s:+\-|]*Window (\[.+)$", plan, re.MULTILINE):
        if m.group(1).count("], [") == 1:
            out.append("GLOBAL_WINDOW")
            break
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from data_integration_and_processing_spark.queries import catalog
    from data_integration_and_processing_spark.session import get_spark

    spark = get_spark(app_name="plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    specs = catalog.all_specs()
    only = set(args.only.split(",")) if args.only else None

    n_checked = n_viol = n_skipped = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        try:
            df = spec.spark(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — streaming/scratch queries may not plan statically
            n_skipped += 1
            print(json.dumps({"query": name, "status": "SKIP", "why": str(e)[:120]}))
            continue
        n_checked += 1
        hits = find_violations(plan)
        allowed = WHITELIST.get(name, {})
        real = [h for h in hits if h not in allowed]
        for h in hits:
            if h in allowed:
                print(json.dumps({"query": name, "rule": h, "status": "WHITELISTED",
                                  "reason": allowed[h]}))
        if real:
            n_viol += 1
            print(json.dumps({"query": name, "rules": real, "status": "VIOLATION"}))
    print(json.dumps({"plan_lint": {"checked": n_checked, "violations": n_viol,
                                    "skipped": n_skipped}}))
    spark.stop()
    return 1 if n_viol else 0


if __name__ == "__main__":
    raise SystemExit(main())
