#!/usr/bin/env python
"""Merge N same-code bench.py BENCH_DETAIL outputs into one detail file:
per-query MIN of the headline timings (the r15 re-baseline methodology —
single invocations carry in-session drift the canaries, measured before
the headline loop, don't see), canary = per-component min across runs,
normalized maps recomputed from the merged values, probes taken from the
run whose headline total is lowest (probes are already best-of-2
internally). Regression/drift fields are copied from that same base run.

Usage:
  python scripts/merge_bench_runs.py out.json run1.json run2.json run3.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    base = min(runs, key=lambda r: r["value"])
    merged = dict(base)
    qmin = {
        name: min(r["queries"][name] for r in runs if name in r["queries"])
        for name in base["queries"]
    }
    # guard missing components like the queries merge does (ADVICE r15):
    # a run recorded by an older bench.py may lack a canary component
    canary = {
        comp: min(r["canary"][comp] for r in runs if comp in (r.get("canary") or {}))
        for comp in base["canary"]
    }
    merged["queries"] = qmin
    merged["value"] = round(sum(qmin.values()), 3)
    merged["canary"] = canary
    merged["queries_normalized"] = {
        n: round(s / canary["jvm_sec"], 2) for n, s in qmin.items()
    }
    merged["queries_normalized_shuffle"] = {
        n: round(s / canary["shuffle_sec"], 2) for n, s in qmin.items()
    }
    merged["merged_from_runs"] = [r["value"] for r in runs]
    # drift/regression fields were computed by the BASE run against ITS
    # canary sample, not the merged minima — tag them so a reader of the
    # merged artifact doesn't take them as internally consistent (ADVICE r15)
    merged["drift_fields_from_base_run"] = True
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"merged": merged["value"], "runs": merged["merged_from_runs"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
