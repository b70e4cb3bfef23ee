#!/usr/bin/env python
"""Regenerate queries/driver_green.json from the driver's CORRECTNESS_r*.json.

The file records, per query, the most recent round in which the external
driver verified it fully green (rows + schema + value-hash). The catalog's
window derivation (catalog._derive_window) consumes it to rotate the
50-query hard-signal window toward maximally-stale entries mechanically
instead of by hand (VERDICT r4 item 6).

Run after each round lands a new CORRECTNESS_r{N}.json:
    python scripts/update_driver_green.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data_integration_and_processing_spark", "queries", "driver_green.json")


def build() -> dict[str, int]:
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            results = json.load(f)
        for name, rec in results.items():
            ok = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") is not False  # None => rows-only check
            )
            if ok:
                last_green[name] = max(last_green.get(name, rnd), rnd)
    return dict(sorted(last_green.items()))


if __name__ == "__main__":
    data = build()
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(data)} queries with a driver-green round")
