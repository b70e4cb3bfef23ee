#!/usr/bin/env python
"""Round-close two-tier replica gate (VERDICT r13 item 6).

The r13 close proved the second tier earns its cost: the sf0.001 fixture
surfaced a LIVE round-half tie (temporal_stl_lite) that sf0.01 missed —
data-dependent tie classes sample differently per fixture, so the gate
runs the FULL driver replica at BOTH scale factors and emits one
machine-readable summary. Run it before the round's last commit:

    python scripts/replica_two_tier.py                  # both tiers, full catalog
    python scripts/replica_two_tier.py --only a,b,c     # subset (both tiers)

Exit 0 = every query MATCHes (or rows_only) at both tiers, modulo the
documented tier exceptions below; exit 1 otherwise. The summary line is
JSON so the round log records exactly what was checked:

    {"gate": "replica_two_tier", "ok": true,
     "tiers": {"sf0.01": {"match": 381, "rows_only": 0, "bad": []}, ...},
     "exceptions_applied": [...], "sec": 1234.5}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIERS = ("/root/testdata/sf0.01", "/root/testdata/sf0.001")

# Documented per-tier exceptions: query -> (tier basename, reason). The only
# current entry pins its fixture path by contract, so the off-tier result is
# expected to diverge and is recorded, not failed.
TIER_EXCEPTIONS: dict[str, tuple[str, str]] = {
    "etl_file_lineage": (
        "sf0.001",
        "contract pins the sf0.01 fixture path; off-tier run is informational",
    ),
}


def run_tier(sf_dir: str, only: str | None) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "driver_replica.py"),
           "--sf-dir", sf_dir]
    if only:
        cmd += ["--only", only]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    match = rows_only = 0
    bad: list[dict] = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "query" not in rec:
            continue
        status = rec.get("status")
        if status == "MATCH":
            match += 1
        elif status == "rows_only":
            rows_only += 1
        else:
            bad.append({"query": rec["query"], "status": status})
    return {"match": match, "rows_only": rows_only, "bad": bad, "rc": proc.returncode}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()
    t0 = time.time()
    tiers: dict[str, dict] = {}
    exceptions_applied: list[str] = []
    ok = True
    for sf_dir in TIERS:
        base = os.path.basename(sf_dir)
        res = run_tier(sf_dir, args.only)
        kept_bad = []
        for b in res["bad"]:
            exc = TIER_EXCEPTIONS.get(b["query"])
            if exc and exc[0] == base:
                exceptions_applied.append(f"{b['query']}@{base}: {exc[1]}")
            else:
                kept_bad.append(b)
        res["bad"] = kept_bad
        tiers[base] = res
        if kept_bad or (res["match"] + res["rows_only"]) == 0:
            ok = False
    print(json.dumps({
        "gate": "replica_two_tier",
        "ok": ok,
        "tiers": tiers,
        "exceptions_applied": exceptions_applied,
        "sec": round(time.time() - t0, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
