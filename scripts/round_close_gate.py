#!/usr/bin/env python
"""Round-close commit gate (VERDICT r8 item 1): two rounds running, the
round's FINAL commit shipped a stale dependent artifact (r7: CATALOG.md out
of date; r8: a test reading a column the same commit removed) because the
last change was committed without re-running the tests that depend on it.

This gate makes that failure class structural: given a pending diff (staged,
or vs HEAD), it maps every touched repo module to the test files that import
or textually reference it, always adds the catalog/doc freshness gates, and
runs exactly that test set. Run it before the last commit of a round:

    python scripts/round_close_gate.py            # gate the working tree diff
    python scripts/round_close_gate.py --staged   # gate only staged changes
    python scripts/round_close_gate.py --ref HEAD~1   # gate the last commit

Exit 0 = the dependent tests pass; exit 1 = they don't (do not commit), or
no tests could be mapped for a touched source file (gate conservatively).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "data_integration_and_processing_spark"

# Artifacts whose freshness is test-pinned: touching ANY catalog-registered
# query module or doc must re-run the freshness gates.
ALWAYS_ON_TRIGGERS = (
    f"{PKG}/queries/",
    "CATALOG.md",
    "COVERAGE.md",
)
FRESHNESS_TESTS = ("tests/test_catalog_window.py", "tests/test_oracle_schema.py")


def changed_files(args: argparse.Namespace) -> list[str]:
    if args.ref:
        cmd = ["git", "diff", "--name-only", f"{args.ref}", "HEAD"]
    elif args.staged:
        cmd = ["git", "diff", "--name-only", "--cached"]
    else:
        cmd = ["git", "diff", "--name-only", "HEAD"]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, check=True)
    return [f for f in out.stdout.splitlines() if f.strip()]


def module_tokens(path: str) -> list[str]:
    """Strings whose appearance in a test file marks it as a dependent of
    ``path``: the dotted module, the bare module name, the file name — and,
    for query-registry modules, every @register(\"name\") in the file (the
    r8 breakage channel: a test read a registered query BY NAME, so module
    imports alone don't capture the dependency)."""
    if not path.endswith(".py"):
        return [os.path.basename(path)]
    mod = path[: -len(".py")].replace("/", ".")
    toks = [mod]
    base = os.path.basename(path)[: -len(".py")]
    if base not in ("__init__",):
        toks.append(base)
    full = os.path.join(REPO, path)
    if os.path.exists(full):
        with open(full) as fh:
            body = fh.read()
        toks.extend(re.findall(r"@register\(\s*[\"']([\w.]+)[\"']", body))
        # public defs are referenced by name from tests too
        toks.extend(re.findall(r"^def ([a-zA-Z]\w+)\(", body, flags=re.M))
    return toks


def dependent_tests(files: list[str]) -> tuple[set[str], list[str]]:
    tests_dir = os.path.join(REPO, "tests")
    test_files = [
        f for f in sorted(os.listdir(tests_dir)) if f.startswith("test_") and f.endswith(".py")
    ]
    bodies = {}
    for tf in test_files:
        with open(os.path.join(tests_dir, tf)) as fh:
            bodies[tf] = fh.read()

    selected: set[str] = set()
    unmapped: list[str] = []
    for path in files:
        if path.startswith("tests/"):
            if path.endswith(".py") and os.path.exists(os.path.join(REPO, path)):
                selected.add(path)
            continue
        if any(path.startswith(t) or path == t for t in ALWAYS_ON_TRIGGERS):
            selected.update(FRESHNESS_TESTS)
        if not (path.startswith(PKG) and path.endswith(".py")):
            continue
        toks = module_tokens(path)
        hit = False
        for tf, body in bodies.items():
            if any(re.search(rf"\b{re.escape(tok)}\b", body) for tok in toks):
                selected.add(f"tests/{tf}")
                hit = True
        # query-registry modules are additionally (and primarily) covered by
        # the oracle replica + freshness gates selected above — a registry
        # change with no named test reference is not an unmapped change
        if not hit and not path.startswith(f"{PKG}/queries/"):
            unmapped.append(path)
    return selected, unmapped


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--staged", action="store_true")
    ap.add_argument("--ref", default=None)
    ap.add_argument("--dry-run", action="store_true", help="print the test set, don't run")
    args = ap.parse_args()

    files = changed_files(args)
    if not files:
        print("round_close_gate: no changed files — nothing to gate")
        return 0
    selected, unmapped = dependent_tests(files)
    print(f"round_close_gate: {len(files)} changed file(s) -> {len(selected)} test file(s)")
    for t in sorted(selected):
        print(f"  {t}")
    if unmapped:
        # conservative: a touched source file with NO referencing test is
        # itself a finding — the round-close rule is that every last-commit
        # change has a dependent check
        print("round_close_gate: touched source with no referencing test file:")
        for p in unmapped:
            print(f"  {p}")
        print("  -> add coverage or gate manually; failing conservatively")
        return 1
    if args.dry_run or not selected:
        return 0
    cmd = [sys.executable, "-m", "pytest", "-x", "-q", *sorted(selected)]
    print("round_close_gate:", " ".join(cmd))
    return subprocess.run(cmd, cwd=REPO).returncode


if __name__ == "__main__":
    sys.exit(main())
