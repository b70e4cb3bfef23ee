"""Pin the driver's 50-query hard-signal window.

The driver verifies only the FIRST 50 registered queries, so registration
order is a coverage decision: the window must contain an oracle-checked
representative of every operator family (VERDICT.md round 1, item 1).
"""

from __future__ import annotations

from data_integration_and_processing_spark.queries import catalog

# One tag per family that MUST have an oracle-checked row inside the window.
REQUIRED_FAMILY_TAGS = (
    "flagship",
    "dedup",
    "similarity",
    "text",
    "sampling",
    "udf",
    "skew",
    "streaming",
    "multimodal",
    "functions",
    "etl",
    "sink",
    "filter",
    "projection",
    "join",
    "aggregation",
    "window",
    "sort",
    "setop",
    "subquery",
    "tpch",
    "percentile",
    "ids",
    "profiling",
    "linkage",
    "north-star",
    "stateful",
    "pandas-udf",
    "asof",
    # r2 families
    "curation",
    "cdc",
    "incremental",
    "partitioning",
    "scale",
    # r2 families added this session
    "analytics",
    "versioned",
    "checksum",
    "chunking",
    # r3 families
    "temporal",
)


def test_first_50_follow_derived_window():
    names = list(catalog.all_specs())
    window = catalog.driver_window()
    assert len(window) == 50
    assert names[:50] == list(window)
    # pins lead the window: flagship + this round's must-reverify entries
    assert names[: 1 + len(catalog._PINNED)] == list(catalog._ALWAYS + catalog._PINNED)


def test_window_rotates_toward_stale_entries():
    """The derived window must spend most of its slots on entries without a
    recent driver-green round — the rotation policy VERDICT r4 item 6 asked
    to make mechanical, tightened to >= 45 first-time names per window in r9
    (VERDICT r8 item 3) while never-driver-checked entries remain. Once the
    backlog drains below a windowful the bound adapts to what is left."""
    green = catalog._load_green()
    window = catalog.driver_window()
    specs = catalog.all_specs()
    never_checked = [n for n in specs if n not in green and specs[n].oracle]
    first_timers = [n for n in window if n not in green]
    assert len(first_timers) >= min(45, len(never_checked))


def test_first_50_are_all_oracle_checked():
    """Window slots should buy hash checks. Exception (VERDICT r7 item 3):
    an explicitly _PINNED rows-only entry may spend a slot on its weaker
    rows-only driver row — that is the only driver signal a genuinely
    non-SQL-expressible operator can ever get — but at most 2 slots, and
    never via the mechanical fill."""
    specs = catalog.all_specs()
    window = list(specs.values())[:50]
    missing = [s.name for s in window if s.oracle is None]
    unpinned = [n for n in missing if n not in catalog._PINNED]
    assert not unpinned, f"unpinned rows-only queries inside the hard-signal window: {unpinned}"
    assert len(missing) <= 2, f"too many rows-only pins spending window slots: {missing}"


def test_first_50_cover_every_family():
    """Every family is either represented in this round's window or was
    driver-green within the last two rounds (the r9 relaxation that frees
    family slots for never-driver-checked entries — a family can skip at
    most two consecutive windows before it must spend a slot again)."""
    specs = catalog.all_specs()
    green = catalog._load_green()
    latest = max(green.values(), default=0)
    window_tags = {t for s in list(specs.values())[:50] for t in s.tags}
    missing = []
    for tag in REQUIRED_FAMILY_TAGS:
        if tag in window_tags:
            continue
        freshest = max(
            (green.get(s.name, -1) for s in specs.values() if tag in s.tags),
            default=-1,
        )
        if freshest < latest - 1:
            missing.append(tag)
    assert not missing, f"stale families with no row in the driver window: {missing}"


def test_priority_does_not_shrink_catalog():
    specs = catalog.all_specs()
    assert len(specs) >= 125
    assert len(set(specs)) == len(specs)


def test_catalog_md_is_fresh():
    """CATALOG.md must match the registry — regenerate with
    scripts/catalog_dump.py after adding queries."""
    import scripts.catalog_dump as dump

    with open("/root/repo/CATALOG.md") as f:
        assert f.read() == dump.render(), "CATALOG.md stale — run scripts/catalog_dump.py"


def test_coverage_md_counts_are_fresh():
    """COVERAGE.md's header counts must match the live registry (VERDICT r8
    item 2 — the header drifted two rounds running; this pins it the way
    test_catalog_md_is_fresh pins CATALOG.md)."""
    specs = catalog.all_specs()
    total = len(specs)
    oracled = sum(1 for s in specs.values() if s.oracle is not None)
    rows_only = total - oracled
    with open("/root/repo/COVERAGE.md") as f:
        header = f.read(600)
    expected = f"{total} catalog queries ({oracled} DuckDB-oracle value-checked, {rows_only} rows-only"
    assert expected in header, (
        f"COVERAGE.md header stale — expected it to contain {expected!r}"
    )
