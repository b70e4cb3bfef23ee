"""Static lint over oracle SQL output schemas: reject complex column types.

The external driver's canonicalizer sorts result frames with pandas
``sort_values``, which raises ``TypeError: unhashable type: 'list'`` on any
list/struct/map-typed column — three rounds of "replica green, driver red"
came from exactly this class (r3 float collapse, r4 HUGEINT dtype, r5 list
sort; see VERDICT r5 §What's wrong). The fix pattern that worked each time is
a static authoring-time guard, so: a one-shot DuckDB ``DESCRIBE`` over every
oracle (no Spark needed) flags any query whose OUTPUT contains a list,
struct, map or union column. Serialize such columns to strings (e.g.
``array_to_string`` / ``F.array_join``) in BOTH projections instead.

Used three ways:
- ``catalog.driver_window()`` pre-flight: a flagged query is ineligible for
  the driver's 50-query window (fail-safe: lint errors never block).
- ``scripts/driver_replica.py``: flags complex-typed columns on either side
  of a checked query as MISMATCH.
- ``tests/test_oracle_schema.py``: hard gate — the sweep must be empty.
"""

from __future__ import annotations

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_DEFAULT_SF_DIR = "/root/testdata/sf0.001"

_SWEEP_CACHE: dict[str, list[str]] | None = None


def is_complex_type(ddl_type: str) -> bool:
    """True for DuckDB output types that diverge under the driver's canon:

    - list/struct/map/union — pandas ``sort_values`` crashes on list cells
      (the r5 red-row class);
    - HUGEINT — fetchdf materializes float64, rendering "5.0" against
      Spark's int "5" (the r3/r4 class; cast aggregates to BIGINT);
    - DECIMAL — fetchdf float64 vs Spark's ``decimal.Decimal`` objects
      render "5.0" vs "5.00" (latent same-class; cast to DOUBLE and round).
    """
    t = ddl_type.strip().upper()
    return (
        "[" in t
        or t.startswith(("STRUCT", "MAP", "UNION", "DECIMAL"))
        or t in ("HUGEINT", "UHUGEINT")
    )


def complex_oracle_outputs(
    oracles: dict[str, str], sf_dir: str = _DEFAULT_SF_DIR
) -> dict[str, list[str]]:
    """DESCRIBE every oracle; return {query: ["col TYPE", ...]} for queries
    whose output schema contains a complex-typed column.

    Oracles that fail to DESCRIBE (or a missing duckdb/testdata) are skipped —
    the real correctness check owns oracle errors; this lint owns only the
    complex-output class.
    """
    import duckdb  # local import: keep the query path importable without it

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:  # noqa: BLE001 — oracle errors are not this lint's job
            continue
        cols = [f"{r[0]} {r[1]}" for r in rows if is_complex_type(str(r[1]))]
        if cols:
            bad[name] = cols
    con.close()
    return bad


def cached_sweep(oracles: dict[str, str]) -> dict[str, list[str]]:
    """One sweep per process (driver_window may be called repeatedly)."""
    global _SWEEP_CACHE
    if _SWEEP_CACHE is None:
        try:
            _SWEEP_CACHE = complex_oracle_outputs(oracles)
        except Exception:  # noqa: BLE001 — fail-safe: never break the driver
            _SWEEP_CACHE = {}
    return _SWEEP_CACHE


def complex_frame_columns(pdf) -> list[str]:
    """Runtime twin for the replica: pandas columns holding list/array/dict
    cells (what the driver canon would crash sorting)."""
    bad = []
    for c in pdf.columns:
        s = pdf[c].dropna()
        if len(s) == 0:
            continue
        v = s.iloc[0]
        if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
            bad.append(c)
    return bad


def negative_zero_frame_columns(pdf) -> list[str]:
    """Float columns containing IEEE ``-0.0`` — the fourth replica/driver
    canon-divergence class (VERDICT r6): DuckDB ``round()`` preserves the
    sign bit while Spark's ``F.round`` (BigDecimal) strips it, so the
    driver's repr-based canon renders ``-0.0`` vs ``0.0`` and hash-fails on
    numerically identical values. Any signed zero on EITHER side is a risk
    (the engines rarely agree on sign propagation) — normalize at the source
    (oracle: ``round(...) + 0``; Spark: ``F.round(...) + F.lit(0.0)``)."""
    import numpy as np
    import pandas.api.types as pt

    bad = []
    for c in pdf.columns:
        s = pdf[c].dropna()
        if len(s) == 0 or not pt.is_float_dtype(s):
            continue
        v = s.to_numpy(dtype="float64", copy=False)
        if bool(np.any(np.signbit(v) & (v == 0.0))):
            bad.append(c)
    return bad


def negative_zero_oracle_outputs(
    oracles: dict[str, str], sf_dir: str = _DEFAULT_SF_DIR
) -> dict[str, list[str]]:
    """Execute every oracle in DuckDB at a small SF and flag queries whose
    output contains a ``-0.0`` cell. Unlike the DESCRIBE sweep this must run
    the query (the sign bit is a value property, not a schema property), so
    it lives in the pytest gate rather than the window pre-flight; a larger
    SF can still surface new signed zeros — the replica's per-frame check at
    sf0.01 covers that tier."""
    import duckdb  # local import: keep the query path importable without it

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            pdf = con.execute(sql).fetchdf()
        except Exception:  # noqa: BLE001 — oracle errors are not this lint's job
            continue
        cols = negative_zero_frame_columns(pdf)
        if cols:
            bad[name] = cols
    con.close()
    return bad
