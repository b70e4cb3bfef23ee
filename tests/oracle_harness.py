"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Sort columns by name, sort rows, compare cell-by-cell with tight float
tolerance (queries round their aggregates, so near-exact agreement is the
contract; a tolerance failure here predicts a value-hash mismatch in the
driver's gate).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else ("f", f)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("t", datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (np.ndarray, list, tuple)):
        return ("a", tuple(_norm_cell(x) for x in v))
    return ("s", str(v))


def _cells_equal(a, b, rel_tol=1e-9, abs_tol=1e-9) -> bool:
    if a is None or b is None:
        return a is None and b is None
    ka, va = a
    kb, vb = b
    if ka == "a" and kb == "a":
        return len(va) == len(vb) and all(_cells_equal(x, y, rel_tol, abs_tol) for x, y in zip(va, vb))
    if "f" in (ka, kb) and ka in ("f", "i") and kb in ("f", "i"):
        return math.isclose(float(va), float(vb), rel_tol=rel_tol, abs_tol=abs_tol)
    return a == b


def _sort_key(row):
    return tuple("\x00" if c is None else repr(c) for c in row)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems

    s_rows = [tuple(_norm_cell(v) for v in row) for row in spark_pdf[s_cols].itertuples(index=False)]
    o_rows = [tuple(_norm_cell(v) for v in row) for row in oracle_pdf[o_cols].itertuples(index=False)]
    s_rows.sort(key=_sort_key)
    o_rows.sort(key=_sort_key)
    bad = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if len(sr) != len(orow) or not all(_cells_equal(a, b) for a, b in zip(sr, orow)):
            bad += 1
            if bad <= 3:
                problems.append(f"row {i}: spark={sr} oracle={orow}")
    if bad:
        problems.append(f"{bad}/{len(s_rows)} rows differ")
    return problems
