"""Build literal double arrays as ONE parsed SQL string, not N py4j calls.

Constructing a 64-element literal array as ``F.array(*[F.lit(float(x)) ...])``
costs one driver->JVM py4j round-trip per element — measured 1.58 s of pure
driver time for the 8x64 centroid block in ``ann_join_ivf`` (and the huge
Column-built tree also paid ~1.9 s extra on its first execution). Rendering
the same array as one SQL string and letting the server parse it builds an
equivalent expression tree in ~5 ms.

Exactness: ``repr()`` of a Python float is the shortest decimal that
round-trips to the same binary64, and Spark parses a ``...D`` literal with
``Double.parseDouble`` (correctly rounded), so every element is bit-identical
to ``F.lit(float(x))``. Verified by tests/test_expr_sql.py against F.lit
across magnitude extremes.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def dlit_sql(x: float) -> str:
    """SQL double literal that parses to exactly ``float(x)``."""
    v = float(x)
    if not math.isfinite(v):
        # no SQL literal form; callers hold data-derived finite values
        raise ValueError(f"non-finite double literal: {v!r}")
    return repr(v) + "D"


def double_array_sql(xs: Iterable[float]) -> str:
    """SQL text for ``array<double>`` of the given values."""
    return "array(" + ",".join(dlit_sql(x) for x in xs) + ")"


def double_array_col(xs: Iterable[float]) -> Column:
    """Column: literal ``array<double>`` (== F.array of F.lit doubles)."""
    return F.expr(double_array_sql(xs))


def float_array_col(xs: Iterable[float]) -> Column:
    """Column: literal ``array<float>`` (== F.array of F.lit(x).cast
    ("float")) — the element-wise cast of the double array."""
    return F.expr(f"CAST({double_array_sql(xs)} AS array<float>)")
