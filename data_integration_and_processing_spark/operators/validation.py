"""Rule-based data validation: expectation checks in one pass.

The reference sketches "data validation before write" (reference
md.md:43-49) but never implements it. This operator runs a rule set over a
DataFrame in a SINGLE aggregation job — each rule compiles to a conditional
count, so 50 expectations over 100 TB cost one scan, not 50 — and returns
one row per rule: (rule, n_violations, n_rows, pass).

Rules are plain boolean Columns expressing the EXPECTATION (true = row OK),
so arbitrary predicates compose: not-null, ranges, regex, referential
checks via broadcast-joined lookup flags, cross-column invariants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    return F.col(col).between(lo, hi)


def matches(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def one_of(col: str, values: list) -> Column:
    return F.col(col).isin(values)


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every expectation in one aggregation pass.

    Returns (rule, n_violations, n_rows, pass) per rule, ordered by rule
    name. NULL expectation results count as violations (an expectation that
    cannot be evaluated is not satisfied) — mirror with
    ``coalesce(expr, false)`` semantics in any SQL twin.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, expect in rules.items():
        ok = F.coalesce(expect, F.lit(False))
        aggs.append(F.sum((~ok).cast("long")).alias(f"_v_{name}"))
    row = df.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"_v_{name}").alias("n_violations"),
            F.col("_n").alias("n_rows"),
            (F.col(f"_v_{name}") == 0).alias("pass"),
        )
        for name in rules
    ]
    return (
        row.select(F.explode(F.array(*per_rule)).alias("r"))
        .select("r.rule", "r.n_violations", "r.n_rows", "r.pass")
        .orderBy("rule")
    )
