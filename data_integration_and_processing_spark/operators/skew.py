"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but only for sort-merge joins; aggregations and
broadcast-ineligible hot keys still need salting. These helpers encode the
two standard patterns so pipelines at 100 TB don't hand-roll them:

- **salted aggregation**: two-stage agg — partial on (key, salt), final on
  key. The first shuffle spreads a hot key over ``n_salts`` reducers; the
  second only moves ``n_salts`` pre-aggregated rows per key.
- **salted join**: explode the small side ``n_salts`` times, salt the big
  side with a deterministic hash-derived salt, join on (key, salt). A hot
  key's rows land on ``n_salts`` different reducers instead of one.

Salts are derived with xxhash64 of a row-unique column (not rand()) so
results are deterministic and retries/speculative tasks can't diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from a row-unique column."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column | tuple],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation for decomposable aggregates
    (count/sum/min/max — anything where final(partial(x)) == agg(x)).

    ``aggs`` maps output column name -> either a partial aggregate Column
    (the final combinator is inferred from the function name: min/max keep
    their combinator, everything else recombines via sum) or an explicit
    ``(partial_expr, final_combinator_fn)`` tuple.

    Non-decomposable aggregates are rejected where detectable (avg/stddev/
    percentile by name). CAVEAT: Spark 4's Column string form hides
    DISTINCT, so ``countDistinct`` is NOT detectable — distinct-style
    aggregates are never salt-decomposable (one value can appear under
    several salts); do not pass them.
    """
    non_decomposable = {"avg", "mean", "stddev", "stddev_samp", "stddev_pop",
                        "variance", "var_samp", "var_pop", "median", "percentile",
                        "percentile_approx", "approx_count_distinct"}
    partials, finals = [], []
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            expr, combine = spec
        else:
            expr = spec
            try:
                fn = expr._jc.toString().lower().split("(")[0]  # noqa: SLF001 — combinator dispatch
            except Exception:  # noqa: BLE001 — e.g. Spark Connect hides the JVM column
                fn = None
            if fn in non_decomposable:
                raise ValueError(
                    f"salted_agg only supports decomposable aggregates (count/sum/min/max); "
                    f"{name!r} uses {fn} — final(partial(x)) != agg(x). Rewrite as sum+count "
                    f"(avg) or use a plain groupBy with AQE skew handling."
                )
            combine = {"min": F.min, "max": F.max, "count": F.sum, "sum": F.sum}.get(fn)
            if combine is None:
                # A wrong default combinator (e.g. summing per-salt minima)
                # would be silently wrong — refuse unless the function is
                # positively identified as decomposable.
                raise ValueError(
                    f"salted_agg could not identify the aggregate function for {name!r} "
                    f"(got {fn!r}); pass the explicit (partial_expr, final_combinator) "
                    f"tuple form instead."
                )
        partials.append(expr.alias(f"__p_{name}"))
        finals.append(combine(f"__p_{name}").alias(name))
    partial = with_salt(df, unique_col, n_salts).groupBy(*keys, "_salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate
    the small side across all salts, join on (key, salt).

    Replication costs |small| * n_salts rows — cheap when small is a
    dimension table; for two big sides, salt only the hot keys (split the
    input by a hot-key list) instead."""
    b = with_salt(big, unique_col, n_salts)
    s = small.crossJoin(
        F.broadcast(
            b.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")
