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


_CKSUM_MOD = 1_000_000_007
_FIELD_SEP = 31  # unit separator
_NULL_SENTINEL = 1  # SOH — cannot appear in cast-to-string values


def row_checksum(cols: list[Column]) -> Column:
    """Order-independent-summable row checksum: the row's columns cast to
    string (NULL -> chr(1) sentinel), joined on chr(31), then a char-level
    polynomial fold ``acc*31 + codepoint (mod 1e9+7)``.

    Engine-portable BY CONSTRUCTION — the identical fold runs in any SQL
    engine with split/reduce, which is the point: a transfer-verification
    checksum must be computable on BOTH ends of a heterogeneous pipeline
    (the reference moves data PG<->CH<->files; Spark's xxhash64 exists on
    neither end). On an all-Spark pipeline, swap in ``F.xxhash64(*cols)``
    for ~10x: same downstream algebra.
    """
    canon = F.concat_ws(
        chr(_FIELD_SEP), *[F.coalesce(c.cast("string"), F.lit(chr(_NULL_SENTINEL))) for c in cols]
    )
    codes = F.transform(F.split(canon, ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _CKSUM_MOD,
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row (n_rows, checksum) summary: SUM of row checksums in
    DECIMAL(38,0) — exact at any row count, and order-independent because
    addition commutes, so source and destination can each compute it with
    their own partitioning/ordering and compare scalars. One scan, partial
    +final aggregation; nothing moves but a single row."""
    fp = row_checksum([F.col(c) for c in cols])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # sum in DECIMAL(38,0) (exact at any scale), surface as BIGINT:
        # rows * mod < 2^63 for any table below ~9e9 rows; past that keep
        # the decimal
        F.sum(fp.cast("decimal(38,0)")).cast("bigint").alias("checksum"),
    )


def mask_columns(df: DataFrame, policy: dict[str, str]) -> DataFrame:
    """Apply a column-level masking policy — the governance step between a
    raw table and a training/analytics release.

    Strategies: ``hash`` (md5 of the string form — referentially stable, so
    joins on the masked key still work), ``redact`` (constant sentinel),
    ``generalize:<n>`` (floor numeric to multiples of n — k-anonymity's
    generalization move; see the quality_k_anonymity audit), ``keep``.
    Pure column expressions: the plan stays one codegen'd projection, no
    shuffle, no UDF.
    """
    out = df
    for col, strategy in policy.items():
        if strategy == "keep":
            continue
        if strategy == "hash":
            out = out.withColumn(col, F.md5(F.col(col).cast("string")))
        elif strategy == "redact":
            out = out.withColumn(col, F.lit("REDACTED"))
        elif strategy.startswith("generalize:"):
            n = int(strategy.split(":", 1)[1])
            out = out.withColumn(col, (F.floor(F.col(col) / n) * n).cast("double"))
        else:
            raise ValueError(f"unknown masking strategy {strategy!r} for column {col!r}")
    return out
