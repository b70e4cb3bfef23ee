"""Deterministic sampling operators for training-data pipelines.

No reference counterpart (the reference is ETL-only; SURVEY.md §2.2) — but a
100 TB corpus pipeline needs reproducible sampling: row sampling, stratified
sampling, and train/valid/test splits that give the SAME answer on every
run, every retry, and every speculative task. `rand()`-based sampling fails
all three (Spark re-evaluates non-deterministic expressions on task retry),
so everything here buckets rows by an exact integer hash of stable keys.

Arithmetic contract: every intermediate stays within signed 64 bits —
``(key % M) * A`` with M = 2^31-1 and A < 2^31 is at most ~4.6e18 < 2^63.
That makes the bucket expression portable to any engine that has 64-bit
integers (DuckDB raises on int64 overflow; Spark wraps; by never
overflowing, both agree bit-for-bit). Pure map stage: no shuffle, no UDF,
whole-stage codegen all the way down, and the sample filter prunes rows
before anything wide happens downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps every product below 2^62 for multipliers
# under 2^31, so the same expression never overflows int64 in any engine.
HASH_MOD = 2_147_483_647

# Odd multipliers (Knuth-style multiplicative hashing), one per key column,
# cycled if a caller passes more keys than this.
_MULTIPLIERS = (1_103_515_245, 779_359_397, 913_986_893, 1_500_450_271)


def hash_bucket(
    keys: Sequence[Column | str], n_buckets: int, seed: int | Column = 0
) -> Column:
    """Deterministic bucket in [0, n_buckets) from stable key columns.

    bucket = (sum_i ((key_i mod M) * A_i mod M) + seed) mod M mod n_buckets

    ``seed`` may be a Column (e.g. an epoch number), which keeps a
    per-epoch reshuffle to ONE scan of the base table — the constant-seed
    alternative is a UNION of per-epoch branches, i.e. one full data pass
    per epoch. For a non-negative constant c the column form is identical
    to seed=c (hash_bucket_sql stays the oracle twin of both).
    """
    if isinstance(seed, Column):
        acc = F.pmod(seed.cast("long"), F.lit(HASH_MOD))
    else:
        acc = F.lit(seed % HASH_MOD).cast("long")
    for i, key in enumerate(keys):
        col = F.col(key) if isinstance(key, str) else key
        mult = _MULTIPLIERS[i % len(_MULTIPLIERS)]
        acc = (acc + F.pmod(F.pmod(col.cast("long"), F.lit(HASH_MOD)) * F.lit(mult), F.lit(HASH_MOD))) % F.lit(
            HASH_MOD
        )
    return F.pmod(acc, F.lit(n_buckets))


def hash_bucket_sql(keys: Sequence[str], n_buckets: int, seed: int = 0) -> str:
    """The ANSI-SQL twin of :func:`hash_bucket` (same math, same result).

    Generating both halves from one spec is what guarantees the Spark plan
    and the oracle agree — there is no second implementation to drift.
    """
    terms = [str(seed % HASH_MOD)]
    for i, key in enumerate(keys):
        mult = _MULTIPLIERS[i % len(_MULTIPLIERS)]
        # (x % M + M) % M = pmod: ANSI % is signed, Spark-side pmod is not —
        # without the wrap the twins diverge on negative keys
        terms.append(f"((((CAST({key} AS BIGINT) % {HASH_MOD} + {HASH_MOD}) % {HASH_MOD}) * {mult}) % {HASH_MOD})")
    return f"(({' + '.join(terms)}) % {HASH_MOD}) % {n_buckets}"


def deterministic_sample(
    df: DataFrame,
    keys: Sequence[Column | str],
    fraction: float,
    n_buckets: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of ``n_buckets``.

    Reproducible across runs/retries and refinable: a 1% sample is a strict
    subset of the 10% sample with the same keys/seed — the property that
    lets a pipeline iterate on a small slice and then widen it.
    """
    threshold = int(round(fraction * n_buckets))
    return df.where(hash_bucket(keys, n_buckets, seed) < F.lit(threshold))


def train_test_split(
    df: DataFrame,
    keys: Sequence[Column | str],
    weights: Sequence[int] = (80, 10, 10),
    labels: Sequence[str] = ("train", "valid", "test"),
    seed: int = 0,
) -> DataFrame:
    """Add a ``split`` label column by cumulative hash-bucket ranges.

    Splits are disjoint and exhaustive by construction, and membership is a
    pure function of the key — late-arriving rows for the same entity land
    in the same split (the leakage guarantee that matters for training).
    """
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    total = sum(weights)
    bucket = hash_bucket(keys, total, seed)
    expr = None
    cum = 0
    for w, label in zip(weights, labels):
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata: Column | str,
    fractions: dict[str, float],
    keys: Sequence[Column | str],
    default_fraction: float = 0.0,
    n_buckets: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the rand()).

    A training mix is a set of per-source rates ("keep 100% of books, 5% of
    crawl"); expressing the rate as a CASE over the stratum keeps the whole
    thing one codegen'd map stage — no per-stratum jobs, no shuffle.
    """
    strata_col = F.col(strata) if isinstance(strata, str) else strata
    threshold = F.lit(int(round(default_fraction * n_buckets)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(strata_col == value, int(round(frac * n_buckets))).otherwise(threshold)
    return df.where(hash_bucket(keys, n_buckets, seed) < threshold)


def mix_to_target(
    df: DataFrame,
    group: Column | str,
    keys: Sequence[Column | str],
    n_buckets: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Rebalance group contributions to an equal share (the "data mixing"
    step of a training pipeline): downsample every group to the size of the
    smallest, deterministically.

    Two passes, both cheap: a count aggregate (one row per group) computes
    each group's keep-fraction, broadcast-joins back, and the hash filter
    does the rest — the big table is scanned once and never shuffled.
    Fractions quantize to 1/n_buckets, so achieved sizes differ from the
    target by at most n_group/n_buckets.
    """
    group_col = F.col(group) if isinstance(group, str) else group
    counts = df.groupBy(group_col.alias("_g")).agg(F.count("*").alias("_n"))
    fracs = counts.crossJoin(counts.agg(F.min("_n").alias("_target"))).select(
        "_g", F.floor(F.col("_target") / F.col("_n") * n_buckets).alias("_thresh")
    )
    joined = df.join(F.broadcast(fracs), group_col == F.col("_g"))
    return joined.where(hash_bucket(keys, n_buckets, seed) < F.col("_thresh")).drop("_g", "_thresh")


def temperature_mix(
    df: DataFrame,
    group: Column | str,
    keys: Sequence[Column | str],
    budget_frac: float = 0.6,
    n_buckets: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Temperature-weighted corpus mixing at T=2 (alpha = 1/2): group g's
    target share of the row budget is sqrt(n_g) / sum_h sqrt(n_h) — the
    standard multilingual/multi-source rebalance that upsamples small
    sources relative to their natural share without flattening to uniform
    (:func:`mix_to_target` is the T=inf limit; natural sampling is T=1).

    Deterministic and engine-portable BY CONSTRUCTION: the weight uses
    floor(sqrt(n)) — IEEE sqrt is correctly rounded (general pow is not,
    which is why alpha is fixed at 1/2), and every downstream step is the
    same left-to-right IEEE double chain in both engines, so the SQL twin
    computes bit-identical thresholds (doubles, not longs, so the product
    can't hit ANSI ARITHMETIC_OVERFLOW at 1e12+ row corpora).
    Same two-pass shape as mix_to_target: a group-count aggregate, a
    broadcast join of the per-group thresholds, one hash-filter map over
    the big table — which is never shuffled.
    """
    group_col = F.col(group) if isinstance(group, str) else group
    counts = df.groupBy(group_col.alias("_g")).agg(F.count("*").alias("_n"))
    isqrt = F.floor(F.sqrt(F.col("_n").cast("double"))).cast("long")
    tot = counts.select(
        F.sum("_n").alias("_total"), F.sum(isqrt).alias("_z")
    )
    budget_rows = F.floor(F.lit(budget_frac) * F.col("_total")).cast("long")
    # Multiply in DOUBLE, not LONG: under the session's ANSI default a long
    # product budget_rows * isqrt * n_buckets overflows 2^63 around 1e12-row
    # corpora. Both engines evaluate the identical left-to-right IEEE double
    # chain, so the floor()'d threshold (<= n_buckets) stays bit-identical
    # with the SQL twin.
    thresh = F.least(
        F.lit(n_buckets).cast("long"),
        F.floor(
            (budget_rows.cast("double") * isqrt.cast("double") * F.lit(float(n_buckets)))
            / (F.col("_z").cast("double") * F.col("_n").cast("double"))
        ).cast("long"),
    )
    fracs = counts.crossJoin(tot).select("_g", thresh.alias("_thresh"))
    joined = df.join(F.broadcast(fracs), group_col == F.col("_g"))
    return joined.where(hash_bucket(keys, n_buckets, seed) < F.col("_thresh")).drop(
        "_g", "_thresh"
    )
