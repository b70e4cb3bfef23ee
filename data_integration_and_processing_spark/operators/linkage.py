"""Record linkage: fuzzy string matching without a cross join.

No reference counterpart (SURVEY.md §2.2). The naive fuzzy join —
``a CROSS JOIN b WHERE levenshtein(a.x, b.x) <= k`` — is O(|a|·|b|) and
dead at scale. The scalable form for small edit distances is
deletion-neighborhood blocking (the SymSpell idea): explode each base
string's 1-deletion variants as join keys and equi-join probes on exact
string equality, then verify with a real edit-distance check on the few
candidates. Cost is a linear ×L key blowup plus one hash join — both
shuffle-friendly at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column, max_len: int) -> Column:
    """Distinct strings obtained by deleting exactly one character of ``s``
    (positions 1..max_len). Adjacent equal characters produce duplicate
    variants; they are folded so a downstream join yields unique pairs."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_len)),
            lambda i: F.concat(F.substring(s, F.lit(1), i - 1), F.substring(s, i + 1, F.lit(max_len))),
        )
    )


def fuzzy_join_one_edit(
    base: DataFrame,
    probes: DataFrame,
    base_col: str,
    probe_col: str,
    max_len: int,
) -> DataFrame:
    """All (base, probe) rows whose strings are within one deletion edit:
    probe equals the base string or the base string minus one character.

    Equi-join on exploded deletion variants (blocking), then a levenshtein
    verify on candidates only — never a cross join.
    """
    exploded = base.withColumn(
        "_variant",
        F.explode(F.array_union(deletion_variants(F.col(base_col), max_len), F.array(F.col(base_col)))),
    )
    cand = exploded.join(probes, F.col("_variant") == F.col(probe_col))
    return (
        cand.withColumn("dist", F.levenshtein(F.col(base_col), F.col(probe_col)))
        .filter(F.col("dist") <= 1)
        .drop("_variant")
    )


def deletion_neighborhood(s: Column, max_len: int, k: int = 2) -> Column:
    """All distinct strings reachable from ``s`` by deleting up to ``k``
    characters (k in {1, 2}) — the SymSpell blocking key set: two strings
    within edit distance k always share at least one key, so an equi-join
    on exploded neighborhoods finds every candidate pair without a cross
    join.

    The 2-deletion tier applies the 1-deletion transform to each
    1-deletion variant; inner lambdas reference only their own arguments
    and literals (the HOF no-recompute rule). Positions past the actual
    string length reproduce the string unchanged — absorbed by
    array_distinct, and the identical substr-out-of-range behavior in
    DuckDB keeps oracles exact. Key-set size is O(max_len^k) per row
    (~172 for 18-char strings at k=2): the linear blowup that replaces
    the quadratic cross join.
    """
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")
    d1 = deletion_variants(s, max_len)
    out = F.array_union(F.array(s), d1)
    if k == 2:
        d2 = F.array_distinct(
            F.flatten(F.transform(d1, lambda v: deletion_variants(v, max_len)))
        )
        out = F.array_union(out, d2)
    return out


def fuzzy_join_within_k(
    base: DataFrame,
    probes: DataFrame,
    base_col: str,
    probe_col: str,
    max_len: int,
    k: int = 2,
) -> DataFrame:
    """All (base, probe) rows with ``levenshtein(base, probe) <= k`` via
    SymSpell blocking: explode BOTH sides' deletion neighborhoods, equi-join
    on shared keys, de-duplicate candidate pairs in-task, verify with the
    exact edit distance on candidates only. Shuffles carry (key, row-id)
    pairs — never a cross join at any corpus size."""
    b = base.withColumn("_bkey", F.explode(deletion_neighborhood(F.col(base_col), max_len, k)))
    p = probes.withColumn("_pkey", F.explode(deletion_neighborhood(F.col(probe_col), max_len, k)))
    cand = b.join(p, F.col("_bkey") == F.col("_pkey")).drop("_bkey", "_pkey").distinct()
    return cand.withColumn("dist", F.levenshtein(F.col(base_col), F.col(probe_col))).filter(
        F.col("dist") <= k
    )
