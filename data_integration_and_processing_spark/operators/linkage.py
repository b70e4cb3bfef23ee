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
