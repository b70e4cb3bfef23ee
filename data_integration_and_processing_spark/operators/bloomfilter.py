"""Bloom-filter semi-join reduction.

The reference copies whole tables between warehouses with no join support at
all (`/root/reference/PostgresDatabase.py:146` reads `SELECT *`); a
distributed engine joining a 100 TB fact table against a filtered dimension
wants to drop non-matching fact rows BEFORE the shuffle. Broadcasting the
dimension's exact key set works until the key set itself is GBs; a Bloom
filter compresses K keys into ~10-16 bits/key with zero false negatives, so
the fact side can be pre-filtered by a few-MB broadcast bitmap and the exact
join afterwards only pays shuffle for rows that (almost always) match.

Scale shape:

- **Build** is one pass over the dimension keys: each key explodes to
  ``n_hashes`` (word_idx, bit_mask) pairs and a ``bit_or`` aggregate folds
  them into ``n_bits/64`` long words. The aggregate is map-side combinable
  and its output is bitmap-sized (16 KiB of longs per 2^20 bits), never
  key-count-sized.
- **Probe** joins the fact side against the broadcast word table once per
  hash function on ``word_idx`` — n_hashes broadcast hash joins of a
  bitmap-sized table, all JVM-side expressions (xxhash64 / pmod /
  shiftleft / bitwiseAND), fully inside whole-stage codegen. No Python.
- The pre-filter is a pure superset reduction (no false negatives), so the
  exact join that follows returns the identical result with or without it —
  which is exactly what the DuckDB oracle checks.

Everything here is ANSI-safe: xxhash64 never overflows, pmod keeps
positions in [0, n_bits), and shiftleft on a long is defined for the full
0-63 shift range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bit positions derive from xxhash64(key, seed) — one independent seed per
# hash function, fixed so build and probe agree across sessions.
_SEED_BASE = 0x5EED


def _bit_position(key: Column, hash_idx: int, n_bits: int) -> Column:
    """Position of hash function ``hash_idx`` for ``key`` in [0, n_bits)."""
    return F.pmod(F.xxhash64(key, F.lit(_SEED_BASE + hash_idx)), F.lit(n_bits))


def bloom_build(keys: DataFrame, key_col: str, *, n_bits: int = 1 << 20, n_hashes: int = 3) -> DataFrame:
    """Fold a key column into a Bloom bitmap table (word_idx, word_bits).

    Output has at most ``n_bits / 64`` rows regardless of key count —
    broadcastable at any dimension cardinality that fits the bit budget.
    """
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    k = keys.select(F.col(key_col).alias("_k"))
    positions = k.select(
        F.explode(F.array(*[_bit_position(F.col("_k"), i, n_bits) for i in range(n_hashes)])).alias("_pos")
    )
    return positions.select(
        (F.col("_pos") / 64).cast("long").alias("word_idx"),
        # pyspark's shiftleft wrapper only takes a literal shift; call the SQL
        # function directly to shift by a per-row column
        F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("_pos") % 64).cast("int")).alias(
            "_mask"
        ),
    ).groupBy("word_idx").agg(F.bit_or("_mask").alias("word_bits"))


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bloom_words: DataFrame,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key MAY be in the Bloom set (no false negatives).

    One broadcast hash join per hash function: fact.word_idx_i == word_idx.
    An inner join is correct because a word index absent from the bitmap
    table means no dimension key ever set a bit in that word — the fact row
    is a definite non-member and should drop.

    The bitmap is materialized ONCE (eager localCheckpoint) before the
    n_hashes joins — without this each join re-executes the whole build
    subtree and the prefilter costs more than the shuffle it saves
    (measured at 1.2M fact rows with broadcast disabled: 5.7s rebuilt vs
    1.6s materialized vs 2.7s plain shuffle semi join). The checkpointed
    table is bitmap-sized, so executor residency is n_bits/8 bytes.
    """
    bloom_words = bloom_words.localCheckpoint(eager=True)
    out = fact
    for i in range(n_hashes):
        words = F.broadcast(
            bloom_words.select(F.col("word_idx").alias(f"_w{i}"), F.col("word_bits").alias(f"_b{i}"))
        )
        pos = _bit_position(F.col(key_col), i, n_bits)
        out = (
            out.withColumn(f"_p{i}", pos)
            .join(words, (F.col(f"_p{i}") / 64).cast("long") == F.col(f"_w{i}"), "inner")
            .filter(
                F.call_function("shiftright", F.col(f"_b{i}"), (F.col(f"_p{i}") % 64).cast("int"))
                .bitwiseAND(F.lit(1))
                == 1
            )
            .drop(f"_p{i}", f"_w{i}", f"_b{i}")
        )
    return out


def bloom_semi_join_exact(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact semi join with a Bloom pre-filter ahead of the shuffle.

    Result is identical to ``fact.join(dim_keys, fact_key == dim_key,
    "left_semi")`` — the Bloom stage only sheds definite non-members early,
    the exact semi join removes the ~(1-e^{-kn/m})^k false positives.
    """
    words = bloom_build(dim_keys, dim_key, n_bits=n_bits, n_hashes=n_hashes)
    pruned = bloom_prefilter(fact, fact_key, words, n_bits=n_bits, n_hashes=n_hashes)
    dk = dim_keys.select(F.col(dim_key).alias(fact_key)).distinct()
    return pruned.join(dk, fact_key, "left_semi")
