"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

Sorting a table by one column makes that column's per-file min/max ranges
tight — parquet row-group pruning then skips most files for a predicate on
it — but leaves every OTHER column's ranges spanning the whole domain. A
Z-order layout interleaves the bits of several quantized columns into one
sort key, so file ranges stay simultaneously tight-ish on ALL of them:
the lever behind multi-dimensional pruning in Delta/Iceberg `OPTIMIZE
ZORDER BY`, re-expressed here as plain Spark column expressions + a
range-partitioned sorted write (no table format required).

At 100 TB this is a storage-layout decision, not a query operator: pay
one range-shuffle write, and every selective scan on any indexed dimension
afterwards reads a small fraction of the files. Everything is JVM-side
codegen (bit arithmetic); the only extra pass is the min/max aggregate
that fixes the quantization domain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 16


def zvalue(
    cols: Sequence[Column | str],
    mins: Sequence[int],
    maxs: Sequence[int],
    bits: int = DEFAULT_BITS,
) -> Column:
    """Morton code of ``cols``: each column is affinely quantized from its
    [min, max] domain onto ``bits``-bit integers, then the bit planes are
    interleaved (column i owns bit positions i, i+n, i+2n, ...).

    Quantization uses integer arithmetic only — ``(v - lo) * (2^bits - 1)
    / (hi - lo)`` in longs — so the code is deterministic. With the
    default 16 bits and up to 4 columns the result fits a long. The
    [min, max] domain comes from the caller (one cheap agg, or sink
    metadata at production scale) so the expression itself stays a pure
    per-row map.
    """
    n = len(cols)
    if not (1 <= n <= 4):
        raise ValueError("zvalue interleaves 1-4 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits overflow a long")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        lo, hi = int(mins[i]), int(maxs[i])
        span = max(hi - lo, 1)
        # keep (col - lo) * top < 2^63 even under ANSI (no wrap-around):
        # pre-shift wide domains so the offset stays under 2^(63-bits).
        shift = max(0, span.bit_length() - (63 - bits))
        offset = F.shiftright(col - F.lit(lo), shift) if shift else (col - F.lit(lo))
        q = ((offset * F.lit(top)) / F.lit(max(span >> shift, 1))).cast("long")
        q = F.greatest(F.lit(0).cast("long"), F.least(F.lit(top).cast("long"), q))
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    by: Sequence[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> str:
    """Write ``df`` as parquet laid out along the Z-curve of ``by``:
    range-partition on the Morton code (equal-depth file splits along the
    curve), sort within each file, drop the code. Readers see an ordinary
    parquet table; predicates on ANY ``by`` column prune row groups via
    min/max stats (verified quantitatively in tests/test_storage_layout.py).

    One extra scan computes the quantization domain; the write itself is
    one range shuffle — the same cost profile as a plain sorted write.
    """
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"lo_{c}") for c in by],
        *[F.max(c).cast("long").alias(f"hi_{c}") for c in by],
    ).first()
    mins = [bounds[f"lo_{c}"] for c in by]
    maxs = [bounds[f"hi_{c}"] for c in by]
    z = zvalue(list(by), mins, maxs, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
