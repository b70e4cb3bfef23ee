"""Bloom-filter semi-join reduction invariants.

The operator's contract at any scale: zero false negatives (the pre-filter
output is a superset of the true semi join), a false-positive rate near the
(1 - e^{-kn/m})^k theory bound, a bitmap-sized (never key-count-sized)
build output, and ANSI-mode value invariance for the bit-position math.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.bloomfilter import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join_exact,
)

N_BITS = 1 << 16
N_HASHES = 3


def _dim_keys(spark):
    # 1000 member keys spread over a large domain
    return spark.range(0, 1000).select((F.col("id") * 7919 + 13).alias("k"))


def test_build_output_is_bitmap_sized(spark):
    words = bloom_build(_dim_keys(spark), "k", n_bits=N_BITS, n_hashes=N_HASHES)
    rows = words.collect()
    assert len(rows) <= N_BITS // 64
    assert all(r["word_bits"] != 0 for r in rows)  # bit_or folded something into each word


def test_no_false_negatives(spark):
    dim = _dim_keys(spark)
    words = bloom_build(dim, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    kept = bloom_prefilter(dim.withColumnRenamed("k", "fk"), "fk", words, n_bits=N_BITS, n_hashes=N_HASHES)
    # every member key must survive the pre-filter
    assert kept.count() == dim.count()


def test_false_positive_rate_near_theory(spark):
    dim = _dim_keys(spark)
    words = bloom_build(dim, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    # probe keys guaranteed disjoint from the member domain (members are odd*? no:
    # members are 13 mod 7919-steps; use a disjoint affine family and subtract overlaps)
    probes = spark.range(0, 20000).select((F.col("id") * 7919 + 14).alias("fk"))
    n_probe = probes.count()
    fp = bloom_prefilter(probes, "fk", words, n_bits=N_BITS, n_hashes=N_HASHES).count()
    # theory: (1 - e^{-kn/m})^k with k=3, n=1000, m=65536 => ~7.6e-5
    theory = (1 - 2.718281828 ** (-N_HASHES * 1000 / N_BITS)) ** N_HASHES
    assert fp / n_probe <= max(10 * theory, 0.01)


def test_semi_join_exact_matches_plain_semi_join(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(F.col("c_acctbal") > 8000)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    via_bloom = bloom_semi_join_exact(
        orders, "o_custkey", cust.select("c_custkey"), "c_custkey", n_bits=N_BITS, n_hashes=N_HASHES
    )
    plain = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(), "o_custkey", "left_semi"
    )
    got = sorted(r["o_orderkey"] for r in via_bloom.select("o_orderkey").collect())
    want = sorted(r["o_orderkey"] for r in plain.select("o_orderkey").collect())
    assert got == want


def test_bit_positions_ansi_invariant(spark):
    dim = _dim_keys(spark)
    out = {}
    orig = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for mode in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            out[mode] = sorted(
                tuple(r) for r in bloom_build(dim, "k", n_bits=N_BITS, n_hashes=N_HASHES).collect()
            )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", orig)
    assert out["true"] == out["false"]


def test_partition_diff_locates_divergent_buckets(spark, sf_dir):
    from data_integration_and_processing_spark.queries.scale_queries import (
        _DIFF_BUCKETS,
        etl_partition_diff,
    )

    out = etl_partition_diff(spark, sf_dir).collect()
    # divergent buckets are exactly those containing a dropped (%97) or
    # perturbed (%101) order key
    okeys = [r["o_orderkey"] for r in spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey").collect()]
    want = sorted({k % _DIFF_BUCKETS for k in okeys if k % 97 == 0 or k % 101 == 0})
    assert [r["bucket"] for r in out] == want
    by_bucket = {r["bucket"]: r for r in out}
    drop_counts = {}
    for k in okeys:
        if k % 97 == 0:
            drop_counts[k % _DIFF_BUCKETS] = drop_counts.get(k % _DIFF_BUCKETS, 0) + 1
    for b, r in by_bucket.items():
        assert r["base_rows"] - r["replica_rows"] == drop_counts.get(b, 0)


def test_no_false_negatives_property(spark):
    """Property: for randomized key sets and probe mixes, every true member
    survives the prefilter (zero false negatives at any n_bits/n_hashes)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(1234)
    for trial in range(3):
        n_bits = rng.choice([1 << 12, 1 << 14, 1 << 16])
        k = rng.choice([2, 3, 5])
        members = [rng.randrange(-(2**40), 2**40) for _ in range(rng.randrange(1, 500))]
        dim = spark.createDataFrame([(m,) for m in set(members)], "k long")
        words = bloom_build(dim, "k", n_bits=n_bits, n_hashes=k)
        kept = bloom_prefilter(
            dim.withColumnRenamed("k", "fk"), "fk", words, n_bits=n_bits, n_hashes=k
        )
        assert kept.count() == dim.count(), (trial, n_bits, k)
