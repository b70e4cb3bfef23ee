"""KMV sketch invariants: merge associativity/idempotence (streamed state
== one-shot sketch under different batchings) and estimator behavior on
known-cardinality fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F


def _one_shot_kmv(df, k):
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("fp")
    return (
        df.select(
            "event_type", F.md5(F.col("user_id").cast("string").cast("binary")).alias("fp")
        )
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("fp").alias("kth_hash"))
    )


def test_streamed_state_equals_one_shot_for_any_batching(spark, sf_dir):
    from data_integration_and_processing_spark.streaming.pipelines import (
        run_streaming_kmv_distinct,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    # two different physical layouts => different micro-batch boundaries
    # under maxFilesPerTrigger=1; bottom-k-of-union must not care
    got1 = run_streaming_kmv_distinct(spark, e.repartition(3), k=16)
    got7 = run_streaming_kmv_distinct(spark, e.repartition(7, "event_id"), k=16)
    one = _one_shot_kmv(e, 16)
    ref = {r["event_type"]: (r["n_sketch"], r["kth_hash"]) for r in one.collect()}
    for got in (got1, got7):
        rows = {r["event_type"]: (r["n_sketch"], r["kth_hash"]) for r in got.collect()}
        assert rows.keys() == ref.keys()
        for t, (n, kth) in ref.items():
            assert rows[t][0] == n and rows[t][1] == kth


def test_small_set_branch_is_exact(spark):
    from data_integration_and_processing_spark.streaming.pipelines import (
        run_streaming_kmv_distinct,
    )

    rows = [(i, "t", i % 5) for i in range(40)]  # 5 distinct users < k
    e = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    got = run_streaming_kmv_distinct(spark, e, k=16).collect()
    assert len(got) == 1
    assert got[0]["n_sketch"] == 5
    assert got[0]["est_distinct_users_e4"] == 50_000


def test_kmv_difference_identities(spark, sf_dir):
    """A-not-B sketch identities on the registered query's own output:
    est|A\\B| + est|A∩B| should reconstruct est|A| within sketch error, and
    the directional counts are anti-symmetric in the exact column
    (exact(A\\B) - exact(B\\A) == |A| - |B|)."""
    from data_integration_and_processing_spark.queries.catalog import all_specs

    specs = all_specs()
    rows = {
        (r["g1"], r["g2"]): r
        for r in specs["agg_kmv_set_difference"].spark(spark, sf_dir).collect()
    }
    import duckdb

    exact_sizes = dict(
        duckdb.sql(
            f"SELECT o_orderpriority, count(DISTINCT o_custkey) FROM "
            f"read_parquet('{sf_dir}/orders.parquet') GROUP BY 1"
        ).fetchall()
    )
    for (g1, g2), r in rows.items():
        assert r["within_err"], (g1, g2, r)
        back = rows[(g2, g1)]
        assert r["exact_difference"] - back["exact_difference"] == exact_sizes[g1] - exact_sizes[g2]


def test_streaming_bitmap_distinct_exact_for_any_batching(spark, sf_dir):
    """Bitmap union is associative/commutative/idempotent: the streamed
    end-state count equals the exact batch count under different physical
    layouts (different micro-batch boundaries)."""
    from data_integration_and_processing_spark.streaming.pipelines import (
        run_streaming_bitmap_distinct,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for layout in (e.repartition(3), e.repartition(5, "user_id")):
        got = {
            r["event_type"]: r["n_distinct_users"]
            for r in run_streaming_bitmap_distinct(spark, layout).collect()
        }
        assert got == exact


def test_streaming_bigram_lm_exact_for_any_batching(spark, sf_dir):
    """Bigram-count addition is associative/commutative: the streamed LM
    table equals the one-shot text_bigram_lm result row-for-row under
    different physical layouts (different micro-batch boundaries)."""
    from data_integration_and_processing_spark.queries.text_queries import (
        text_bigram_lm,
    )
    from data_integration_and_processing_spark.streaming.pipelines import (
        run_streaming_bigram_lm,
    )

    oneshot = [tuple(r) for r in text_bigram_lm(spark, sf_dir).collect()]
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    for layout in (d.repartition(3), d.repartition(5, "doc_id")):
        streamed = [tuple(r) for r in run_streaming_bigram_lm(spark, layout).collect()]
        assert streamed == oneshot
