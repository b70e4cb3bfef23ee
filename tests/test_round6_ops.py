"""Property tests for the round-6 operators: grid-bucketed interval overlap
join, duplicated-ngram-span diagnostic, greedy k-center coreset."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.queries import catalog


def _q(name):
    return catalog.all_specs()[name].spark


# ---------------------------------------------------------------------------
# join_interval_overlap
# ---------------------------------------------------------------------------


def test_interval_overlap_matches_naive_range_join(spark, sf_dir):
    """The grid-bucketed plan must produce EXACTLY the naive range-predicate
    join's pairs — cell bucketing plus the later-start-cell claim is a pure
    execution strategy, not an approximation."""
    from data_integration_and_processing_spark.queries.relational import (
        join_interval_overlap,
    )

    got = {
        (r["id_a"], r["id_b"]): r["overlap_days"]
        for r in join_interval_overlap(spark, sf_dir).collect()
    }

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ship = F.col("l_shipdate").cast("date")
    a = l.filter(F.col("l_orderkey") % 401 == 1).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id_a"),
        ship.alias("start_a"),
        F.date_add(ship, (F.lit(1) + F.col("l_orderkey") % 13).cast("int")).alias("end_a"),
    )
    b = o.filter(F.col("o_orderkey") % 499 == 1).select(
        F.col("o_orderkey").alias("id_b"),
        F.col("o_orderdate").cast("date").alias("start_b"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("end_b"),
    )
    naive = (
        a.crossJoin(b)
        .filter((F.col("start_a") <= F.col("end_b")) & (F.col("start_b") <= F.col("end_a")))
        .select(
            "id_a",
            "id_b",
            (F.datediff(F.least("end_a", "end_b"), F.greatest("start_a", "start_b")) + 1)
            .cast("bigint")
            .alias("overlap_days"),
        )
    )
    want = {(r["id_a"], r["id_b"]): r["overlap_days"] for r in naive.collect()}
    assert got == want


def test_interval_overlap_no_duplicate_pairs(spark, sf_dir):
    """The later-start-cell claim must emit each overlapping pair exactly
    once even though both intervals explode to multiple cells."""
    from data_integration_and_processing_spark.queries.relational import (
        join_interval_overlap,
    )

    out = join_interval_overlap(spark, sf_dir)
    assert out.count() == out.select("id_a", "id_b").distinct().count()


# ---------------------------------------------------------------------------
# text_duplicate_ngram_spans
# ---------------------------------------------------------------------------


def test_dup_ngram_bounds_and_short_doc_exclusion(spark, sf_dir):
    rows = _q("text_duplicate_ngram_spans")(spark, sf_dir).collect()
    assert rows, "expected some documents with >= 8 words"
    for r in rows:
        assert 0 <= r["n_dup_grams"] <= r["n_distinct_grams"]
        assert 0 <= r["dup_frac_micro"] <= 1_000_000
    # every included doc really has >= 8 words
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_long = d.filter(F.size(F.split(F.lower("text"), " ")) >= 8).count()
    assert len(rows) == n_long


def test_dup_ngram_detects_injected_duplicate(spark, sf_dir):
    """Two synthetic docs sharing an 8-word span must both report dup_frac
    > 0; a doc of unique words reports 0."""
    from data_integration_and_processing_spark.queries.text_queries import (
        text_duplicate_ngram_spans,
    )
    import os
    import shutil
    import uuid

    scratch = f"/tmp/diaps_test_ngram_{uuid.uuid4().hex[:8]}"
    os.makedirs(scratch, exist_ok=True)
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three", "en", "s", 1),
            (2, f"prefix words here {shared}", "en", "s", 1),
            (3, "only unique tokens appear in this third document row", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{scratch}/documents.parquet")
    try:
        out = {r["doc_id"]: r for r in text_duplicate_ngram_spans(spark, scratch).collect()}
        assert out[1]["n_dup_grams"] >= 1 and out[2]["n_dup_grams"] >= 1
        assert out[3]["n_dup_grams"] == 0 and out[3]["dup_frac_micro"] == 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# sample_coreset_kcenter
# ---------------------------------------------------------------------------


def test_kcenter_shape_and_determinism(spark, sf_dir):
    from data_integration_and_processing_spark.queries.sampling_queries import (
        _KC_K,
        sample_coreset_kcenter,
    )

    a = sample_coreset_kcenter(spark, sf_dir).collect()
    b = sample_coreset_kcenter(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == _KC_K
    assert [r["rank"] for r in a] == list(range(1, _KC_K + 1))
    assert len({r["vec_id"] for r in a}) == _KC_K
    # greedy max-min distances are non-increasing by construction
    dists = [r["dist2"] for r in a[1:]]
    assert all(x is not None and x >= 0 for x in dists)
    assert all(dists[i] >= dists[i + 1] for i in range(len(dists) - 1))


def test_kcenter_covers_better_than_prefix_of_ids(spark, sf_dir):
    """The k-center set's covering radius (max over points of distance to
    nearest center) must beat the naive first-k-ids baseline — the point of
    diverse selection."""
    from data_integration_and_processing_spark.queries.sampling_queries import (
        _KC_K,
        sample_coreset_kcenter,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")

    def radius(center_ids: list[int]) -> float:
        centers = e.filter(F.col("vec_id").isin(center_ids)).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("cemb").cast("array<double>"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            e.crossJoin(F.broadcast(centers))
            .select("vec_id", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("md"))
            .agg(F.max("md"))
            .collect()[0][0]
        )

    picked = [r["vec_id"] for r in sample_coreset_kcenter(spark, sf_dir).collect()]
    first_ids = [r["vec_id"] for r in e.orderBy("vec_id").limit(_KC_K).collect()]
    assert radius(picked) < radius(first_ids)


# ---------------------------------------------------------------------------
# sim_binary_hamming_topk
# ---------------------------------------------------------------------------


def test_hamming_topk_bounds_and_self_distance(spark, sf_dir):
    rows = _q("sim_binary_hamming_topk")(spark, sf_dir).collect()
    assert rows and all(0 <= r["hamming"] <= 64 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        hams = [r["hamming"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert hams == sorted(hams)


def test_hamming_correlates_with_cosine(spark, sf_dir):
    """Sign codes must be informative: the Hamming top-10 of query 0 should
    overlap the exact cosine top-10 far better than chance (50 codes vs a
    ~500-vector corpus)."""
    from pyspark.sql import functions as F

    ham = {
        r["neighbor_id"]
        for r in _q("sim_binary_hamming_topk")(spark, sf_dir).collect()
        if r["query_id"] == 0
    }
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("qv").cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    topcos = (
        e.filter(F.col("vec_id") >= 5)
        .crossJoin(F.broadcast(q))
        .select("vec_id", dot.alias("dot"))
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    overlap = len(ham & {r["vec_id"] for r in topcos})
    assert overlap >= 3, f"hamming/cosine top-10 overlap only {overlap}"


# ---------------------------------------------------------------------------
# sample_stratified_kfold
# ---------------------------------------------------------------------------


def test_kfold_is_leak_proof_and_total(spark, sf_dir):
    """Every customer's orders land in exactly one fold; folds partition all
    orders and are roughly balanced."""
    from pyspark.sql import functions as F

    from data_integration_and_processing_spark.operators.sampling import hash_bucket

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assigned = o.select("o_custkey", hash_bucket(["o_custkey"], 5, seed=7).alias("fold"))
    per_cust = assigned.groupBy("o_custkey").agg(F.count_distinct("fold").alias("nf"))
    assert per_cust.filter(F.col("nf") > 1).count() == 0
    census = _q("sample_stratified_kfold")(spark, sf_dir).collect()
    assert sum(r["n_orders"] for r in census) == o.count()
    by_fold = {}
    for r in census:
        by_fold[r["fold"]] = by_fold.get(r["fold"], 0) + r["n_orders"]
    assert set(by_fold) == set(range(5))
    mean = sum(by_fold.values()) / 5
    assert all(abs(v - mean) / mean < 0.25 for v in by_fold.values()), by_fold


# ---------------------------------------------------------------------------
# multimodal_dedup_exact_bytes
# ---------------------------------------------------------------------------


def test_bytes_dedup_ledger_arithmetic(spark, sf_dir):
    rows = _q("multimodal_dedup_exact_bytes")(spark, sf_dir).collect()
    assert rows, "injected byte-identical copies must produce dup groups"
    for r in rows:
        assert r["n_copies"] >= 2
        assert r["bytes_saved"] == (r["n_copies"] - 1) * r["n_bytes"]
        # keeper is the original, not the +100000 re-ingest
        assert r["keeper_doc_id"] < 100000


# ---------------------------------------------------------------------------
# sample_split_dedup_aware
# ---------------------------------------------------------------------------


def test_dedup_aware_split_never_straddles_groups(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _q("sample_split_dedup_aware")(spark, sf_dir)
    straddle = out.groupBy("grp").agg(F.count_distinct("split").alias("ns"))
    assert straddle.filter(F.col("ns") > 1).count() == 0
    # every injected variant copy (id + 10000) shares its original's split
    pairs = out.alias("a").join(
        out.alias("b"), F.col("a.id") + 10000 == F.col("b.id")
    )
    assert pairs.filter(F.col("a.split") != F.col("b.split")).count() == 0
    # rough 80/20 at the GROUP grain
    grp = out.select("grp", "split").distinct()
    frac = grp.filter(F.col("split") == "train").count() / grp.count()
    assert 0.7 < frac < 0.9, frac


def test_mips_augmentation_equivalence_any_k(spark, sf_dir):
    """The norm-augmentation reduction must agree with raw inner-product
    ranking at any k and for any query vector (cosine of the augmented
    vectors is a monotone transform of the dot)."""
    from pyspark.sql import functions as F

    from data_integration_and_processing_spark.operators.similarity import mips_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 7).first()["embedding"]
    raw, aug = mips_topk(e.filter(F.col("vec_id") != 7), list(q), k=25)
    raw_ids = [r["vec_id"] for r in raw.collect()]
    aug_ids = [r["vec_id"] for r in aug.collect()]
    assert set(raw_ids) == set(aug_ids)
    # full rank order also agrees (monotone transform, shared tiebreak)
    assert raw_ids == aug_ids


def test_bitmap_bucket_arithmetic_matches_oracle_formula(spark):
    """The agg_bitmap_exact_distinct oracle computes buckets as
    (v + 32767) // 32768; pin that this equals Spark's
    bitmap_bucket_number for positive keys (the fixture domain)."""
    from pyspark.sql import functions as F

    df = spark.range(1, 200_000, 7).select(F.col("id").alias("v"))
    bad = df.select(
        F.expr("bitmap_bucket_number(v)").alias("spark_b"),
        ((F.col("v") + 32767) / 32768).cast("long").alias("oracle_b"),
    ).filter(F.col("spark_b") != F.col("oracle_b"))
    assert bad.count() == 0


def test_cuped_removes_perfectly_correlated_covariate(spark):
    """When the pre-period metric IS the experiment metric, theta = 1 and
    the CUPED-adjusted values collapse to a constant (variance -> 0) —
    the limiting case that catches sign/centering bugs in the moment
    arithmetic."""
    import math

    from pyspark.sql import functions as F

    rows = [(i, float(10 + (i * 37) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, y double")
    per_user = df.select("user_id", F.col("y").alias("y_pre"), "y")
    mom = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y_pre").alias("sp"), F.sum("y").alias("sy"),
        F.sum(F.col("y_pre") * F.col("y_pre")).alias("spp"),
        F.sum(F.col("y_pre") * F.col("y")).alias("spy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n, sp, sy, spp, spy = mom["n"], mom["sp"], mom["sy"], mom["spp"], mom["spy"]
    theta = (spy / n - (sp / n) * (sy / n)) / (spp / n - (sp / n) * (sp / n))
    assert math.isclose(theta, 1.0, rel_tol=1e-9)
    mp = sp / n
    resid = per_user.select(
        (F.col("y") - F.lit(theta) * (F.col("y_pre") - F.lit(mp))).alias("c")
    )
    stats = resid.agg(F.var_pop("c").alias("v")).first()
    assert stats["v"] < 1e-18
