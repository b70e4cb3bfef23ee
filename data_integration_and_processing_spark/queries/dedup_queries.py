"""Dedup queries over ``documents`` (north-star surface).

The fixture corpus has no duplicates, so these queries synthesize them
deterministically in-plan: each document is unioned with a mutated copy
(id + 10000, last 7 words dropped). Exact dedup then has real work to do,
and near-dup detectors (MinHash-LSH / SimHash / n-gram Jaccard) must find
each (original, copy) pair. The construction is mirrored in the oracles, so
exact + Jaccard results are value-checked end to end; MinHash/SimHash use
hash functions DuckDB doesn't have and are rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
    simhash_signatures,
)
from data_integration_and_processing_spark.operators.parallelism import tiny_local_df
from data_integration_and_processing_spark.queries.catalog import register
from data_integration_and_processing_spark.sources.tables import load_table

# Shared corpus-with-duplicates construction (Spark + SQL mirror).
_MUTATED_SQL = """
    SELECT doc_id AS id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS id,
           array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 7], ' ') AS text
    FROM documents
"""


def _with_mutated_copies(df: DataFrame) -> DataFrame:
    """Corpus + a truncated twin per document (the planted near-dup ground
    truth every dedup audit keys on). Single-scan explode: the old
    union-of-two-selects formulation cost 2 document scans per CONSUMER of
    this frame (dedup_minhash_lsh's pair-join audit held 24 corpus scans;
    halved here for free). Deliberately NOT checkpointed: a measured
    attempt made the three jaccard headliners 30-50% slower — re-scanning
    a small parquet file is cheaper than the materialization barrier plus
    block-store round-trip, and the per-consumer work that dominates
    (shingling, pair joins) happens downstream of this frame either way."""
    words = F.split(F.col("text"), " ")
    truncated = F.array_join(F.slice(words, 1, F.size(words) - 7), " ")
    return df.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id").alias("id"), F.col("text").alias("text")),
                F.struct(
                    (F.col("doc_id") + 10000).alias("id"), truncated.alias("text")
                ),
            )
        ).alias("r")
    ).select("r.id", "r.text")


def _with_exact_copies(df: DataFrame) -> DataFrame:
    orig = df.select(F.col("doc_id").alias("id"), "text")
    return orig.unionByName(df.select((F.col("doc_id") + 10000).alias("id"), "text"))


@register(
    "dedup_exact",
    oracle="""
        WITH u AS (SELECT doc_id AS id, text FROM documents
                   UNION ALL
                   SELECT doc_id + 10000 AS id, text FROM documents)
        SELECT min(id) AS id, md5(text) AS fp, count(*) AS n_copies
        FROM u GROUP BY md5(text)
    """,
    description="exact dedup: hash-groupBy on md5(text), keep min id (north-star)",
    tags=("dedup", "north-star"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _with_exact_copies(d)
    # Same plan exact_dedup() uses, but surfacing the group stats so the
    # oracle checks values, not just survivor count.
    return (
        u.select("id", F.md5(F.col("text").cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("id"), F.count("*").alias("n_copies"))
        .select("id", "fp", "n_copies")
    )


@register(
    "dedup_exact_survivors",
    oracle="""
        WITH u AS (SELECT doc_id AS id, text FROM documents
                   UNION ALL
                   SELECT doc_id + 10000 AS id, text FROM documents)
        SELECT id FROM u
        WHERE id IN (SELECT min(id) FROM u GROUP BY text)
    """,
    description="exact dedup survivors via the reusable exact_dedup operator (left-semi plan)",
    tags=("dedup", "north-star"),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _with_exact_copies(d)
    return exact_dedup(u, text_col="text", id_col="id").select("id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH u AS ({_MUTATED_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id_a, id_b, inter,
               CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
        FROM pair_inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
    description="n-gram Jaccard near-dup pairs via inverted-index join (north-star)",
    tags=("dedup", "north-star"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    return ngram_jaccard_pairs(u, text_col="text", id_col="id", n=3, threshold=0.5)


# Recall floors for the audit-form dedup entries (same hoisting rule as the
# ANN floors in similarity_queries: one constant drives the driver-checked
# boolean AND any pytest assertion). Measured on the seeded fixtures:
# MinHash-LSH catches 0.953-0.960 of the exact J>=0.5 pair set (signatures
# are seeded, so per-fixture recall is FIXED, not run-random); SimHash
# Hamming<=8 catches 0.618-0.642 of the planted truncated-twin pairs and
# emits ~4.1 candidates per original document.
_MINHASH_RECALL_FLOOR = 0.85
_SIMHASH_PLANTED_FLOOR = 0.5
_SIMHASH_CAND_CAP_PER_DOC = 8


@register(
    "dedup_minhash_lsh",
    # Audit form (VERDICT r7 item 4 pattern): the xxhash64 signature family
    # has no DuckDB twin, but the EXACT J>=0.5 pair set does (the
    # dedup_ngram_jaccard oracle), and LSH output is structurally a subset
    # of it (candidates are exact-verified at the same threshold). The
    # driver-checked output is the exact pair set plus the LSH recall-floor
    # verdict; a banding/signature regression drops recall and flips the
    # boolean. Raw LSH pairs: operators/dedup.py::minhash_lsh_pairs (its
    # 50k-doc timing is the standing dedup_scale_probe in bench.py).
    oracle=f"""
        WITH u AS ({_MUTATED_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id_a, id_b, inter,
               CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard,
               true AS recall_ok
        FROM pair_inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
    description=(
        "MinHash(32)+LSH(8x4) near-dup pairs with exact Jaccard verify "
        "(north-star), driver-checked in audit form: the exact J>=0.5 pair "
        "set plus the boolean that LSH banding caught >= 85% of it "
        "(measured 95-96% on the seeded fixtures)"
    ),
    tags=("dedup", "north-star", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    # the exact pair ledger is consumed three times (semi-join, verdict
    # count, output) over an expensive shingle pair-join lineage: O(pairs)
    # rows, materialize once
    exact = ngram_jaccard_pairs(
        u, text_col="text", id_col="id", n=3, threshold=0.5
    ).localCheckpoint(eager=True)
    lsh = minhash_lsh_pairs(
        u, text_col="text", id_col="id", num_hashes=32, bands=8, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    caught = exact.join(lsh, ["id_a", "id_b"], "left_semi")
    verdict = exact.select(F.count("*").alias("_n")).crossJoin(
        caught.select(F.count("*").alias("_hit"))
    ).select(
        (F.col("_hit") >= F.lit(_MINHASH_RECALL_FLOOR) * F.col("_n")).alias("recall_ok")
    )
    return (
        exact.withColumn("_j", F.lit(1))
        .join(F.broadcast(verdict.withColumn("_j", F.lit(1))), "_j")
        .select("id_a", "id_b", "inter", "jaccard", "recall_ok")
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_simhash",
    # Audit form: the 63-bit xxhash64 bit-vote signature has no DuckDB
    # twin, but the PLANTED ground truth does — every document has a
    # deterministic truncated twin at id+10000 — so the driver-checked
    # output is the planted pair ledger plus two booleans: banded
    # Hamming<=8 catches >= 50% of planted twins (measured 62-64%), and
    # the candidate pair count stays under 8 per original document (a
    # bucket-collapse regression explodes it quadratically).
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_planted,
               true AS planted_recall_ok,
               true AS candidate_bound_ok
        FROM documents
    """,
    description=(
        "SimHash(63-bit) signatures + banded Hamming<=8 candidate pairs "
        "(north-star), driver-checked in audit form: planted-twin recall "
        "floor + candidates-per-document cap as booleans (raw pairs: "
        "operators/dedup.py::simhash_candidates)"
    ),
    tags=("dedup", "north-star"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    pairs = simhash_candidates(u, text_col="text", id_col="id", max_hamming=8)
    planted = d.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 10000).alias("id_b")
    )
    caught = planted.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    return (
        planted.agg(F.count("*").alias("n_planted"))
        .crossJoin(F.broadcast(caught.agg(F.count("*").alias("_hit"))))
        .crossJoin(F.broadcast(pairs.agg(F.count("*").alias("_cands"))))
        .select(
            "n_planted",
            (F.col("_hit") >= F.lit(_SIMHASH_PLANTED_FLOOR) * F.col("n_planted")).alias(
                "planted_recall_ok"
            ),
            (F.col("_cands") <= F.lit(_SIMHASH_CAND_CAP_PER_DOC) * F.col("n_planted")).alias(
                "candidate_bound_ok"
            ),
        )
    )


@register(
    "dedup_simhash_signatures",
    # Audit form (VERDICT r7 item 4 pattern): the xxhash64 bit-vote has no
    # DuckDB twin, so the driver-checked output is the exact corpus counts
    # the oracle recomputes + boolean invariants of the real signatures:
    # same text => same signature (the property dedup relies on), all
    # signatures in the non-negative 63-bit range, and the population count
    # inside a generous balance band (measured 19..37 around a 28.0 mean on
    # the fixtures; a hash regression collapses bits and leaves the band).
    # Raw signatures: dedup_simhash_signatures_raw.
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
               true AS sig_deterministic_ok,
               true AS sig_range_ok,
               true AS bit_balance_ok
        FROM documents
    """,
    description=(
        "per-document SimHash signatures (deterministic; pure map stage), "
        "driver-checked in audit form: exact corpus counts + "
        "text-determines-signature / range / bit-balance booleans "
        "(raw signatures: dedup_simhash_signatures_raw)"
    ),
    tags=("dedup", "north-star"),
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sig = dedup_simhash_signatures_raw(spark, sf_dir)
    joined = d.select("doc_id", "text").join(sig, "doc_id")
    per_text = joined.groupBy("text").agg(F.countDistinct("simhash").alias("ns"))
    det = per_text.agg(
        (F.max("ns") == 1).alias("sig_deterministic_ok"),
        F.count("*").cast("long").alias("n_distinct_texts"),
    )
    stats = sig.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.min("simhash") >= 0).alias("nonneg"),
        F.avg(F.bit_count("simhash")).alias("avg_pop"),
        F.min(F.bit_count("simhash")).alias("min_pop"),
        F.max(F.bit_count("simhash")).alias("max_pop"),
    )
    return stats.crossJoin(det).select(  # two 1-row frames
        "n_docs",
        "n_distinct_texts",
        "sig_deterministic_ok",
        F.col("nonneg").alias("sig_range_ok"),
        (
            F.col("avg_pop").between(24.0, 40.0)
            & (F.col("min_pop") >= 8)
            & (F.col("max_pop") <= 56)
        ).alias("bit_balance_ok"),
    )


def dedup_simhash_signatures_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw per-document signatures (engine-specific bit-vote; the registered
    entry wraps this in the exact+invariant audit form)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_signatures(d, "text", "doc_id").select(
        F.col("id").alias("doc_id"), F.col("sig").alias("simhash")
    )


# LSH misses edges, never invents them (candidates are exact-verified), so
# LSH components refine exact components and LSH survivors ⊇ exact
# survivors. Measured survivor excess on the seeded fixtures: 21/502
# (4.2%) of exact-dropped docs at sf0.01.
_E2E_EXCESS_CAP = 0.15


def dedup_pipeline_end2end_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw survivor ids (signature family is engine-specific; the registered
    entry wraps this in the exact+invariant audit form)."""
    from data_integration_and_processing_spark.operators.dedup import minhash_lsh_dedup

    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    return minhash_lsh_dedup(u, text_col="text", id_col="id").select("id").orderBy("id")


@register(
    "dedup_pipeline_end2end",
    # Audit form (VERDICT r7 item 4 pattern): minhash signatures have no
    # DuckDB twin, but the EXACT J>=0.5 survivor set does (Jaccard pairs ->
    # recursive-CTE closure -> min-id rule, the pipeline_entity_resolution
    # oracle pattern). Because LSH candidates are exact-verified, LSH edges
    # ⊆ exact edges, so exact survivors MUST be a subset of LSH survivors
    # (a min-id of an exact component is the min-id of its LSH
    # sub-component) — that containment plus a survivor-excess cap is the
    # driver-checked contract. Raw survivor ids: dedup_pipeline_end2end_raw.
    oracle=f"""
        WITH u AS ({_MUTATED_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        ),
        pairs AS (
            SELECT id_a, id_b
            FROM pair_inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
        ),
        sym AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            WITH RECURSIVE r(a, b) AS (
                SELECT id, id FROM u
                UNION
                SELECT r.a, sym.b FROM r JOIN sym ON r.b = sym.a
            )
            SELECT * FROM r
        ),
        lab AS (SELECT a AS id, min(b) AS component FROM reach GROUP BY a)
        SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_input,
               CAST((SELECT count(*) FROM lab WHERE id = component) AS BIGINT)
                   AS n_exact_survivors,
               true AS exact_subset_of_lsh_ok,
               true AS lsh_bounds_ok,
               true AS excess_cap_ok
    """,
    description=(
        "the complete near-dedup pipeline: MinHash-LSH pairs -> connected "
        "components -> min-id survivor per duplicate cluster (north-star "
        "composite), driver-checked in audit form: exact input/survivor "
        "counts under the exact-Jaccard closure (recursive-CTE oracle) + "
        "containment and excess-cap booleans on the real LSH survivor set "
        "(raw ids: dedup_pipeline_end2end_raw)"
    ),
    tags=("dedup", "north-star", "lsh", "graph"),
)
def dedup_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        connected_components,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    lsh_surv = dedup_pipeline_end2end_raw(spark, sf_dir)
    exact_pairs = ngram_jaccard_pairs(
        u, text_col="text", id_col="id", n=3, threshold=0.5
    ).select("id_a", "id_b")
    comp = connected_components(exact_pairs)
    exact_surv = u.select("id").join(
        comp.filter(F.col("id") != F.col("component")).select("id"), "id", "left_anti"
    )
    input_stats = u.agg(F.count("*").cast("long").alias("n_input"))
    exact_stats = exact_surv.agg(F.count("*").cast("long").alias("n_exact_survivors"))
    lsh_stats = lsh_surv.agg(F.count("*").cast("long").alias("n_lsh"))
    subset = exact_surv.join(lsh_surv, "id", "left_anti").agg(
        (F.count("*") == 0).alias("exact_subset_of_lsh_ok")
    )
    return (
        input_stats.crossJoin(exact_stats).crossJoin(lsh_stats).crossJoin(subset)  # 1-row frames
        .select(
            "n_input",
            "n_exact_survivors",
            "exact_subset_of_lsh_ok",
            (
                (F.col("n_lsh") >= F.col("n_exact_survivors"))
                & (F.col("n_lsh") <= F.col("n_input"))
            ).alias("lsh_bounds_ok"),
            (
                (F.col("n_lsh") - F.col("n_exact_survivors"))
                <= F.ceil(
                    F.lit(_E2E_EXCESS_CAP)
                    * (F.col("n_input") - F.col("n_exact_survivors"))
                )
            ).alias("excess_cap_ok"),
        )
    )


@register(
    "dedup_normalized_exact",
    oracle="""
        WITH u AS (
            SELECT doc_id AS id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS id, concat(upper(text), '  !!') AS text FROM documents
        ),
        n AS (
            SELECT id,
                   md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                           ' +', ' ', 'g'))) AS fp
            FROM u
        )
        SELECT min(id) AS id, fp, count(*) AS n_copies
        FROM n GROUP BY fp
    """,
    description=(
        "normalization-then-hash dedup: canonical form (case/punctuation/whitespace "
        "folded) catches near-trivial duplicates raw-byte hashing misses — the cheap "
        "first pass before MinHash; variant copies here differ only in case+punctuation"
    ),
    tags=("dedup", "north-star"),
)
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import normalize_for_dedup

    d = load_table(spark, sf_dir, "documents")
    u = d.select(F.col("doc_id").alias("id"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 10000).alias("id"),
            F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
        )
    )
    return (
        u.select("id", F.md5(normalize_for_dedup(F.col("text")).cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("id"), F.count("*").alias("n_copies"))
        .select("id", "fp", "n_copies")
    )


def dedup_cap_audit_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw (dropped_buckets, dropped_ids, candidate_buckets, max_bucket_size)
    report (xxhash64-banding-specific; the registered entry wraps this in the
    exact+invariant audit form)."""
    from data_integration_and_processing_spark.operators.dedup import (
        bucket_cap_report,
        lsh_bands,
        minhash_signature_from_hashes,
        shingle_keys,
    )

    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    hs = u.select("id", shingle_keys(F.col("text"), 3).alias("hs")).filter(F.size("hs") > 0)
    sig = hs.select("id", minhash_signature_from_hashes(F.col("hs"), 32).alias("sig"))
    banded = sig.select(
        "id", F.posexplode(lsh_bands(F.col("sig"), 8, 4)).alias("band", "bucket")
    )
    return bucket_cap_report(banded, ["band", "bucket"], max_bucket=64)


@register(
    "dedup_cap_audit",
    # Audit form (VERDICT r7 item 4 pattern): xxhash64 banding is not
    # expressible in DuckDB, but the banded-row total is pure arithmetic
    # (8 bands per doc with >= 1 shingle — both corpus halves countable in
    # SQL), and the cap report must satisfy accounting identities over ANY
    # hash family: every dropped bucket exceeds the cap (so dropped_ids >
    # cap * dropped_buckets), dropped rows never exceed the banded total,
    # and max_bucket_size crosses the cap iff something was dropped. Raw
    # report: dedup_cap_audit_raw.
    oracle=f"""
        WITH u AS ({_MUTATED_SQL})
        SELECT CAST(8 * count(*) FILTER (
                   WHERE len(string_split(text, ' ')) >= 3
               ) AS BIGINT) AS n_banded_rows,
               true AS accounting_ok,
               true AS cap_consistency_ok
        FROM u
    """,
    description=(
        "recall-cap audit for capped LSH runs: how many band buckets (and member rows) a "
        "max_bucket cap drops, plus the largest bucket — the observable counterpart of the "
        "silent-loss trade (bucket_cap_report; zero-cost path is the Observation hook). "
        "Driver-checked in audit form: exact banded-row arithmetic + accounting-identity "
        "booleans (raw report: dedup_cap_audit_raw)"
    ),
    tags=("dedup", "north-star", "lsh", "profiling"),
)
def dedup_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = dedup_cap_audit_raw(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    n_banded = u.filter(F.size(F.split("text", " ")) >= 3).agg(
        (8 * F.count("*")).cast("long").alias("n_banded_rows")
    )
    cap = 64
    return n_banded.crossJoin(report).select(  # two 1-row frames
        "n_banded_rows",
        (
            (F.col("dropped_ids") >= (cap + 1) * F.col("dropped_buckets"))
            & (F.col("dropped_ids") <= F.col("n_banded_rows"))
        ).alias("accounting_ok"),
        (
            ((F.col("dropped_buckets") > 0) & (F.col("max_bucket_size") > cap))
            | ((F.col("dropped_buckets") == 0) & (F.col("max_bucket_size") <= cap))
        ).alias("cap_consistency_ok"),
    )


@register(
    "dedup_incremental_neardup",
    # Audit form (VERDICT r8 item 5): MinHash-LSH banding has no DuckDB
    # twin, so the driver-checked output is the exact SQL-computable fixture
    # arithmetic plus incremental-vs-one-shot equivalence booleans. With the
    # snapshot pre-deduped by the same engine (the operator's contract — a
    # snapshot IS an already-near-deduped corpus), the incremental accepted
    # corpus (snapshot + batch survivors) and a one-shot minhash_lsh_dedup
    # over snapshot+batch produce the SAME survivor count; the id-level
    # divergence is exactly the documented survivor-choice difference
    # (incremental keeps the earlier-accepted snapshot member, one-shot the
    # min id), so every inc-only id must be a snapshot doc and every
    # one-shot-only id a batch doc. Measured sf0.001/sf0.01: counts equal
    # (478 == 478 at sf0.01), 5 divergent ids each way, all explained; 94-96%
    # of injected truncated twins dropped (floor 0.9; seeded hashes make the
    # measurement fixed, not run-random). Raw survivor ids:
    # dedup_incremental_neardup_raw. Operator semantics additionally pinned
    # in tests/test_incremental_neardup.py.
    oracle="""
        SELECT CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_snapshot_raw,
               CAST(sum(CASE WHEN doc_id % 3 = 0 OR doc_id % 7 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_batch,
               CAST(sum(CASE WHEN doc_id % 3 <> 0 AND doc_id % 7 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_injected,
               true AS counts_equal_ok,
               true AS divergence_explained_ok,
               true AS injected_drop_ok
        FROM documents
    """,
    description=(
        "steady-state NEAR-dedup ingest: a new batch (novel docs + truncated "
        "near-copies of snapshot docs) joins the snapshot's banded LSH index "
        "on (band, bucket), exact-Jaccard-verifies candidates, drops "
        "snapshot-near-dups, then near-dedups within the batch — O(batch + "
        "matched buckets) per ingest instead of re-running dedup over the "
        "whole corpus. Driver-checked in audit form: exact fixture counts + "
        "booleans that the incremental accepted corpus matches a one-shot "
        "dedup of the same corpus in survivor COUNT, that id-level "
        "divergence is exactly the survivor-choice difference, and that "
        ">= 90% of injected near-copies were dropped (raw ids: "
        "dedup_incremental_neardup_raw)"
    ),
    tags=("dedup", "north-star", "incremental"),
)
def dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        minhash_lsh_dedup,
        neardup_against_snapshot,
    )

    d = load_table(spark, sf_dir, "documents")
    snapshot, batch, injected = _incremental_neardup_fixture(d)
    # pre-dedup the snapshot with the same engine: the operator's contract
    # is "batch against an already-near-deduped corpus", and the
    # equivalence boolean below only holds under that premise
    snapshot = minhash_lsh_dedup(snapshot, text_col="text", id_col="id").localCheckpoint(
        eager=True
    )
    surv = (
        neardup_against_snapshot(batch, snapshot, id_col="id", text_col="text")
        .select("id")
        .localCheckpoint(eager=True)
    )
    inc = snapshot.select("id").unionByName(surv)
    oneshot = (
        minhash_lsh_dedup(snapshot.unionByName(batch), text_col="text", id_col="id")
        .select("id")
        .localCheckpoint(eager=True)
    )

    counts = (
        d.agg(
            F.sum((F.col("doc_id") % 3 != 0).cast("long")).alias("n_snapshot_raw"),
            F.sum(((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 7 == 1)).cast("long")).alias(
                "n_batch"
            ),
            F.sum(((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 1)).cast("long")).alias(
                "n_injected"
            ),
        )
    )
    counts_equal = (
        inc.agg(F.count("*").alias("_inc"))
        .crossJoin(oneshot.agg(F.count("*").alias("_one")))
        .select((F.col("_inc") == F.col("_one")).alias("counts_equal_ok"))
    )
    # inc-only ids must all be snapshot docs; one-shot-only ids all batch docs
    inc_only_batch = (
        inc.join(oneshot, "id", "left_anti")
        .join(batch.select("id"), "id", "left_semi")
        .agg(F.count("*").alias("_bad_inc"))
    )
    one_only_snap = (
        oneshot.join(inc, "id", "left_anti")
        .join(snapshot.select("id"), "id", "left_semi")
        .agg(F.count("*").alias("_bad_one"))
    )
    divergence = inc_only_batch.crossJoin(one_only_snap).select(
        ((F.col("_bad_inc") == 0) & (F.col("_bad_one") == 0)).alias("divergence_explained_ok")
    )
    injected_drop = (
        injected.select("id")
        .join(surv, "id", "left_semi")
        .agg(F.count("*").alias("_inj_kept"))
        .crossJoin(injected.agg(F.count("*").alias("_inj")))
        .select((F.col("_inj_kept") <= 0.1 * F.col("_inj")).alias("injected_drop_ok"))
    )
    return (
        counts.crossJoin(F.broadcast(counts_equal))  # all 1-row frames
        .crossJoin(F.broadcast(divergence))
        .crossJoin(F.broadcast(injected_drop))
    )


def _incremental_neardup_fixture(d: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(raw snapshot, batch, injected) split of the documents fixture:
    snapshot = doc_id % 3 != 0; batch = novel (doc_id % 3 == 0) + truncated
    near-copies of every 7th snapshot doc at id+500_000."""
    words = F.split(F.col("text"), " ")
    truncated = F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 5, F.lit(1))), " ")
    snapshot = d.filter(F.col("doc_id") % 3 != 0).select(F.col("doc_id").alias("id"), "text")
    novel = d.filter(F.col("doc_id") % 3 == 0).select(F.col("doc_id").alias("id"), "text")
    injected = (
        d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 1))
        .select((F.col("doc_id") + 500_000).alias("id"), truncated.alias("text"))
    )
    return snapshot, novel.unionByName(injected), injected


def dedup_incremental_neardup_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw batch-survivor ids of the incremental ingest (the pre-audit-form
    registered output): batch docs that survived both the snapshot check and
    the in-batch near-dedup."""
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        neardup_against_snapshot,
    )

    d = load_table(spark, sf_dir, "documents")
    snapshot, batch, _ = _incremental_neardup_fixture(d)
    out = neardup_against_snapshot(batch, snapshot, id_col="id", text_col="text")
    return out.select("id", (F.col("id") >= 500_000).alias("was_injected")).orderBy("id")


# ---------------------------------------------------------------------------
# containment near-dup (asymmetric inclusion)
# ---------------------------------------------------------------------------

# Inclusion fixture: every 5th document gains a prefix copy holding its first
# 40% of words — jaccard vs the original is ~0.4 (below any near-dup
# threshold) but containment is 1.0.
_CONTAIN_SQL = """
    SELECT doc_id AS id, text FROM documents
    UNION ALL
    SELECT doc_id + 20000 AS id,
           array_to_string(string_split(text, ' ')[1:greatest(3,
               CAST(floor(len(string_split(text, ' ')) * 0.4) AS INT))], ' ') AS text
    FROM documents WHERE doc_id % 5 = 0
"""


def _with_prefix_copies(df: DataFrame) -> DataFrame:
    words = F.split(F.col("text"), " ")
    k = F.greatest(F.lit(3), F.floor(F.size(words) * 0.4).cast("int"))
    prefix = F.array_join(F.slice(words, F.lit(1), k), " ")
    orig = df.select(F.col("doc_id").alias("id"), "text")
    copies = df.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 20000).alias("id"), prefix.alias("text")
    )
    return orig.unionByName(copies)


@register(
    "dedup_ngram_containment",
    oracle=f"""
        WITH u AS ({_CONTAIN_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id_a, id_b, inter,
               CAST((inter * 1000000) // least(sa.n_sh, sb.n_sh) AS BIGINT)
                   AS containment_micro
        FROM pair_inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE inter * 1000000 >= 900000 * least(sa.n_sh, sb.n_sh)
    """,
    description=(
        "asymmetric containment near-dup: pairs with n-gram containment "
        "inter/min(|A|,|B|) >= 0.9 — catches a document wholly included in a larger "
        "one (quotes, boilerplate, prefix truncations), which Jaccard structurally "
        "misses (inclusion jaccard ~= |A|/|B|). Same inverted-index single-shuffle "
        "plan as dedup_ngram_jaccard, 8-byte shingle-hash keys, in-task i<j pair "
        "expansion, df-cap lever for hot shingles"
    ),
    tags=("dedup", "north-star"),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        ngram_containment_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    u = _with_prefix_copies(d)
    out = ngram_containment_pairs(u, text_col="text", id_col="id", n=3, threshold=0.9)
    return out


@register(
    "dedup_ngram_jaccard_prefix",
    # IDENTICAL oracle to dedup_ngram_jaccard: prefix filtering is lossless,
    # so the result set must match the unfiltered inverted-index plan exactly.
    oracle=f"""
        WITH u AS ({_MUTATED_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id_a, id_b, inter,
               CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
        FROM pair_inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
    description=(
        "PPJoin-style prefix-filtered Jaccard join: shingles globally ordered "
        "rarest-first, only each document's first |d|-floor(t|d|)+1 shingles "
        "indexed — hot shingles sort to the END of every document and fall out of "
        "the posting lists entirely, so the m^2 pair expansion collapses exactly "
        "where it hurts. Candidates verified with the exact intersection, making "
        "the filter lossless: the oracle is dedup_ngram_jaccard's, unchanged. The "
        "lossless counterpart of that operator's LOSSY df-cap lever"
    ),
    tags=("dedup", "north-star", "scale"),
)
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        ngram_jaccard_pairs_prefix,
    )

    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    return ngram_jaccard_pairs_prefix(u, text_col="text", id_col="id", n=3, threshold=0.5)


@register(
    "dedup_ngram_jaccard_auto",
    # IDENTICAL oracle again: whichever plan the router picks, the result
    # set is the same (prefix filtering is lossless at equal threshold), so
    # the value hash proves route-independence end to end.
    oracle=f"""
        WITH u AS ({_MUTATED_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id_a, id_b, inter,
               CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
        FROM pair_inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
    description=(
        "statistics-routed Jaccard join (the auto form of the plain/prefix "
        "pair): a planner pre-pass samples ~4k docs deterministically, "
        "measures shingle document-frequency concentration, and routes to "
        "the PPJoin prefix plan when the hottest shingle covers >= 2% of "
        "sampled docs (the measured crossover — boilerplate-heavy corpora) "
        "or the cheaper plain inverted-index plan otherwise (uniform "
        "corpora, where the filter's ~2 extra shuffles buy nothing). "
        "Misrouting can only cost time, never pairs"
    ),
    tags=("dedup", "north-star", "scale"),
)
def dedup_ngram_jaccard_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        ngram_jaccard_pairs_auto,
    )

    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    return ngram_jaccard_pairs_auto(u, text_col="text", id_col="id", n=3, threshold=0.5)


# ---------------------------------------------------------------------------
# quality-aware survivor selection (argmax per near-dup cluster)
# ---------------------------------------------------------------------------


def _survivor_oracle() -> str:
    from data_integration_and_processing_spark.queries.text_queries import (  # noqa: PLC0415
        _EN_STOPS,
    )

    return f"""
        WITH u AS ({_MUTATED_SQL}),
        sh AS (
            SELECT id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> concat_ws(' ', string_split(text, ' ')[i],
                                           string_split(text, ' ')[i+1],
                                           string_split(text, ' ')[i+2])))) AS s
            FROM u WHERE len(string_split(text, ' ')) >= 3
        ),
        sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        pair_inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        ),
        pairs AS (
            SELECT id_a, id_b FROM pair_inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
        ),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        reach AS (
            WITH RECURSIVE r(a, b) AS (
                SELECT id, id FROM u
                UNION
                SELECT r.a, sym.b FROM r JOIN sym ON r.b = sym.a
            )
            SELECT * FROM r
        ),
        lab AS (SELECT a AS id, min(b) AS component FROM reach GROUP BY a),
        q AS (
            SELECT id, round(
               least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
               + least(CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_EN_STOPS}))) AS DOUBLE)
                       / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3
               + (1.0 - least(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                              / length(text) * 10.0, 1.0)) * 0.2
               + (CASE WHEN CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                            / len(string_split(text, ' ')) >= 3.0
                        AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                            / len(string_split(text, ' ')) <= 10.0
                       THEN 1.0 ELSE 0.5 END) * 0.1, 9) AS quality
            FROM u
        ),
        ranked AS (
            SELECT lab.id, lab.component, q.quality,
                   row_number() OVER (PARTITION BY lab.component
                                      ORDER BY q.quality DESC, lab.id ASC) AS rn
            FROM lab JOIN q ON q.id = lab.id
        )
        SELECT component AS cluster_rep,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(min(CASE WHEN rn = 1 THEN id END) AS BIGINT) AS survivor_id,
               round(min(CASE WHEN rn = 1 THEN quality END), 6) AS survivor_quality
        FROM ranked
        GROUP BY component
        HAVING count(*) > 1
        ORDER BY component
    """


@register(
    "dedup_quality_survivors",
    oracle=_survivor_oracle(),
    description=(
        "quality-aware survivor selection: near-dup pairs -> connected-component "
        "clusters -> per cluster keep the HIGHEST-QUALITY member (window argmax, "
        "quality rounded to 9 decimals so both engines rank identically, id "
        "tiebreak) instead of dedup_pipeline_end2end's min-id rule — at corpus "
        "scale the survivor choice decides what the model trains on, and min-id "
        "keeps whichever copy crawled first, not the cleanest one"
    ),
    tags=("dedup", "north-star", "graph", "pipeline"),
)
def dedup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window  # noqa: PLC0415

    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        connected_components,
        ngram_jaccard_pairs,
    )
    from data_integration_and_processing_spark.operators.text_analysis import (  # noqa: PLC0415
        quality_score,
    )

    d = load_table(spark, sf_dir, "documents")
    u = _with_mutated_copies(d)
    handle: list = []
    pairs = ngram_jaccard_pairs(
        u, text_col="text", id_col="id", n=3, threshold=0.5, cache_handle=handle
    ).select("id_a", "id_b")
    lab = connected_components(pairs)
    labeled = (
        u.join(lab, u.id == lab.id, "left")
        .select(u.id.alias("did"), F.coalesce("component", u.id).alias("component"))
    )
    q = u.select(F.col("id").alias("qid"), F.round(quality_score(F.col("text")), 9).alias("quality"))
    ranked = labeled.join(q, F.col("did") == F.col("qid")).select("did", "component", "quality")
    w = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("did"))
    out = (
        ranked.withColumn("rn", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("did"))).cast("bigint").alias("survivor_id"),
            F.round(F.min(F.when(F.col("rn") == 1, F.col("quality"))), 6).alias(
                "survivor_quality"
            ),
        )
        .filter(F.col("n_members") > 1)
        .select(
            F.col("component").alias("cluster_rep"),
            "n_members",
            "survivor_id",
            "survivor_quality",
        )
        .orderBy("cluster_rep")
    )
    for cached in handle:
        cached.unpersist()
    return out


# ---------------------------------------------------------------------------
# dedup method comparison (what each normalization actually catches)
# ---------------------------------------------------------------------------

_CMP_CORPUS_SQL = """
    SELECT doc_id AS id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 30000,
           array_to_string(string_split(text, ' ')[1:greatest(1, len(string_split(text, ' ')) - 8)], ' ')
    FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 60000,
           array_to_string(string_split(text, ' ')[1:greatest(3,
               CAST(floor(len(string_split(text, ' ')) * 0.4) AS INT))], ' ')
    FROM documents WHERE doc_id % 11 = 0
"""

_CMP_ORACLE = f"""
WITH u AS ({_CMP_CORPUS_SQL}),
sh AS (
    SELECT id, unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                                   string_split(text, ' ')[i+1],
                                   string_split(text, ' ')[i+2])))) AS s
    FROM u WHERE len(string_split(text, ' ')) >= 3
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
pair_inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
    GROUP BY a.id, b.id
),
metrics AS (
    SELECT id_a, id_b, inter,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jac,
           CAST(inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS cont
    FROM pair_inter
    JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
),
exact_pairs AS (
    SELECT a.id AS id_a, b.id AS id_b FROM u a JOIN u b ON a.text = b.text AND a.id < b.id
)
SELECT 'exact' AS method,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT id_a) + count(DISTINCT id_b) AS BIGINT) AS docs_touched
FROM exact_pairs
UNION ALL
SELECT 'jaccard_0.5', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT id_a) + count(DISTINCT id_b) AS BIGINT)
FROM metrics WHERE jac >= 0.5
UNION ALL
SELECT 'containment_0.9', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT id_a) + count(DISTINCT id_b) AS BIGINT)
FROM metrics WHERE cont >= 0.9
ORDER BY method
"""


@register(
    "dedup_method_comparison",
    oracle=_CMP_ORACLE,
    description=(
        "what each dedup normalization actually catches, on one corpus seeded "
        "with exact copies, 8-word truncations, and 40% prefixes: exact equality "
        "finds only the byte copies, jaccard>=0.5 adds the truncations, "
        "containment>=0.9 adds the prefix inclusions jaccard misses — the "
        "method-selection evidence a curation pipeline wants BEFORE choosing its "
        "thresholds. One shingle pass feeds both similarity metrics; the exact "
        "branch is a self-join on the raw text"
    ),
    tags=("dedup", "north-star", "audit"),
)
def dedup_method_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import shingle_keys  # noqa: PLC0415
    from data_integration_and_processing_spark.operators.parallelism import fan_out_scan  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    trunc = F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 8, F.lit(1))), " ")
    k40 = F.greatest(F.lit(3), F.floor(F.size(words) * 0.4).cast("int"))
    prefix = F.array_join(F.slice(words, F.lit(1), k40), " ")
    u = (
        d.select(F.col("doc_id").alias("id"), "text")
        .unionByName(d.filter(F.col("doc_id") % 5 == 0).select((F.col("doc_id") + 10000).alias("id"), "text"))
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select((F.col("doc_id") + 30000).alias("id"), trunc.alias("text"))
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0).select((F.col("doc_id") + 60000).alias("id"), prefix.alias("text"))
        )
    )
    sh = (
        fan_out_scan(u)
        .select("id", shingle_keys(F.col("text"), 3).alias("sh"))
        .filter(F.size("sh") > 0)
        .persist()
    )
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("s"))
    postings = inv.groupBy("s").agg(F.array_sort(F.collect_list("id")).alias("ids")).filter(F.size("ids") > 1)
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    pair_inter = (
        postings.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    metrics = (
        pair_inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias("jac"),
            (F.col("inter").cast("double") / F.least("n_a", "n_b")).alias("cont"),
        )
        .persist()
    )
    ua = u.select(F.col("id").alias("id_a"), F.col("text").alias("t_a"))
    ub = u.select(F.col("id").alias("id_b"), F.col("text").alias("t_b"))
    exact_pairs = ua.join(ub, (F.col("t_a") == F.col("t_b")) & (F.col("id_a") < F.col("id_b")))

    def summarize(df: DataFrame, method: str) -> DataFrame:
        return df.agg(
            F.lit(method).alias("method"),
            F.count("*").cast("bigint").alias("n_pairs"),
            (F.count_distinct("id_a") + F.count_distinct("id_b")).cast("bigint").alias("docs_touched"),
        )

    out = (
        summarize(metrics.filter(F.col("cont") >= 0.9), "containment_0.9")
        .unionByName(summarize(exact_pairs, "exact"))
        .unionByName(summarize(metrics.filter(F.col("jac") >= 0.5), "jaccard_0.5"))
        .orderBy("method")
    )
    # Materialize the 3-row summary, then release both cached inputs — the
    # sibling operators thread a cache_handle for the same reason; leaving
    # these persisted leaks executor storage for the rest of the session.
    rows = out.collect()
    sh.unpersist()
    metrics.unpersist()
    return tiny_local_df(spark, rows, out.schema)


@register(
    "dedup_minhash_calibration",
    # Audit form (VERDICT r7 item 4 pattern): the multiply-shift signature
    # family is engine-specific, but the PLANTED twin pairs (doc_id,
    # doc_id+100000 with the last 3 words cut) have an exact per-row
    # 3-gram-shingle Jaccard both engines compute identically — that exact
    # average is the hash-checked column. Booleans gate the real estimator:
    # every >=30-pair exact-Jaccard band keeps avg |est - exact| <= 0.1
    # (binomial se of 32 hashes is <= 0.088; measured <= 0.046) and LSH
    # banding at threshold 0 finds >= 90% of the planted twins (measured
    # 99.0%). Band table: dedup_minhash_calibration_raw; the error bound is
    # also pinned in tests/test_dedup_levers.py.
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        pairs AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(ws) - 2),
                       i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sa,
                   list_distinct(list_transform(
                       generate_series(1, len(ws) - 5),
                       i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sb
            FROM w WHERE len(ws) >= 6
        )
        SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_eligible_twins,
               CAST(sum((len(list_intersect(sa, sb)) * 1000000)
                        // len(list_distinct(list_concat(sa, sb)))) // count(*)
                    AS BIGINT) AS avg_planted_exact_j_micro,
               true AS calibration_ok,
               true AS planted_recall_ok
        FROM pairs
    """,
    description=(
        "MinHash estimator calibration audit: for every LSH-verified candidate "
        "pair, the signature-agreement estimate of Jaccard (mean of 32 "
        "component matches) vs the exact shingle-set Jaccard, bucketed by "
        "exact-Jaccard decile — the observability readout that tells a "
        "pipeline whether its b/r banding knee sits where the math says "
        "(est ~ Binomial(32, J)/32, se <= 0.09). Signatures are computed once "
        "and reused for banding AND calibration; the audit adds two "
        "broadcast-sized joins over the candidate pairs only. Driver-checked "
        "in audit form: exact planted-twin Jaccard average + band-error and "
        "planted-recall booleans (band table: dedup_minhash_calibration_raw)"
    ),
    tags=("dedup", "north-star", "profiling", "audit"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split("text", " ")
    gram3 = lambda arr, lim: F.array_distinct(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), lim),
            lambda i: F.concat_ws(
                " ",
                F.element_at(arr, i),
                F.element_at(arr, i + 1),
                F.element_at(arr, i + 2),
            ),
        )
    )
    eligible = d0.filter(F.size(ws) >= 6).select(
        gram3(ws, F.size(ws) - 2).alias("sa"),
        gram3(ws, F.size(ws) - 5).alias("sb"),
    )
    # exact integer-micro mean of per-row truncating micro-Jaccards (r14
    # no-bar tie sweep): both the per-row quotient and the mean are
    # BIGINT-exact on both engines
    planted_stats = eligible.agg(
        F.count("*").cast("long").alias("n_eligible_twins"),
        F.expr(
            "(sum((size(array_intersect(sa, sb)) * CAST(1000000 AS BIGINT))"
            " div size(array_union(sa, sb)))) div count(*)"
        ).alias("avg_planted_exact_j_micro"),
    )
    n_docs = d0.agg(F.count("*").cast("long").alias("n_docs"))
    bands = dedup_minhash_calibration_raw(spark, sf_dir)
    calib = bands.agg(
        F.min(
            F.when(F.col("n_pairs") >= 30, F.col("avg_abs_err") <= 0.1).otherwise(
                F.lit(True)
            )
        ).alias("calibration_ok")
    )
    # planted recall: LSH banding at threshold 0 must surface >= 90% of the
    # (id, id+100000) twin pairs it was seeded with
    recall_ok = _calibration_planted_recall_ok(spark, sf_dir)
    return (
        n_docs.crossJoin(planted_stats).crossJoin(calib)  # 1-row frames
        .select(
            "n_docs",
            "n_eligible_twins",
            "avg_planted_exact_j_micro",
            "calibration_ok",
            F.lit(recall_ok).alias("planted_recall_ok"),
        )
    )


def _calibration_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + planted truncated twins (last 3 words cut, id+100000)."""
    from data_integration_and_processing_spark.operators.parallelism import (  # noqa: PLC0415
        fan_out_scan,
    )

    d = fan_out_scan(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    words = F.split("text", " ")
    twins = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1)))
        ).alias("text"),
    )
    return d.unionByName(twins)


def _calibration_planted_recall_ok(spark: SparkSession, sf_dir: str) -> bool:
    """Whether LSH banding at threshold 0 surfaced >= 90% of the planted
    twin pairs (two scalar counts cross the driver, nothing else)."""
    corpus = _calibration_corpus(spark, sf_dir)
    caches: list = []
    pairs = minhash_lsh_pairs(
        corpus, text_col="text", id_col="doc_id", cache_handle=caches, jaccard_threshold=0.0
    )
    found = pairs.filter(F.col("id_b") - F.col("id_a") == 100000).count()
    total = load_table(spark, sf_dir, "documents").count()
    for c in caches:
        c.unpersist()
    return found >= 0.9 * total


def dedup_minhash_calibration_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415
        minhash_signature_vectorized,
        shingle_keys,
    )
    from data_integration_and_processing_spark.operators.parallelism import (  # noqa: PLC0415
        fan_out_scan,
    )

    d = fan_out_scan(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    words = F.split("text", " ")
    twins = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1)))
        ).alias("text"),
    )
    corpus = d.unionByName(twins)

    caches: list = []
    pairs = minhash_lsh_pairs(
        corpus, text_col="text", id_col="doc_id", cache_handle=caches, jaccard_threshold=0.0
    )
    # minhash_lsh_pairs derives signatures from shingle_keys (3-gram hashes);
    # the calibration estimates over the SAME sets the exact Jaccard uses
    sig_udf = minhash_signature_vectorized(32)
    sigs = corpus.select(
        F.col("doc_id"), sig_udf(shingle_keys(F.col("text"), 3)).alias("sig")
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(32.0)
    per_pair = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(F.col("jaccard").alias("exact_j"), est.alias("est_j"))
    )
    band = F.least(F.floor(F.col("exact_j") * 10).cast("int"), F.lit(9))
    out = (
        per_pair.groupBy(band.alias("jaccard_band"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("exact_j"), 6).alias("avg_exact"),
            F.round(F.avg("est_j"), 6).alias("avg_est"),
            F.round(F.avg(F.abs(F.col("est_j") - F.col("exact_j"))), 6).alias("avg_abs_err"),
        )
        .orderBy("jaccard_band")
    )
    rows = out.collect()
    for c in caches:
        c.unpersist()
    return tiny_local_df(spark, rows, out.schema)


@register(
    "dedup_exact_best_quality",
    oracle="""
        WITH u AS (SELECT doc_id AS id, text FROM documents
                   UNION ALL
                   SELECT doc_id + 10000 AS id, text FROM documents),
        scored AS (
            SELECT id, md5(text) AS fp,
                   least(len(string_split(text, ' ')) / 100.0, 1.0) * 1000000
                       + (99999 - id % 100000) AS pref
            FROM u
        )
        SELECT fp,
               CAST(max_by(id, pref) AS BIGINT) AS survivor_id,
               count(*) AS n_copies
        FROM scored GROUP BY fp
        ORDER BY fp
    """,
    description=(
        "survivorship POLICY dedup: within each exact-duplicate group keep "
        "the highest-QUALITY copy (length-score, id tiebreak) instead of "
        "min-id — the curation decision real pipelines make when duplicates "
        "differ in provenance. One max_by aggregate keyed by digest; the "
        "preference is a single sortable scalar so the policy swaps without "
        "replanning"
    ),
    tags=("dedup", "north-star", "curation"),
)
def dedup_exact_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _with_exact_copies(d)
    quality = F.least(F.size(F.split("text", " ")) / 100.0, F.lit(1.0))
    pref = quality * 1000000 + (99999 - F.col("id") % 100000)
    scored = u.select("id", F.md5(F.col("text").cast("binary")).alias("fp"), pref.alias("pref"))
    return (
        scored.groupBy("fp")
        .agg(
            F.max_by("id", "pref").cast("bigint").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("fp")
    )
