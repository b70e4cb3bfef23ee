"""Multimodal-column queries over ``documents`` payloads (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_images,
    sample_frames,
)
from data_integration_and_processing_spark.queries.catalog import register
from data_integration_and_processing_spark.sources.tables import load_table


@register(
    "multimodal_binary_metadata",
    oracle="""
        SELECT doc_id,
               'application/octet-stream' AS mime_type,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_md5,
               hex(encode(substring(text, 1, 8))) AS head_hex
        FROM documents
    """,
    description="binary payload column + queryable metadata struct (no decode needed)",
    tags=("multimodal", "north-star"),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = attach_binary_payload(d)
    return m.select(
        "doc_id",
        F.col("media_meta.mime_type").alias("mime_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.hex(F.substring(F.col("text"), 1, 8).cast("binary")).alias("head_hex"),
    )


@register(
    "multimodal_feature_extract",
    # The stub extractor is deterministic byte arithmetic, so it has an
    # exact SQL twin: fixture payloads are pure ASCII (the frame-sample
    # oracle's checked premise), making per-char ascii() == per-byte value —
    # byte sum, distinct-byte ratio and length all reproduce in DuckDB.
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
                    % 1000000007 AS BIGINT) AS checksum,
               len(list_distinct(string_split(text, ''))) / 256.0 AS head_entropy_proxy,
               'stub:byte-stats' AS decoder
        FROM documents
        ORDER BY doc_id
    """,
    description="Arrow-batched mapInPandas feature extraction over binary payloads (decoder stubbed)",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = attach_binary_payload(d)
    return extract_features(m).orderBy("doc_id")


@register(
    "multimodal_resize",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   CAST(32 + octet_length(encode(text)) % 480 AS INTEGER) AS orig_w,
                   CAST(32 + (octet_length(encode(text)) * 7) % 480 AS INTEGER) AS orig_h
            FROM documents
        )
        SELECT doc_id, orig_w, orig_h,
               CAST(CASE WHEN greatest(orig_w, orig_h) <= 224 THEN orig_w
                         ELSE (orig_w * 224) // greatest(orig_w, orig_h) END AS INTEGER) AS new_w,
               CAST(CASE WHEN greatest(orig_w, orig_h) <= 224 THEN orig_h
                         ELSE (orig_h * 224) // greatest(orig_w, orig_h) END AS INTEGER) AS new_h,
               'stub:fake-header' AS decoder
        FROM dims
    """,
    description="image-resize plumbing (aspect-preserving to max 224) via mapInPandas; decoder stubbed",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return resize_images(attach_binary_payload(d))


@register(
    "multimodal_frame_sample",
    oracle="""
        -- fixture text is pure ASCII (checked), so char substring == byte
        -- substring and md5(varchar) == md5 of the payload bytes
        SELECT d.doc_id,
               CAST(fi AS INTEGER) AS frame_idx,
               CAST(length(substring(d.text, fi * 64 + 1, 64)) AS INTEGER) AS frame_bytes,
               md5(substring(d.text, fi * 64 + 1, 64)) AS frame_md5
        FROM documents d,
             LATERAL unnest(generate_series(0,
                 (length(d.text) + 63) // 64 - 1, 4)) AS t(fi)
    """,
    description="video frame-sampling plumbing: 1-to-N fan-out in mapInPandas (64-byte fake frames, stride 4)",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(d), frame_size=64, stride=4)


# Floors for the phash audit booleans, measured on the seeded fixtures:
# banded byte-window SimHash at Hamming<=6 catches 0.868-0.870 of the
# planted truncated twins and emits ~1.7 candidate pairs per original.
_PHASH_PLANTED_FLOOR = 0.7
_PHASH_CAND_CAP_PER_DOC = 6


@register(
    "multimodal_phash_neardup",
    # Audit form (same pattern as dedup_simhash): the byte-window bit-vote
    # signature has no DuckDB analogue, but the planted ground truth does —
    # every payload gets a truncated twin at id+100000 — so the
    # driver-checked output is the planted ledger plus recall-floor and
    # candidates-per-document-cap booleans. Identity / near-dup / far-pair
    # invariants stay in tests/test_multimodal_phash.py.
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_planted,
               true AS planted_recall_ok,
               true AS candidate_bound_ok
        FROM documents
    """,
    description=(
        "media near-dup detection: 63-bit perceptual signature (byte-window "
        "SimHash; swaps to DCT bit-votes when a real decoder is present) over "
        "payloads of documents unioned with truncated copies, banded 4x16-bit, "
        "in-task pair expansion, popcount verify <= 6 — the multimodal->dedup "
        "composition a media pipeline runs before training. Driver-checked in "
        "audit form: planted-twin recall floor (measured 87%) + candidate cap "
        "booleans (raw pairs: operators/multimodal.py::phash_neardup_pairs)"
    ),
    tags=("multimodal", "north-star", "dedup", "pandas-udf"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    # near-dup twins: drop the last 2 words -> most byte windows unchanged
    twins = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1)))
        ).alias("text"),
    )
    corpus = attach_binary_payload(d.unionByName(twins))
    pairs = phash_neardup_pairs(corpus, max_hamming=6)
    planted = d.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 100000).alias("id_b")
    )
    # candidate pairs are emitted id_a < id_b, and planted ids are original
    # < twin by construction, so a plain two-key semi-join finds the hits
    caught = planted.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    return (
        planted.agg(F.count("*").alias("n_planted"))
        .crossJoin(F.broadcast(caught.agg(F.count("*").alias("_hit"))))
        .crossJoin(F.broadcast(pairs.agg(F.count("*").alias("_cands"))))
        .select(
            "n_planted",
            (F.col("_hit") >= F.lit(_PHASH_PLANTED_FLOOR) * F.col("n_planted")).alias(
                "planted_recall_ok"
            ),
            (F.col("_cands") <= F.lit(_PHASH_CAND_CAP_PER_DOC) * F.col("n_planted")).alias(
                "candidate_bound_ok"
            ),
        )
    )


# Planted CDC block (VERDICT r9 item 4): 512 ASCII chars derived from a
# fixed seed, searched (seed 71 was the 72nd candidate) so that the gear
# hash of BLOCK*k masks to zero at EXACTLY the block ends — verified for
# k in {1,2,3,5,8,10} against cdc_boundaries at authoring time and pinned
# by tests/test_cdc_chunking.py. With one cut per block, chunk counts and
# offsets of planted payloads are pure arithmetic: doc with r repeats has
# r chunks of 512 bytes at offsets 0, 512, ... — SQL-computable.
_CDC_PLANT_SEED = 71
_CDC_PLANT_BLOCK_LEN = 512


def _cdc_plant_block() -> str:
    import random  # noqa: PLC0415
    import string  # noqa: PLC0415

    r = random.Random(_CDC_PLANT_SEED)
    alphabet = string.ascii_letters + string.digits
    return "".join(r.choice(alphabet) for _ in range(_CDC_PLANT_BLOCK_LEN))


@register(
    "multimodal_cdc_chunks",
    # Audit form (VERDICT r9 item 4, the last rows-only entry): gear-hash
    # boundaries have no DuckDB twin, so the driver-checked output is the
    # exact SQL-computable planted-ledger arithmetic (docs with doc_id <
    # 200 get a payload of 1 + doc_id % 7 repeats of the planted block,
    # so chunk counts/bytes are closed-form) plus measured-deterministic
    # booleans: every planted chunk lands at offset idx*512 with length
    # 512 (the boundary-match check), and over the REAL text-payload
    # corpus the chunks reassemble every byte contiguously under the
    # max_len bound. Raw chunk rows: multimodal_cdc_chunks_raw (benched).
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_planted,
               CAST(sum(1 + doc_id % 7) AS BIGINT) AS n_chunks_planted,
               CAST(512 * sum(1 + doc_id % 7) AS BIGINT) AS planted_bytes,
               true AS boundaries_exact_ok,
               true AS corpus_cover_ok
        FROM documents WHERE doc_id < 200
    """,
    description=(
        "content-defined chunking (Gear CDC) of binary payloads: boundaries land "
        "where a windowed rolling hash masks to zero, so an edit early in a file "
        "shifts only its local chunk — every later chunk keeps its identity and "
        "dedups away as ordinary exact dedup on chunk_md5. Arrow-batched "
        "mapInPandas with vectorized numpy hashing, no per-byte Python. "
        "Driver-checked in audit form: planted payloads built from a seed-fixed "
        "512-byte block with exactly one gear cut per repeat make chunk "
        "count/offset/length pure SQL arithmetic, and the real corpus adds a "
        "bytes-reassemble-contiguously boolean. The media-payload analogue of "
        "text passage-level dedup (raw chunk rows: multimodal_cdc_chunks_raw)"
    ),
    tags=("multimodal", "north-star", "dedup", "pandas-udf", "chunking"),
)
def multimodal_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.multimodal import (  # noqa: PLC0415
        cdc_chunk_payloads,
    )

    d = load_table(spark, sf_dir, "documents")
    # planted ledger: reps = 1 + doc_id % 7 repeats of the fixed block
    planted = d.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.repeat(F.lit(_cdc_plant_block()), (F.lit(1) + F.col("doc_id") % 7).cast("int"))
        .cast("binary")
        .alias("payload"),
        (F.lit(1) + F.col("doc_id") % 7).cast("long").alias("reps"),
    )
    chunks_p = cdc_chunk_payloads(planted)
    # boundary match: per planted doc, chunk count == reps and every chunk
    # sits at offset idx*512 with length 512
    per_doc = (
        chunks_p.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                (
                    (F.col("offset") != F.col("chunk_idx") * _CDC_PLANT_BLOCK_LEN)
                    | (F.col("length") != _CDC_PLANT_BLOCK_LEN)
                ).cast("long")
            ).alias("bad_pos"),
        )
        .join(planted.select("doc_id", "reps"), "doc_id")
    )
    planted_audit = per_doc.agg(
        F.count("*").alias("n_planted"),
        F.sum("n_chunks").cast("long").alias("n_chunks_planted"),
        (F.sum("n_chunks") * _CDC_PLANT_BLOCK_LEN).cast("long").alias("planted_bytes"),
        (
            (F.sum("bad_pos") == 0) & (F.sum((F.col("n_chunks") != F.col("reps")).cast("long")) == 0)
        ).alias("boundaries_exact_ok"),
    )
    # real-corpus coverage: chunks reassemble every payload byte
    # contiguously (sorted (offset, length) runs seam to seam) under the
    # max_len bound
    m = attach_binary_payload(d)
    chunks_r = cdc_chunk_payloads(m)
    cover = (
        chunks_r.groupBy("doc_id")
        .agg(
            F.min("offset").alias("first_off"),
            F.max(F.col("offset") + F.col("length")).alias("cover_end"),
            F.sum("length").alias("sum_len"),
            F.max("length").alias("max_chunk"),
        )
        .join(m.select("doc_id", F.col("media_meta.n_bytes").alias("n_bytes")), "doc_id")
        .agg(
            (
                (F.sum((F.col("first_off") != 0).cast("long")) == 0)
                & (F.sum((F.col("cover_end") != F.col("n_bytes")).cast("long")) == 0)
                & (F.sum((F.col("sum_len") != F.col("n_bytes")).cast("long")) == 0)
                & (F.max("max_chunk") <= 2048)
            ).alias("corpus_cover_ok")
        )
    )
    return planted_audit.crossJoin(F.broadcast(cover))


def multimodal_cdc_chunks_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw CDC chunk rows over the real payload corpus (the pre-audit-form
    registered output; benched as a headline raw path)."""
    from data_integration_and_processing_spark.operators.multimodal import (  # noqa: PLC0415
        cdc_chunk_payloads,
    )

    d = load_table(spark, sf_dir, "documents")
    m = attach_binary_payload(d)
    return cdc_chunk_payloads(m).orderBy("doc_id", "chunk_idx")


@register(
    "multimodal_chunk_dedup",
    # Gear-hash chunk boundaries have no SQL twin, but the AUDIT's byte
    # arithmetic is deterministic (VERDICT r7 item 4): logical/copied bytes
    # are exact SQL sums over the constructed corpus, and the chunk-store
    # guarantees — chunks reassemble every logical byte; dedup reclaims at
    # least every byte-identical copy (a copy shares ALL its chunks) — ride
    # as booleans that the value hash flips on regression. Boundary-level
    # invariants (determinism, shift resilience) stay in
    # tests/test_cdc_chunking.py.
    oracle="""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents WHERE doc_id % 3 = 0
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS logical_bytes,
               CAST(sum(CASE WHEN doc_id >= 100000
                             THEN octet_length(encode(text)) ELSE 0 END) AS BIGINT)
                   AS copied_bytes,
               true AS chunks_cover_bytes,
               true AS dedup_recovers_copies
        FROM corpus
    """,
    description=(
        "chunk-level media dedup composition: payloads (plus byte-identical "
        "copies) -> Gear CDC chunks -> exact dedup on chunk_md5 -> per-corpus "
        "storage audit (logical vs deduped bytes). Driver-checked in audit "
        "form: exact corpus byte arithmetic plus the structural guarantees "
        "that chunks cover every logical byte and dedup reclaims at least the "
        "duplicated-copy bytes — the chunk-store dedup model "
        "(restic/borg/casync) on a DataFrame engine"
    ),
    tags=("multimodal", "north-star", "dedup", "pandas-udf"),
)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_integration_and_processing_spark.operators.multimodal import (  # noqa: PLC0415
        cdc_chunk_payloads,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    u = d.unionByName(copies)
    m = attach_binary_payload(u)
    chunks = cdc_chunk_payloads(m)
    audit = chunks.agg(
        F.sum("length").cast("bigint").alias("chunk_bytes"),
        F.count_distinct("chunk_md5").alias("n_unique_chunks"),
    )
    unique_bytes = (
        chunks.groupBy("chunk_md5").agg(F.first("length").alias("length")).agg(
            F.sum("length").cast("bigint").alias("deduped_bytes")
        )
    )
    exact = u.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).cast("bigint").alias("logical_bytes"),
        F.sum(
            F.when(F.col("doc_id") >= 100000, F.octet_length("text")).otherwise(0)
        ).cast("bigint").alias("copied_bytes"),
    )
    # three 1-row aggregates joined on nothing: broadcast-safe by construction
    return (
        audit.crossJoin(F.broadcast(unique_bytes))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_docs",
            "logical_bytes",
            "copied_bytes",
            (F.col("chunk_bytes") == F.col("logical_bytes")).alias("chunks_cover_bytes"),
            (F.col("deduped_bytes") <= F.col("logical_bytes") - F.col("copied_bytes")).alias(
                "dedup_recovers_copies"
            ),
        )
    )


@register(
    "multimodal_modality_routing",
    oracle="""
        WITH routed AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 6 THEN 'image/jpeg'
                        WHEN doc_id % 10 < 9 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime_type,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        )
        SELECT CASE WHEN mime_type LIKE 'image/%' THEN 'image'
                    WHEN mime_type LIKE 'audio/%' THEN 'audio'
                    ELSE 'video' END AS modality,
               count(*) AS n_items,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(min(n_bytes) AS BIGINT) AS min_bytes,
               CAST(max(n_bytes) AS BIGINT) AS max_bytes
        FROM routed
        GROUP BY 1 ORDER BY 1
    """,
    description=(
        "modality routing over a mixed-media table: payloads fan out to "
        "per-modality pipelines by mime prefix (the dispatch layer in front "
        "of decode/resize/frame-sample), with per-modality volume stats — "
        "the capacity-planning readout that sizes each modality's worker "
        "pool. Pure map + one aggregate; payload bytes never shuffle "
        "(the stats ride the metadata struct)"
    ),
    tags=("multimodal", "north-star", "aggregation"),
)
def multimodal_modality_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 10 < 6, F.lit("image/jpeg"))
        .when(F.col("doc_id") % 10 < 9, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    m = attach_binary_payload(d).withColumn(
        "media_meta",
        F.struct(
            mime.alias("mime_type"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.col("media_meta.content_md5").alias("content_md5"),
        ),
    )
    modality = F.split(F.col("media_meta.mime_type"), "/")[0]
    return (
        m.groupBy(modality.alias("modality"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum("media_meta.n_bytes").cast("bigint").alias("total_bytes"),
            F.min("media_meta.n_bytes").cast("bigint").alias("min_bytes"),
            F.max("media_meta.n_bytes").cast("bigint").alias("max_bytes"),
        )
        .orderBy("modality")
    )


@register(
    "multimodal_dedup_exact_bytes",
    oracle="""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            -- every 5th payload re-ingested byte-identical (the re-crawl /
            -- re-upload case), mirrored in the Spark plan
            SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
        )
        SELECT md5(text) AS content_md5,
               CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS keeper_doc_id,
               CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes,
               CAST((count(*) - 1) * min(octet_length(encode(text))) AS BIGINT)
                   AS bytes_saved
        FROM corpus
        GROUP BY md5(text)
        HAVING count(*) >= 2
        ORDER BY content_md5
    """,
    description=(
        "exact-bytes media dedup ledger (the content-addressed-store "
        "readout): group binary payloads by content digest, keep the min-id "
        "copy, report per-group copy count and bytes reclaimed. One "
        "map-side-combinable groupBy on the 16-byte digest — payload bytes "
        "never shuffle, the digest does; the dedup decision at 100 TB costs "
        "O(objects), not O(bytes)"
    ),
    tags=("multimodal", "dedup", "north-star"),
)
def multimodal_dedup_exact_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    m = attach_binary_payload(d.unionByName(dup))
    return (
        m.select(
            "doc_id",
            F.col("media_meta.content_md5").alias("content_md5"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
            ((F.count("*") - 1) * F.min("n_bytes")).cast("bigint").alias("bytes_saved"),
        )
        .filter(F.col("n_copies") >= 2)
        .select("content_md5", "n_copies", "keeper_doc_id", "n_bytes", "bytes_saved")
        .orderBy("content_md5")
    )
