"""Multimodal column plumbing (north-star surface).

Treats image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, exactly how a 100 TB multimodal corpus is laid out in
parquet: the bytes travel with the row, metadata is queryable without
decoding, and decode/feature-extract runs as Arrow-batched ``mapInPandas``
so each Python worker touches whole columnar batches.

The actual media decode is STUBBED: the container has no image/audio
libraries, so ``decode_payload`` raises ``NotImplementedError`` and the
pipeline's default feature extractor is a clearly-marked deterministic fake
(byte-statistics). The Spark-side plumbing — schema, batching, partition
behavior, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parallelism import fan_out_scan

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("head_entropy_proxy", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Shape a table into the multimodal layout: opaque payload bytes +
    queryable metadata struct. (Fixture payloads are utf-8 text bytes; real
    corpora put jpeg/wav/mp4 bytes here — the layout is identical.)"""
    payload = F.col(text_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime_type"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ),
    )


def decode_payload(payload: bytes, mime_type: str) -> object:
    """Real media decode, env-gated: image/* dispatches to pillow when the
    deployment installs it (this container does not ship codec libs); audio/
    video remain deployment hooks. Everything around this call is
    production-shaped — tests/test_multimodal_phash.py pins the gate, and
    exercises the pillow branch wherever PIL exists."""
    if mime_type.startswith("image/"):
        try:
            import io  # noqa: PLC0415
            from PIL import Image  # noqa: PLC0415
        except ImportError as e:
            raise NotImplementedError(
                f"no decoder available for {mime_type}; install pillow at deployment"
            ) from e
        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(f"no decoder available for {mime_type}; install codec libs at deployment")


def _fake_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic byte-statistics stand-in for the stubbed decoder."""
    n = len(payload)
    checksum = sum(payload) % 1_000_000_007
    distinct_ratio = len(set(payload)) / 256.0
    return n, checksum, distinct_ratio


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams columnar batches into Python — the scalable
    shape for per-item media work (no per-row pickling; batch size bounded
    by ``spark.sql.execution.arrow.maxRecordsPerBatch``). The decode step is
    the stub above; swap ``_fake_features`` for real codec calls on a
    cluster with media libs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_features(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "head_entropy_proxy": [f[2] for f in feats],
                    "decoder": "stub:byte-stats",
                }
            )

    return fan_out_scan(df.select(id_col, payload_col)).mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_w", T.IntegerType()),
        T.StructField("orig_h", T.IntegerType()),
        T.StructField("new_w", T.IntegerType()),
        T.StructField("new_h", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)

_RESIZE_TARGET = 224


def resize_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Image-resize plumbing over binary payloads (decoder stubbed).

    The real pipeline decodes the payload, resizes the tensor to a max
    dimension of 224 preserving aspect ratio, and re-encodes. Here the
    decode is the stub, so dimensions come from a deterministic fake header
    (derived from payload length) — the batching, signature, and integer
    resize arithmetic are the production shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[payload_col].map(len)
            w = (32 + n % 480).astype("int64")
            h = (32 + (n * 7) % 480).astype("int64")
            # integer resize: scale the longer side to 224 (never upscale)
            long_side = w.combine(h, max)
            new_w = w.where(long_side <= _RESIZE_TARGET, (w * _RESIZE_TARGET) // long_side)
            new_h = h.where(long_side <= _RESIZE_TARGET, (h * _RESIZE_TARGET) // long_side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "orig_w": w,
                    "orig_h": h,
                    "new_w": new_w,
                    "new_h": new_h,
                    "decoder": "stub:fake-header",
                }
            )

    return fan_out_scan(df.select(id_col, payload_col)).mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing: 1-to-N row fan-out inside mapInPandas.

    The stubbed 'container format' is fixed-size byte chunks (``frame_size``
    bytes per frame); every ``stride``-th frame is decoded (here: hashed).
    The real version swaps the chunker for a demuxer — the fan-out shape,
    Arrow batching, and per-frame output schema are what carries to 100 TB
    (each task expands its own rows; no shuffle, no driver involvement)."""
    import hashlib  # noqa: PLC0415

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    chunk = payload[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes, "frame_md5": md5s}
            )

    return fan_out_scan(df.select(id_col, payload_col)).mapInPandas(batches, FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sig", T.LongType()),
    ]
)

_PHASH_BITS = 63  # keep the signature non-negative in a signed long
_PHASH_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 odd constant


def perceptual_hash_signatures(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """63-bit perceptual signature over opaque payload bytes: every
    overlapping 4-byte window hashes to 64 bits (multiply-mix) and bit-votes
    — SimHash over the byte-window distribution, which is what a pHash
    reduces to when the decoder is stubbed (a real pHash bit-votes DCT
    coefficients of the decoded image; swap the window source, keep
    everything downstream). Payloads sharing most of their content agree on
    most votes, so near-identical media land within small Hamming distance.

    One numpy reduction per payload inside Arrow-batched ``mapInPandas`` —
    the same per-item-compute shape as feature extraction; no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(_PHASH_BITS, dtype=np.uint64)
        for pdf in it:
            sigs = np.empty(len(pdf), dtype=np.int64)
            for i, payload in enumerate(pdf[payload_col]):
                b = np.frombuffer(payload, dtype=np.uint8)
                if len(b) < 4:
                    sigs[i] = 0
                    continue
                w = (
                    b[:-3].astype(np.uint64)
                    | (b[1:-2].astype(np.uint64) << np.uint64(8))
                    | (b[2:-1].astype(np.uint64) << np.uint64(16))
                    | (b[3:].astype(np.uint64) << np.uint64(24))
                )
                h = w * _PHASH_MIX
                votes = (
                    ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
                ).sum(axis=0)
                sigs[i] = int(
                    ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64).astype(np.int64)
                )
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "sig": sigs})

    return fan_out_scan(df.select(id_col, payload_col)).mapInPandas(batches, PHASH_SCHEMA)


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate payload pairs by perceptual-hash banding: signatures
    cut into 4 x 16-bit bands, ids sharing any band pair up in-task
    (``pairs_within_buckets`` — one shuffle keyed by band value), verified
    by popcount(xor) <= max_hamming. Identical media always pair (all
    bands equal); the banding guarantee covers Hamming <= 3 exactly, and
    recalls larger distances with high probability when differing bits
    cluster — the media-dedup trade documented here over an exact-cover
    multi-index."""
    from data_integration_and_processing_spark.operators.dedup import (  # noqa: PLC0415 — avoid import cycle
        pairs_within_buckets,
    )

    sig = perceptual_hash_signatures(df, id_col, payload_col)
    banded = sig.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), 16 * b).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "bucket"),
    )
    cand = pairs_within_buckets(banded, ["band", "bucket"], payload_cols=("sig",))
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# content-defined chunking (Gear CDC)
# ---------------------------------------------------------------------------

# Deterministic gear table: 256 pseudorandom 64-bit values, fixed seed so
# chunk boundaries are stable across sessions/machines.
_GEAR = np.random.default_rng(0x6EA5).integers(0, 2**63, size=256, dtype=np.int64).view(np.uint64)
_GEAR_WINDOW = 48  # bytes of context that influence a boundary decision


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """Windowed gear rolling hash at every byte position, vectorized.

    The classic sequential form ``h = (h << 1) + gear[b]`` keeps only the
    last 64 bytes' influence (older bytes shift out); the equivalent
    windowed closed form ``h_i = sum_{j<W} gear[b_{i-j}] << j`` is W shifted
    adds over the whole array — O(W*n) vectorized numpy instead of an O(n)
    Python byte loop that is ~100x slower per byte.
    """
    g = _GEAR[data]
    h = np.zeros(len(data), dtype=np.uint64)
    # j is bounded by the payload length: for j >= len(data) the shifted
    # contribution is empty, and the negative slice below would otherwise
    # mis-shape on payloads shorter than the window
    for j in range(min(_GEAR_WINDOW, 64, len(data))):
        shifted = g << np.uint64(j)
        h[j:] += shifted[: len(data) - j] if j else shifted
    return h


def cdc_boundaries(
    payload: bytes, min_len: int = 64, avg_len: int = 512, max_len: int = 2048
) -> list[int]:
    """Chunk boundary offsets (exclusive ends) for one payload.

    A boundary lands where the windowed gear hash has its low log2(avg_len)
    bits zero, subject to min/max chunk-length guards (the guards are the
    only sequential part — they scan the sparse candidate list, not bytes).
    Content-defined = boundaries move WITH the content: inserting bytes
    early shifts offsets but the hash re-synchronizes at the next content
    boundary, so all later chunks keep their identity — the property that
    makes chunk-level dedup of mutated media possible at all.
    """
    n = len(payload)
    if n == 0:
        return []
    mask = np.uint64(avg_len - 1)
    h = _gear_hashes(np.frombuffer(payload, dtype=np.uint8))
    candidates = np.nonzero((h & mask) == 0)[0]
    ends: list[int] = []
    start = 0
    ci = 0
    while start < n:
        limit = min(start + max_len, n)
        cut = limit
        while ci < len(candidates) and candidates[ci] + 1 <= limit:
            pos = int(candidates[ci]) + 1  # boundary AFTER the matching byte
            if pos >= start + min_len:
                cut = pos
                ci += 1
                break
            ci += 1
        ends.append(cut)
        start = cut
    return ends


def cdc_chunk_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    min_len: int = 64,
    avg_len: int = 512,
    max_len: int = 2048,
) -> DataFrame:
    """Explode binary payloads into content-defined chunks:
    (id, chunk_idx, offset, length, chunk_md5).

    Arrow-batched mapInPandas — the hashing is vectorized numpy per payload,
    no per-byte Python. Downstream chunk-level dedup is then ordinary
    exact dedup on chunk_md5 (hash-groupBy), which is the point: CDC turns
    'this 4 GB video differs by a 2-byte metadata edit' into '99.9% of its
    chunks are byte-identical and dedup away'.
    """
    import hashlib  # noqa: PLC0415

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset", T.IntegerType()),
            T.StructField("length", T.IntegerType()),
            T.StructField("chunk_md5", T.StringType()),
        ]
    )

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                data = bytes(payload)
                start = 0
                for idx, end in enumerate(cdc_boundaries(data, min_len, avg_len, max_len)):
                    rows.append(
                        (
                            int(rid),
                            idx,
                            start,
                            end - start,
                            hashlib.md5(data[start:end]).hexdigest(),
                        )
                    )
                    start = end
            yield pd.DataFrame(rows, columns=["id", "chunk_idx", "offset", "length", "chunk_md5"])

    src = fan_out_scan(df).select(
        F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload")
    )
    return src.mapInPandas(chunk_batches, schema=schema).withColumnRenamed("id", id_col)
