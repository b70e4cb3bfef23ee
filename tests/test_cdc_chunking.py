"""Content-defined chunking invariants: reassembly, determinism, and the
property CDC exists for — boundary re-synchronization after an edit."""

from __future__ import annotations

import hashlib

from data_integration_and_processing_spark.operators.multimodal import (
    cdc_boundaries,
    cdc_chunk_payloads,
)


def _payload(seed: int, n: int = 8192) -> bytes:
    import numpy as np

    return bytes(np.random.default_rng(seed).integers(0, 256, size=n, dtype=np.uint8))


def test_boundaries_partition_the_payload():
    data = _payload(1)
    ends = cdc_boundaries(data)
    assert ends[-1] == len(data)
    lengths = [e2 - e1 for e1, e2 in zip([0] + ends[:-1], ends)]
    assert all(64 <= ln <= 2048 or e == len(data) for ln, e in zip(lengths, ends)), lengths
    assert sum(lengths) == len(data)


def test_deterministic():
    data = _payload(2)
    assert cdc_boundaries(data) == cdc_boundaries(data)


def test_edit_resynchronizes_chunks():
    """Insert bytes near the front: chunk hashes after the edit re-align —
    the dedup property fixed-size chunking cannot provide."""
    data = _payload(3, n=16384)
    edited = b"INSERTED-PREFIX-BYTES" + data

    def chunk_hashes(d: bytes) -> list[str]:
        out, start = [], 0
        for end in cdc_boundaries(d):
            out.append(hashlib.md5(d[start:end]).hexdigest())
            start = end
        return out

    orig = chunk_hashes(data)
    new = chunk_hashes(edited)
    shared = set(orig) & set(new)
    # everything except the first chunk (which absorbed the edit) should
    # re-synchronize; allow a couple of casualties around the splice
    assert len(shared) >= len(orig) - 3, (len(shared), len(orig))
    # and fixed-size chunking at the same granularity shares ~nothing
    fixed_orig = {hashlib.md5(data[i : i + 512]).hexdigest() for i in range(0, len(data), 512)}
    fixed_new = {hashlib.md5(edited[i : i + 512]).hexdigest() for i in range(0, len(edited), 512)}
    assert len(fixed_orig & fixed_new) <= 1


def test_distributed_chunking_matches_local(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    from data_integration_and_processing_spark.operators.multimodal import attach_binary_payload

    m = attach_binary_payload(d)
    got = cdc_chunk_payloads(m).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    assert set(by_doc) == {i for i, t in texts.items() if len(t.encode()) > 0}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        data = texts[doc_id].encode()
        ends = cdc_boundaries(data)
        assert [r["length"] for r in rows] == [e2 - e1 for e1, e2 in zip([0] + ends[:-1], ends)]
        # reassembly: offsets tile the payload
        assert rows[0]["offset"] == 0 and rows[-1]["offset"] + rows[-1]["length"] == len(data)


def test_short_payloads_chunk_without_error():
    """Payloads shorter than the gear window (48 B) must not crash the
    vectorized hash — regression: negative slice shape mismatch at sf0.1."""
    for n in (0, 1, 2, 47, 48, 49):
        data = bytes(range(n % 256))[:n] if n else b""
        ends = cdc_boundaries(data)
        if n == 0:
            assert ends == []
        else:
            assert ends[-1] == n and sum(
                e2 - e1 for e1, e2 in zip([0] + ends[:-1], ends)
            ) == n


def test_planted_block_cuts_exactly_per_repeat():
    """The seed-71 planted block (multimodal_cdc_chunks audit form) must
    keep its defining property: cdc_boundaries(BLOCK*k) == [512, 1024, ...]
    for every repeat count the fixture uses (reps = 1 + doc_id % 7 <= 7,
    plus margin). If the gear table, window, or selection logic ever
    changes, this pins the planted-ledger arithmetic to the new reality."""
    from data_integration_and_processing_spark.queries.multimodal_queries import (
        _CDC_PLANT_BLOCK_LEN,
        _cdc_plant_block,
    )

    block = _cdc_plant_block().encode()
    assert len(block) == _CDC_PLANT_BLOCK_LEN == 512
    for k in (1, 2, 3, 5, 7, 8, 10):
        assert cdc_boundaries(block * k) == [512 * i for i in range(1, k + 1)], k
