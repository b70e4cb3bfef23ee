"""Invariants for chunk_documents that the SQL oracle can't see:
reconstruction (stride-prefixes concatenate back to the original),
overlap equality between consecutive chunks, and short-doc behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.text_analysis import chunk_documents

CT, OV = 16, 4
STRIDE = CT - OV


@pytest.fixture(scope="module")
def chunked(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in
         enumerate([1, 5, CT - 1, CT, CT + 1, STRIDE, STRIDE + 1, 3 * STRIDE, 100])],
        "doc_id LONG, text STRING",
    )
    rows = chunk_documents(docs, chunk_tokens=CT, overlap=OV).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)
    return by_doc


def test_docs_within_one_window_yield_exactly_one_chunk(chunked):
    # ...including STRIDE+1 tokens: a second start would be a pure suffix
    for n, doc in [(1, 0), (5, 1), (CT - 1, 2), (CT, 3), (STRIDE, 5), (STRIDE + 1, 6)]:
        chunks = chunked[doc]
        assert len(chunks) == 1
        assert chunks[0].chunk_len == n
        assert len(chunks[0].chunk_text.split(" ")) == n


def test_one_token_past_window_starts_a_second_chunk(chunked):
    assert len(chunked[4]) == 2           # CT + 1 tokens
    assert chunked[4][1].chunk_start == STRIDE
    assert chunked[4][1].chunk_len == CT + 1 - STRIDE


def test_consecutive_chunks_overlap_by_exactly_overlap_tokens(chunked):
    for chunks in chunked.values():
        for a, b in zip(chunks, chunks[1:]):
            if a.chunk_len == CT:  # full window: suffix(a) == prefix(b)
                assert a.chunk_text.split(" ")[STRIDE:] == b.chunk_text.split(" ")[:OV]


def test_stride_prefixes_reconstruct_the_document(chunked):
    for doc, chunks in chunked.items():
        rebuilt: list[str] = []
        for c in chunks:
            rebuilt.extend(c.chunk_text.split(" ")[:STRIDE] if c is not chunks[-1]
                           else c.chunk_text.split(" "))
        n = chunks[0].n_words
        assert len(rebuilt) == n
        assert all(w == f"w{doc}_{j}" for j, w in enumerate(rebuilt))


def test_rejects_overlap_not_smaller_than_window(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_chunking_reconstruction_property(spark):
    """Hypothesis over random (n_words, chunk_tokens, overlap): stride
    prefixes + the last chunk always reconstruct the document exactly, and
    chunk counts match the closed form."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cases = []

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=200),
        ct=st.integers(min_value=2, max_value=64),
        ov=st.integers(min_value=0, max_value=63),
    )
    def collect(n, ct, ov):
        if ov < ct:
            cases.append((n, ct, ov))

    collect()
    # one Spark job for all hypothesis-drawn cases: row i = case i
    rows = [(i, " ".join(f"t{j}" for j in range(n)), ct, ov) for i, (n, ct, ov) in enumerate(cases)]
    for i, text, ct, ov in rows:
        df = spark.createDataFrame([(i, text)], "doc_id LONG, text STRING")
        chunks = sorted(chunk_documents(df, ct, ov).collect(), key=lambda r: r.chunk_id)
        n = chunks[0].n_words
        stride = ct - ov
        expect_chunks = 1 + max(0, -(-(n - ct) // stride)) if n > ct else 1
        assert len(chunks) == expect_chunks, (n, ct, ov)
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:stride])
        rebuilt.extend(chunks[-1].chunk_text.split(" "))
        assert rebuilt == text.split(" "), (n, ct, ov)
