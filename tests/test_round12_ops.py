"""Unit tests for the round-12 operators: IVFPQ batch serving equivalence,
incremental index maintenance (append-only upsert, accounting,
self-retrieval), and the nDCG/MRR eval arithmetic the replica's DuckDB
parity only checks on the exact side."""

from __future__ import annotations

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.similarity import (
    build_ivfpq_index,
    ivfpq_probe,
    ivfpq_probe_batch,
    ivfpq_upsert,
)


@pytest.fixture(scope="module")
def upserted_index(spark, sf_dir):
    """Base index on 90% of the corpus + the %10==3 slice upserted —
    built fresh in a test-owned scratch dir (never the fingerprint cache,
    so assertions see a known-clean build)."""
    path = "/tmp/diaps_test_scratch/ivfpq_upsert_unit"
    shutil.rmtree(path, ignore_errors=True)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") != 0)
    base = e.filter(F.col("vec_id") % 10 != 3)
    batch = e.filter(F.col("vec_id") % 10 == 3)
    build_ivfpq_index(base, path, n_cells=8, m=8, nbits=4)
    base_files = {
        f: os.path.getsize(os.path.join(root, f))
        for root, _, fs in os.walk(f"{path}/data")
        for f in fs
        if f.endswith(".parquet")
    }
    ivfpq_upsert(batch, path)
    return {"path": path, "e": e, "base": base, "batch": batch, "base_files": base_files}


def test_ivfpq_probe_batch_equals_single_probes(spark, upserted_index):
    """The distributed batch plan must return EXACTLY the per-query probe
    results (same routing, same ADC, same tiebreaks) — the whole point of
    the rewrite is plan cost, not semantics."""
    e = upserted_index["e"]
    path = upserted_index["path"]
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id").isin([1, 101, 201])).collect()
    ]
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
        for r in ivfpq_probe_batch(spark, path, qs, k=10, nprobe=4, refine=16).collect()
    }
    for qid, vec in qs:
        single = ivfpq_probe(spark, path, vec, k=10, nprobe=4, refine=16).collect()
        for rank, row in enumerate(single, start=1):
            assert got[(qid, rank)] == (row["vec_id"], row["cos_sim"])


def test_ivfpq_upsert_accounting(spark, upserted_index):
    """Every base row + every appended row is servable, exactly once."""
    idx_n = spark.read.parquet(f"{upserted_index['path']}/data").count()
    assert idx_n == upserted_index["e"].count()
    # per-cell totals must also reconcile (the append landed in real cells)
    cells = (
        spark.read.parquet(f"{upserted_index['path']}/data")
        .groupBy("_cell")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in cells) == idx_n
    assert all(0 <= r["_cell"] < 8 for r in cells)


def test_ivfpq_upsert_never_rewrites_base_files(upserted_index):
    """Append-only contract: the base build's data files survive the upsert
    byte-for-byte (same names, same sizes) — at 100 TB this is the entire
    point of incremental maintenance."""
    after = {
        f: os.path.getsize(os.path.join(root, f))
        for root, _, fs in os.walk(f"{upserted_index['path']}/data")
        for f in fs
        if f.endswith(".parquet")
    }
    for name, size in upserted_index["base_files"].items():
        assert after.get(name) == size
    assert len(after) > len(upserted_index["base_files"])


def test_ivfpq_upserted_vectors_find_themselves(spark, upserted_index):
    """Self-retrieval through the post-upsert index: an appended vector's
    cell assignment IS its nearest center, so nprobe=1 routes to it and the
    exact refine ranks it first."""
    rows = upserted_index["batch"].orderBy("vec_id").limit(3).collect()
    for r in rows:
        top = ivfpq_probe(
            spark,
            upserted_index["path"],
            [float(x) for x in r["embedding"]],
            k=1,
            nprobe=1,
            refine=16,
        ).collect()
        assert top[0]["vec_id"] == r["vec_id"]
        assert top[0]["cos_sim"] == pytest.approx(1.0, abs=1e-6)


def test_ivfpq_upsert_rejects_dim_mismatch(spark, upserted_index):
    bad = spark.createDataFrame(
        [(999_999, [0.0] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim"):
        ivfpq_upsert(bad, upserted_index["path"])


def test_dcg_weights_are_9dp_log2_discounts():
    from data_integration_and_processing_spark.queries.similarity_queries import _DCG_W

    assert len(_DCG_W) == 10
    for i, w in enumerate(_DCG_W, start=1):
        assert w == pytest.approx(1.0 / math.log2(i + 1), abs=5e-10)
        assert w == float(f"{w:.9f}")  # frozen at the literal's precision


def _eval_frames(spark, exact_rows, ann_rows):
    exact = spark.createDataFrame(
        exact_rows, "query_id long, neighbor_id long, g double, rank int"
    )
    ann = spark.createDataFrame(ann_rows, "query_id long, neighbor_id long, rank int")
    return exact, ann


def test_ndcg_mrr_idcg_micro_is_the_hand_sum(spark):
    """idcg_micro must equal the hand-computed integer sum of per-rank
    terms round(g * w[rank] * 1e6) — the order-independent BIGINT contract
    the oracle hash rides on."""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _DCG_W,
        _ndcg_mrr_path,
    )

    exact, ann = _eval_frames(
        spark,
        [(1, 11, 0.9, 1), (1, 12, 0.8, 2), (1, 13, 0.7, 3)],
        [(1, 11, 1), (1, 12, 2), (1, 13, 3)],  # perfect retrieval
    )
    rows = _ndcg_mrr_path(exact, ann, "ivfpq").collect()
    assert len(rows) == 1
    want = sum(round(g * _DCG_W[r - 1] * 1e6) for g, r in ((0.9, 1), (0.8, 2), (0.7, 3)))
    assert rows[0]["idcg_micro"] == want
    assert rows[0]["ndcg_ok"] and rows[0]["mrr_ok"]  # nDCG = MRR = 1.0


def test_ndcg_mrr_verdicts_fail_on_disjoint_retrieval(spark):
    """An ANN list sharing nothing with the exact top-10 must report
    mean nDCG = MRR = 0 and flip both floor booleans false."""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _ndcg_mrr_path,
    )

    exact, ann = _eval_frames(
        spark,
        [(1, 11, 0.9, 1), (1, 12, 0.8, 2)],
        [(1, 98, 1), (1, 99, 2)],
    )
    rows = _ndcg_mrr_path(exact, ann, "ivfpq").collect()
    assert not rows[0]["ndcg_ok"] and not rows[0]["mrr_ok"]


def test_ndcg_mrr_partial_hit_scores_between(spark):
    """One hit at ANN rank 2 out of an exact pair: DCG = g(11)*w2, nDCG
    strictly between 0 and 1; MRR = 1/2."""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _DCG_W,
        _EVAL_FLOORS,
        _ndcg_mrr_path,
    )

    exact, ann = _eval_frames(
        spark,
        [(1, 11, 0.9, 1), (1, 12, 0.8, 2)],
        [(1, 98, 1), (1, 11, 2)],
    )
    ndcg = (0.9 * _DCG_W[1]) / (0.9 * _DCG_W[0] + 0.8 * _DCG_W[1])
    rows = _ndcg_mrr_path(exact, ann, "ivfpq").collect()
    nf, mf = _EVAL_FLOORS["ivfpq"]
    assert rows[0]["ndcg_ok"] == (ndcg >= nf)
    assert rows[0]["mrr_ok"] == (0.5 >= mf)


def test_registered_eval_floors_hold_on_fixture(spark, sf_dir):
    """The registered entry's measured mean nDCG/MRR floor booleans must be
    TRUE on the fixture at the test tier (the driver's hash covers this too
    — this pins it closer to the floor constants)."""
    from data_integration_and_processing_spark.queries.similarity_queries import (
        sim_retrieval_ndcg_mrr,
    )

    rows = sim_retrieval_ndcg_mrr(spark, sf_dir).collect()
    assert {r["path"] for r in rows} == {"ivfpq", "mips_ivf"}
    assert all(r["ndcg_ok"] and r["mrr_ok"] for r in rows)
    assert all(r["idcg_micro"] > 0 for r in rows)


def test_upserted_index_path_is_idempotent_and_crash_safe(spark, sf_dir, tmp_path, monkeypatch):
    """The registered audit's scratch builder must (a) no-op when the
    `upserted` marker exists and (b) recover a clean index — no doubled
    batch rows — when a crash landed the append but not the marker."""
    import data_integration_and_processing_spark.queries.similarity_queries as sq

    scratch = str(tmp_path / "upsert_scratch")
    monkeypatch.setattr(sq, "_fixture_index_path", lambda kind, d: scratch)
    path = sq._upserted_index_path(spark, sf_dir)
    n_corpus = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") != 0)
        .count()
    )
    assert spark.read.parquet(f"{path}/data").count() == n_corpus
    # (a) marker present: second call must not re-append
    assert sq._upserted_index_path(spark, sf_dir) == path
    assert spark.read.parquet(f"{path}/data").count() == n_corpus
    # (b) crash between append and marker: marker gone, appended rows still
    # on disk — recovery must REBUILD (overwrite wipes the data dir) and
    # re-append exactly once, never double
    shutil.rmtree(f"{path}/upserted")
    sq._upserted_index_path(spark, sf_dir)
    assert spark.read.parquet(f"{path}/data").count() == n_corpus


def test_fixture_index_path_reaps_stale_fingerprints(sf_dir):
    """A regenerated fixture mints a new fingerprint directory; siblings of
    the same (kind, full-path lineage) with a dead fingerprint must be
    deleted so the scratch dir stays bounded across regenerations — but
    only past the grace age (a concurrent process may still be scanning an
    old-fingerprint index, ADVICE r12), and only within the same full-path
    lineage (two sf_dirs sharing a basename must not reap each other)."""
    import hashlib
    import time

    from data_integration_and_processing_spark.queries.similarity_queries import (
        _fixture_index_path,
    )

    path = _fixture_index_path("reaptest", sf_dir)
    full = os.path.abspath(sf_dir.rstrip("/"))
    base = f"{os.path.basename(full)}-{hashlib.sha256(full.encode()).hexdigest()[:8]}"
    assert f"reaptest_index_{base}_" in path  # full-path digest in the key
    old = f"/tmp/diaps_scratch/reaptest_index_{base}_deadbeef"
    fresh = f"/tmp/diaps_scratch/reaptest_index_{base}_cafebabe"
    other_kind = f"/tmp/diaps_scratch/reapother_index_{base}_deadbeef"
    other_lineage = f"/tmp/diaps_scratch/reaptest_index_{os.path.basename(full)}-00000000_deadbeef"
    for d in (old, fresh, other_kind, other_lineage):
        os.makedirs(d, exist_ok=True)
    past = time.time() - 7200  # beyond the 1h grace
    os.utime(old, (past, past))
    os.utime(other_lineage, (past, past))
    try:
        again = _fixture_index_path("reaptest", sf_dir)
        assert again == path
        assert not os.path.exists(old)  # dead sibling past grace: reaped
        assert os.path.exists(fresh)  # within grace: survives this pass
        assert os.path.exists(other_kind)  # other kinds untouched
        assert os.path.exists(other_lineage)  # other full-path lineage untouched
    finally:
        for d in (fresh, other_kind, other_lineage):
            shutil.rmtree(d, ignore_errors=True)
