"""Distributed linear algebra: moments exactness, PCA determinism, and
whitening semantics (operators/linalg.py)."""

from __future__ import annotations

import numpy as np

from data_integration_and_processing_spark.operators.linalg import (
    corpus_moments,
    pca_project,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_moments_match_numpy(spark, sf_dir):
    e = _emb(spark, sf_dir)
    n, mean, cov = corpus_moments(e)
    x = np.stack(e.toPandas()["embedding"].to_numpy()).astype(np.float64)
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-12, atol=1e-12)
    ref_cov = np.cov(x, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, ref_cov, rtol=1e-9, atol=1e-12)


def test_projection_deterministic_across_runs(spark, sf_dir):
    e = _emb(spark, sf_dir)
    a, ra = pca_project(e, k=4)
    b, rb = pca_project(e, k=4)
    pa = a.orderBy("vec_id").toPandas()
    pb = b.orderBy("vec_id").toPandas()
    np.testing.assert_array_equal(ra, rb)
    xa = np.stack(pa["components"].to_numpy())
    xb = np.stack(pb["components"].to_numpy())
    np.testing.assert_array_equal(xa, xb)  # bit-stable, not merely close


def test_whitened_covariance_is_identity(spark, sf_dir):
    e = _emb(spark, sf_dir)
    proj, _ = pca_project(e, k=8, whiten=True)
    x = np.stack(proj.toPandas()["components"].to_numpy())
    cov = np.cov(x, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, np.eye(8), atol=1e-6)


def test_explained_variance_sorted_and_bounded(spark, sf_dir):
    e = _emb(spark, sf_dir)
    _, ratio = pca_project(e, k=16)
    assert (np.diff(ratio) <= 1e-12).all()
    assert 0.0 < ratio.sum() <= 1.0 + 1e-9


def test_projection_preserves_pairwise_distances_topk_full_rank(spark, sf_dir):
    # with k = d the projection is an isometry (orthonormal basis): pairwise
    # distances must be preserved to float precision
    e = _emb(spark, sf_dir).limit(50)
    proj, _ = pca_project(e, k=64)
    pdf = proj.orderBy("vec_id").toPandas()
    x_orig = np.stack(_emb(spark, sf_dir).limit(50).orderBy("vec_id").toPandas()["embedding"].to_numpy()).astype(np.float64)
    x_proj = np.stack(pdf["components"].to_numpy())
    d_orig = np.linalg.norm(x_orig[:, None] - x_orig[None, :], axis=-1)
    d_proj = np.linalg.norm(x_proj[:, None] - x_proj[None, :], axis=-1)
    np.testing.assert_allclose(d_proj, d_orig, rtol=1e-6, atol=1e-8)


def test_merged_moments_equal_whole_corpus_moments(spark, sf_dir):
    from data_integration_and_processing_spark.operators.linalg import merge_moments

    e = _emb(spark, sf_dir)
    left = e.filter("vec_id % 2 = 0")
    right = e.filter("vec_id % 2 = 1")
    merged = merge_moments(corpus_moments(left), corpus_moments(right))
    n, mean, cov = corpus_moments(e)
    assert merged[0] == n
    np.testing.assert_allclose(merged[1], mean, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(merged[2], cov, rtol=1e-9, atol=1e-12)
