"""Distributed PCA vs numpy ground truth on the testdata embeddings."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_kmeans_clustering_spark.operators.pca import (
    moments_nd,
    pca_nd,
    project_nd,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    X = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    return df, X


def test_moments_match_numpy(emb):
    df, X = emb
    n, s, g = moments_nd(df, dim=X.shape[1])
    assert n == len(X)
    assert np.allclose(s, X.sum(axis=0), rtol=1e-12)
    assert np.allclose(g, X.T @ X, rtol=1e-12)


def test_pca_matches_numpy_eigh(emb):
    df, X = emb
    dim = X.shape[1]
    m = pca_nd(df, dim=dim, p=4)
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    top = np.argsort(vals)[::-1][:4]
    assert np.allclose(
        m.explained_variance, vals[top], rtol=1e-8
    )  # eigenvalues match
    for i, j in enumerate(top):  # eigenvectors match up to sign
        got = np.asarray(m.components[i])
        want = vecs[:, j]
        assert min(
            np.abs(got - want).max(), np.abs(got + want).max()
        ) < 1e-8


def test_projection_shape_and_variance_order(emb):
    df, X = emb
    dim = X.shape[1]
    m = pca_nd(df, dim=dim, p=3)
    P = np.array(
        [
            r["proj"]
            for r in project_nd(df, m).orderBy("vec_id").collect()
        ]
    )
    assert P.shape == (len(X), 3)
    v = P.var(axis=0)
    assert v[0] >= v[1] >= v[2]  # components ordered by variance
    assert np.allclose(v, m.explained_variance, rtol=1e-6)
    assert np.abs(P.mean(axis=0)).max() < 1e-9  # centered


def test_pca_deterministic_under_repartition(emb):
    df, _ = emb
    a = pca_nd(df, dim=64, p=2)
    b = pca_nd(df.repartition(7), dim=64, p=2)
    assert np.allclose(a.components, b.components, atol=1e-9)
    assert np.allclose(a.explained_variance, b.explained_variance, rtol=1e-9)


def test_pca_validates_p(emb):
    df, _ = emb
    with pytest.raises(ValueError):
        pca_nd(df, dim=64, p=0)
    with pytest.raises(ValueError):
        pca_nd(df, dim=64, p=65)
