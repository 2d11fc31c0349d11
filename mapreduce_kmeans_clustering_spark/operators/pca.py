"""Distributed PCA over embedding columns — the dimensionality
reduction step a vector pipeline runs before ANN indexing or
whitening (reference has no analog; this is part of the engine's
LLM-data extension surface, same family as operators/similarity.py).

Physical shape (the only one that works at 100 TB):
- MOMENTS: one Arrow/BLAS pass computes per-batch partial moments
  (count, sum vector, Gram matrix X^T X) packed into a single array
  column; posexplode + one hash aggregate sums them — the shuffle
  carries (1 + dim + dim^2) keys per partition, never rows. For
  dim=64 that is 4,161 doubles per map task.
- DRIVER: covariance = G/n - mu mu^T is dim x dim (driver-tiny);
  np.linalg.eigh gives components. Eigen-decomposition of a 64x64
  matrix is microseconds — distributing it would be theater.
- PROJECT: scan-local mapInPandas, (A - mu) @ W^T per Arrow batch.

Numerical note: the moments pass sums doubles in partition order, so
low bits of the covariance can differ between partitionings — tests
compare with tolerances, and the eigenvector sign is canonicalized
(largest-|component| coordinate made positive) so downstream outputs
are stable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PcaModel:
    mean: list[float]  # dim
    components: list[list[float]]  # p rows x dim (rows are PCs)
    explained_variance: list[float]  # p eigenvalues, descending
    n_rows: int


def moments_nd(
    vectors: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[int, "object", "object"]:
    """(n, sum[dim], gram[dim, dim]) in one pass: per-batch BLAS
    partials packed as one (1 + dim + dim^2) array, summed by a single
    position-keyed hash aggregate (partial->final map-side combine)."""
    import numpy as np
    import pandas as pd

    width = 1 + dim + dim * dim

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            packed = np.concatenate(
                ([float(len(A))], A.sum(axis=0), (A.T @ A).ravel())
            )
            yield pd.DataFrame({"m": [list(packed)]})

    parts = vectors.select(vec_col).mapInPandas(gen, "m array<double>")
    summed = (
        parts.select(F.posexplode("m").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    flat = np.zeros(width)
    for r in summed:
        flat[r["pos"]] = r["s"]
    n = int(round(flat[0]))
    s = flat[1 : 1 + dim]
    g = flat[1 + dim :].reshape(dim, dim)
    return n, s, g


def pca_nd(
    vectors: DataFrame, dim: int, p: int, vec_col: str = "embedding"
) -> PcaModel:
    """Fit top-``p`` principal components from one distributed moments
    pass + a driver eigh on the dim x dim covariance."""
    import numpy as np

    if not 1 <= p <= dim:
        raise ValueError(f"p must be in [1, {dim}]")
    n, s, g = moments_nd(vectors, dim, vec_col)
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mu = s / n
    cov = g / n - np.outer(mu, mu)  # population covariance
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:p]
    comps = vecs[:, order].T  # p x dim
    # canonical sign: the largest-|x| coordinate of each PC is positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return PcaModel(
        mean=[float(x) for x in mu],
        components=[[float(x) for x in r] for r in comps],
        explained_variance=[float(vals[i]) for i in order],
        n_rows=n,
    )


def project_nd(
    vectors: DataFrame,
    model: PcaModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Scan-local projection onto the fitted components:
    (A - mean) @ W^T per Arrow batch. Output dim = len(components)."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    W = np.asarray(model.components, dtype=np.float64)
    mu = np.asarray(model.mean, dtype=np.float64)
    bc = spark.sparkContext.broadcast((W, mu))

    def gen(batches):
        Wb, mub = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            P = (A - mub) @ Wb.T
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), out_col: list(P)}
            )

    schema = f"{id_col} long, {out_col} array<double>"
    return vectors.select(id_col, vec_col).mapInPandas(gen, schema)
