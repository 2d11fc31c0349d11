"""Optional MLlib K-Means backend (SURVEY §7): pyspark.ml.clustering
behind the same fit/label shape as the reference-parity driver.

NOT the correctness path — MLlib differs from the reference in
initialization (k-means|| sampling vs fixed seed files), tie-breaking
(unspecified argmin order vs strict lowest-index), and convergence
metric (within-set sum of squares vs summed centroid displacement).
Offered for users who want the library behavior (init seeding,
DataFrame pipelines, model persistence) rather than golden parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class MllibFitResult:
    centroids: list[list[float]]  # index == cluster id
    cost: float  # training cost (within-set sum of squared distances)
    model: object  # pyspark.ml.clustering.KMeansModel


def fit_mllib(
    points: DataFrame, k: int, max_iter: int = 20, seed: int = 1, tol: float = 1e-4
) -> MllibFitResult:
    """Library K-Means over an (x, y, z) relation."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    vec = VectorAssembler(inputCols=["x", "y", "z"], outputCol="features").transform(
        points.select("x", "y", "z")
    )
    model = KMeans(k=k, maxIter=max_iter, seed=seed, tol=tol).fit(vec)
    return MllibFitResult(
        centroids=[list(map(float, c)) for c in model.clusterCenters()],
        cost=float(model.summary.trainingCost),
        model=model,
    )


def label_mllib(points: DataFrame, result: MllibFitResult) -> DataFrame:
    """(x, y, z, cluster) via the fitted model's transform."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    vec = VectorAssembler(inputCols=["x", "y", "z"], outputCol="features").transform(
        points.select("x", "y", "z")
    )
    return result.model.transform(vec).select(
        "x", "y", "z", F.col("prediction").cast("int").alias("cluster")
    )
