"""Nearest-centroid assignment (reference operators O4 + O5) and the
broadcast that feeds it (O3).

Reference semantics (Task1.java:36-54, cloned in 8 other files):
linear scan over K centroids, strict ``<`` comparison — on an exact
distance tie the LOWEST-INDEX centroid wins. A naive unordered argmin
(or MLlib's ``KMeansModel.transform``) does not pin that.

Spark-first design: the centroid list is tiny (K rows), so it is
inlined as *literal* struct constants into one column expression:

    array_min(array(struct(dist_0, 0), ..., struct(dist_{K-1}, K-1)))["id"]

Struct comparison is lexicographic (dist first, then id), so
``array_min`` is exactly "min distance, ties to lowest id". The whole
thing is a scalar projection: no join, no shuffle, fully inside
whole-stage codegen, and the broadcast cost is literally zero bytes —
the constants travel inside the serialized plan. This is the idiomatic
replacement for the reference's side-file-in-mapper-setup channel
(Task1.java:20-23): at 100 TB the assignment stage stays an
embarrassingly-parallel scan.

``assign_join`` is the dynamic-K variant (broadcast-hash-join +
min_by) for when centroids are a DataFrame, e.g. produced upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.functions.distance import euclidean, euclidean_sq
from mapreduce_kmeans_clustering_spark.functions.literals import norm_lit
from mapreduce_kmeans_clustering_spark.sources.seeds import Centroid


def assignment_expr(
    centroids: Sequence[Centroid],
    x: Column | str = "x",
    y: Column | str = "y",
    z: Column | str = "z",
    use_sqrt: bool = True,
) -> Column:
    """Column expression: cluster id of the nearest centroid,
    first-index-wins on ties (Task1.java:46-49).

    ``use_sqrt=False`` uses squared distance — same argmin (sqrt is
    monotonic) and same tie behavior, one fewer sqrt per (row,
    centroid). Kept as an option; defaults to the reference's exact
    arithmetic.
    """
    if not centroids:
        raise ValueError("empty centroid list")
    cx, cy, cz = (F.col(c) if isinstance(c, str) else c for c in (x, y, z))
    dist = euclidean if use_sqrt else euclidean_sq
    candidates = F.array(
        *[
            F.struct(
                dist(cx, cy, cz, norm_lit(c.x), norm_lit(c.y), norm_lit(c.z)).alias(
                    "dist"
                ),
                F.lit(int(c.id)).alias("id"),
            )
            for c in centroids
        ]
    )
    return F.array_min(candidates)["id"]


def assign(
    points: DataFrame,
    centroids: Sequence[Centroid],
    keep_cols: Sequence[str] | None = None,
    use_sqrt: bool = True,
) -> DataFrame:
    """points(x,y,z,...) -> assigned(cluster, x, y, z[, extras]).

    Mirrors the map phase Task1.java:26-34 as a pure projection.
    """
    keep = list(keep_cols) if keep_cols is not None else list(points.columns)
    return points.select(
        assignment_expr(centroids, use_sqrt=use_sqrt).alias("cluster"),
        *[F.col(c) for c in keep],
    )


def assign_join(points: DataFrame, seeds: DataFrame) -> DataFrame:
    """Dynamic-K assignment via explicit broadcast-hash-join + min_by.

    ``min_by(id, struct(dist, id))`` pins the same lowest-index
    tie-break. One shuffle-free broadcast join + partial-aggregated
    groupBy on the (unique) row key.
    """
    if "rid" not in points.columns:
        raise ValueError("assign_join requires a rid column (use with_rid)")
    p = points.alias("p")
    s = F.broadcast(seeds.alias("s"))
    d = euclidean(
        F.col("p.x"), F.col("p.y"), F.col("p.z"), F.col("s.x"), F.col("s.y"), F.col("s.z")
    )
    joined = p.crossJoin(s).select(
        F.col("p.rid").alias("rid"),
        F.col("p.x").alias("x"),
        F.col("p.y").alias("y"),
        F.col("p.z").alias("z"),
        F.struct(d.alias("dist"), F.col("s.id").alias("id")).alias("cand"),
    )
    return (
        joined.groupBy("rid")
        .agg(
            F.min("cand")["id"].alias("cluster"),
            F.first("x").alias("x"),
            F.first("y").alias("y"),
            F.first("z").alias("z"),
        )
        .select("cluster", "x", "y", "z", "rid")
    )
