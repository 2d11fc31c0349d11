"""Similarity search over embedding columns: exact brute-force cosine
top-k (the correctness baseline) and an LSH-bucketed approximate path
(the scale path).

Scale design: brute-force is a broadcast of the (few) query vectors
against the corpus — one scan, no shuffle, O(|corpus| * k_dim) work,
fine at any corpus size as long as the query set is small. The LSH
path buckets the corpus by random-hyperplane sign bits so a query only
scans its bucket — candidate generation is an equi-join on the bucket
key, never a cross join; at 100 TB the corpus would additionally be
written bucketed-by(bucket) so repeated queries skip the shuffle.

Hyperplanes are DERIVED (md5 of plane/dim indices -> ±1), not sampled:
no RNG at runtime, bit-reproducible in the SQL oracle via embedded
literals.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_kmeans_clustering_spark.functions.distance import cosine_similarity

DEFAULT_DIM = 64
DEFAULT_PLANES = 8


@lru_cache(maxsize=None)
def hyperplanes(dim: int = DEFAULT_DIM, planes: int = DEFAULT_PLANES) -> tuple[tuple[float, ...], ...]:
    """Deterministic ±1 hyperplane matrix: component (p, d) is the sign
    of the low bit of md5('plane:p:d')."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        out.append(tuple(row))
    return tuple(out)


def _as_double(vec_col: Column) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def lsh_bucket_expr(vec_col: Column, dim: int = DEFAULT_DIM, planes: int = DEFAULT_PLANES) -> Column:
    """Integer bucket id: bit p is 1 iff <vec, plane_p> > 0."""
    v = _as_double(vec_col)
    bucket = None
    for p, plane in enumerate(hyperplanes(dim, planes)):
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(c) for c in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("int")


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query id (queries
    excluded from their own result). Deterministic rank ties:
    (cos desc, neighbor id asc). Output (query_id, neighbor_id, rank,
    cos)."""
    vecs = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    q = F.broadcast(
        vecs.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("v").alias("qv")
        )
    )
    c = vecs.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"))
    cos = cosine_similarity(F.col("qv"), F.col("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos")
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = DEFAULT_DIM,
    planes: int = DEFAULT_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket (equi-join on bucket), then exact cosine + rank within the
    bucket. Recall < 1 by design; same algorithm is mirrored in the
    SQL oracle so the comparison is exact."""
    vecs = embeddings.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket_expr(F.col(vec_col), dim, planes).alias("bucket"),
    )
    q = F.broadcast(
        vecs.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "bucket"
        )
    )
    c = vecs.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), "bucket")
    cos = cosine_similarity(F.col("qv"), F.col("cv"))
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos")
    )


def sql_plane_literal(dim: int = DEFAULT_DIM, planes: int = DEFAULT_PLANES) -> list[str]:
    """The hyperplane rows as SQL array literals (for the DuckDB
    oracle)."""
    return [
        "[" + ", ".join(f"{c:.1f}" for c in plane) + "]"
        for plane in hyperplanes(dim, planes)
    ]
