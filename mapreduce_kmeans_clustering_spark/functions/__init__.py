from mapreduce_kmeans_clustering_spark.functions.distance import (
    cosine_similarity,
    euclidean,
    euclidean_sq,
)

__all__ = ["euclidean", "euclidean_sq", "cosine_similarity"]
