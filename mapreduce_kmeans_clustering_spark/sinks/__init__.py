from mapreduce_kmeans_clustering_spark.sinks.text_kv import (
    format_centroids_kv,
    read_centroids_kv,
    write_centroids_kv,
    write_labeled,
    write_members_kv,
)

__all__ = [
    "format_centroids_kv",
    "read_centroids_kv",
    "write_centroids_kv",
    "write_labeled",
    "write_members_kv",
]
