from mapreduce_kmeans_clustering_spark.operators.assign import (
    assign,
    assign_join,
    assignment_expr,
)
from mapreduce_kmeans_clustering_spark.operators.aggregate import (
    members,
    update_centroids,
)

__all__ = [
    "assign",
    "assign_join",
    "assignment_expr",
    "update_centroids",
    "members",
]
