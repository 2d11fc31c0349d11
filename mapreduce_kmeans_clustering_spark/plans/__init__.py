from mapreduce_kmeans_clustering_spark.plans.kmeans import (
    FitResult,
    displacement,
    fit,
    label,
    lloyd_iteration,
)

__all__ = ["FitResult", "displacement", "fit", "label", "lloyd_iteration"]
