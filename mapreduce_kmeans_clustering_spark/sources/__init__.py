from mapreduce_kmeans_clustering_spark.sources.points import (
    points_from_lineitem,
    read_points_csv,
    read_points_parquet,
    with_rid,
)
from mapreduce_kmeans_clustering_spark.sources.seeds import (
    Centroid,
    load_seeds,
    seeds_df,
    seeds_from_points,
)

__all__ = [
    "Centroid",
    "load_seeds",
    "seeds_df",
    "seeds_from_points",
    "points_from_lineitem",
    "read_points_csv",
    "read_points_parquet",
    "with_rid",
]
