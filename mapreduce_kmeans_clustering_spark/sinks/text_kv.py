"""Text sinks with reference output parity (operators O17, O18).

The reference writes ``key\\tvalue`` lines via TextOutputFormat plus a
``_SUCCESS`` marker (Task1.java:121; artifacts output/task1/). Spark's
HadoopMapReduceCommitProtocol emits the same ``_SUCCESS``. Java's
``Double.toString`` round-trips 17 significant digits; Python's
``repr(float)`` produces the shortest round-trip representation, which
is numerically identical — golden comparisons are numeric (1e-9)
rather than byte-level (SURVEY §7 hard part a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.sources.seeds import Centroid, _parse_line


def format_centroids_kv(centroids: list[Centroid]) -> str:
    """Render the iteration-output format ``id\\tx,y,z`` (reducer emit
    Task1.java:97), id-sorted like the shuffle-sorted part file."""
    return "\n".join(
        f"{c.id}\t{c.x!r},{c.y!r},{c.z!r}" for c in sorted(centroids)
    )


def write_centroids_kv(spark: SparkSession, centroids: list[Centroid], path: str) -> None:
    """Distributed single-file write of the K-row centroid table in the
    reference's TSV format (creates part files + _SUCCESS)."""
    df = spark.createDataFrame(
        [(c.id, f"{c.x!r},{c.y!r},{c.z!r}") for c in sorted(centroids)],
        schema="id INT, coords STRING",
    )
    (
        df.coalesce(1)
        .select(F.concat_ws("\t", F.col("id"), F.col("coords")))
        .write.mode("overwrite")
        .text(path)
    )


def read_centroids_kv(path_or_lines) -> list[Centroid]:
    """Parse reference-format centroid output (file path or iterable of
    lines) with the tolerant dual-format parser."""
    if isinstance(path_or_lines, str):
        with open(path_or_lines) as fh:
            lines = fh.readlines()
    else:
        lines = list(path_or_lines)
    out: list[Centroid] = []
    for raw in lines:
        c = _parse_line(raw, len(out))
        if c is not None:
            out.append(c)
    return out


def write_labeled(labeled: DataFrame, path: str) -> None:
    """Labeled-points sink (Task5B.java:241-243's console epilogue as a
    distributed CSV write)."""
    labeled.select("x", "y", "z", "cluster").write.mode("overwrite").csv(path)


def write_members_kv(members_df: DataFrame, path: str) -> None:
    """Members sink in the reference's packed-text shape
    (``cluster\\tcx,cy,cz; x,y,z; x,y,z; ...``,
    SilhouetteEvaluation2.java:128) — kept only for output parity;
    downstream consumers should read the typed array column instead."""
    packed = members_df.select(
        F.concat_ws(
            "\t",
            F.col("cluster"),
            F.concat_ws(
                "; ",
                F.concat_ws(",", F.col("cx"), F.col("cy"), F.col("cz")),
                F.array_join(
                    F.transform(
                        F.col("points"),
                        lambda p: F.concat_ws(",", p["x"], p["y"], p["z"]),
                    ),
                    "; ",
                ),
            ),
        )
    )
    packed.write.mode("overwrite").text(path)
