"""Iterative Lloyd K-Means driver (reference operators O9, O10, O11).

The reference chains one Hadoop job per iteration, crossing the
filesystem twice per step (seed file read by every map task, output
read back by the driver — Task5A.java:154-209). Here an iteration is
one job: ``assign`` (scan-local projection) + ``update_centroids``
(partial-agg groupBy) + a K-row ``collect``. State between iterations
is the K-row centroid list on the driver; no filesystem round-trip.

Scale notes (100 TB target):
- per iteration the points relation is scanned once; the only shuffle
  moves K rows per upstream partition (partial aggregation), so the
  network cost per iteration is O(K * partitions), independent of data
  size;
- ``points.persist()`` (caller's choice) keeps the scan in memory/disk
  cache across iterations;
- the centroid state is O(K) on the driver — no driver materialization
  of data rows ever happens.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from mapreduce_kmeans_clustering_spark.operators.aggregate import update_centroids
from mapreduce_kmeans_clustering_spark.operators.assign import assign
from mapreduce_kmeans_clustering_spark.sources.seeds import Centroid

DEFAULT_MAX_ITER = 30  # Task3.java:192
DEFAULT_THRESHOLD = 5.0  # Task3.java:193


def displacement(prev: list[Centroid], curr: list[Centroid], strict: bool = True) -> float:
    """Convergence metric (Task3.java:116-128): SUM over clusters of
    Euclidean displacement between consecutive centroid lists —
    positional zip over id-sorted lists, valid because ids are stable
    line indices (SURVEY §1.3.5).

    ``strict`` reproduces Task5A.java:138-140: a size mismatch (a
    cluster emptied out and K shrank) raises instead of comparing.
    """
    if len(prev) != len(curr):
        if strict:
            raise ValueError(
                f"Centroid count mismatch between iterations: {len(prev)} vs {len(curr)}"
            )
        prev_by_id = {c.id: c for c in prev}
        pairs = [(prev_by_id[c.id], c) for c in curr if c.id in prev_by_id]
    else:
        pairs = list(zip(sorted(prev), sorted(curr)))
    return sum(
        math.sqrt((a.x - b.x) ** 2 + (a.y - b.y) ** 2 + (a.z - b.z) ** 2)
        for a, b in pairs
    )


def lloyd_iteration(points: DataFrame, centroids: list[Centroid]) -> list[Centroid]:
    """One Lloyd step: assign + per-cluster mean, K rows collected.

    Empty clusters drop out (no groupBy key), shrinking K exactly like
    the reference (SURVEY §1.3.4).
    """
    assigned = assign(points, centroids, keep_cols=["x", "y", "z"])
    rows = update_centroids(assigned).collect()
    return [Centroid(int(r["id"]), r["x"], r["y"], r["z"]) for r in rows]


@dataclass
class FitResult:
    centroids: list[Centroid]
    iterations: int  # number of Lloyd steps executed
    converged: bool
    displacements: list[float] = field(default_factory=list)
    history: list[list[Centroid]] = field(default_factory=list)


def fit(
    points: DataFrame,
    seeds: list[Centroid],
    max_iter: int = DEFAULT_MAX_ITER,
    threshold: float | None = DEFAULT_THRESHOLD,
    strict_size: bool = True,
    keep_history: bool = False,
) -> FitResult:
    """Run Lloyd iterations until the summed displacement drops below
    ``threshold`` or ``max_iter`` is hit.

    - Task1  == fit(max_iter=1, threshold=None)
    - Task2  == fit(max_iter=5, threshold=None)
    - Task3/4/5A/5B == fit(max_iter=30, threshold=5.0)

    Convergence check order matches Task3.java:198-212: run iteration
    i, compare to iteration i-1's centroids, stop AFTER the iteration
    whose displacement is below threshold (the converged centroids are
    included).
    """
    curr = list(seeds)
    result = FitResult(centroids=curr, iterations=0, converged=False)
    for _ in range(max_iter):
        prev, curr = curr, lloyd_iteration(points, curr)
        result.iterations += 1
        if keep_history:
            result.history.append(curr)
        if threshold is not None:
            d = displacement(prev, curr, strict=strict_size)
            result.displacements.append(d)
            if d < threshold:
                result.converged = True
                break
    result.centroids = curr
    return result


def init_farthest(
    points: DataFrame,
    k: int,
    start: tuple[float, float, float] | None = None,
) -> list[Centroid]:
    """Deterministic farthest-point seeding (the RNG-free cousin of
    k-means++ — Gonzalez's 2-approximation for k-center): start from a
    fixed point and repeatedly add the point farthest from its nearest
    chosen centroid, ties to the smallest (x, y, z).

    The reference only reads seeds from a file (SURVEY §2.1 O2); this
    is the library's answer for when no seed file exists. Deterministic
    by construction — no RNG, ties totally ordered — so a re-run (or a
    DuckDB replay) picks identical seeds, unlike k-means|| sampling.

    Cost: k driver rounds, each one scan-local distance projection +
    a 1-row max aggregate (the same shuffle-free shape as ``assign``;
    O(k·n) total work, O(k) driver state). For the 100 TB corpus cache
    the points relation first, exactly like ``fit``.

    ``start`` defaults to the minimum (x, y, z) row — any fixed rule
    works; this one needs no extra pass.
    """
    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark.functions.literals import norm_lit

    if k < 1:
        raise ValueError("k must be >= 1")
    first = (
        points.select("x", "y", "z")
        .orderBy("x", "y", "z")
        .limit(1)
        .collect()[0]
        if start is None
        else None
    )
    sx, sy, sz = (
        (first["x"], first["y"], first["z"]) if start is None else start
    )
    chosen: list[Centroid] = [Centroid(0, float(sx), float(sy), float(sz))]
    for i in range(1, k):
        d2 = None
        for c in chosen:
            expr = (
                (F.col("x") - norm_lit(c.x)) ** 2
                + (F.col("y") - norm_lit(c.y)) ** 2
                + (F.col("z") - norm_lit(c.z)) ** 2
            )
            d2 = expr if d2 is None else F.least(d2, expr)
        far = (
            points.select("x", "y", "z", d2.alias("d2"))
            .orderBy(F.col("d2").desc(), "x", "y", "z")
            .limit(1)
            .collect()[0]
        )
        chosen.append(Centroid(i, far["x"], far["y"], far["z"]))
    return chosen


def label(points: DataFrame, centroids: list[Centroid]) -> DataFrame:
    """Final-assignment labeling sink (O11): the reference recomputes
    assignments in a driver-side loop after convergence
    (Task5B.java:216-245); here it is the same distributed projection
    as training — (x, y, z, cluster) at full parallelism."""
    return assign(points, centroids, keep_cols=["x", "y", "z"]).select(
        "x", "y", "z", "cluster"
    )
