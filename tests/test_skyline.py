"""Skyline operator: sort-order frontier vs the brute-force dominance
oracle, bucket-count invariance, and degenerate shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.operators.skyline import skyline_2d


def _brute_skyline(pairs):
    """Oracle: distinct (x, y) not dominated under (min x, max y)."""
    pts = sorted(set(pairs))
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0]
            and q[1] >= p[1]
            and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, pairs, buckets=32):
    df = spark.createDataFrame(pairs, "x double, y int")
    got = skyline_2d(df, "x", "y", buckets=buckets).collect()
    return sorted((r["x"], r["y"]) for r in got)


def test_matches_brute_force_with_dupes_and_ties(spark):
    pairs = [
        (1.0, 5), (1.0, 5),          # duplicate pair: kept once
        (1.0, 3),                     # same x, smaller y: dominated
        (2.0, 5),                     # same y, higher x: dominated
        (2.0, 7), (3.0, 9), (3.0, 9),
        (0.5, 1), (4.0, 9),           # (4,9) dominated by (3,9)
        (0.5, 2),                     # dominates (0.5,1)
    ]
    assert _run(spark, pairs) == _brute_skyline(pairs)


def test_counts_carried_through_both_phases(spark):
    pairs = [(1.0, 5)] * 3 + [(2.0, 7)] * 2 + [(1.5, 6)]
    df = spark.createDataFrame(pairs, "x double, y int")
    rows = {(r["x"], r["y"]): r["n_rows"] for r in skyline_2d(df, "x", "y").collect()}
    assert rows == {(1.0, 5): 3, (1.5, 6): 1, (2.0, 7): 2}


def test_bucket_count_does_not_change_result(spark):
    pairs = [(float(i % 17), (i * 7) % 23) for i in range(300)]
    assert _run(spark, pairs, buckets=1) == _run(spark, pairs, buckets=64)
    assert _run(spark, pairs, buckets=1) == _brute_skyline(pairs)


def test_correlated_keeps_everything(spark):
    # worst case for (min x, max y): positively-correlated points are
    # all Pareto-optimal (cheaper always means smaller)
    pairs = [(float(i), i) for i in range(50)]
    assert _run(spark, pairs) == _brute_skyline(pairs)
    assert len(_run(spark, pairs)) == 50


def test_anticorrelated_keeps_single_point(spark):
    # best case: the cheap-and-large point dominates all others
    pairs = [(float(i), 100 - i) for i in range(50)]
    assert _run(spark, pairs) == [(0.0, 100)]


def test_local_phase_only_prunes_never_drops(spark):
    """Per-bucket survivors must be a superset of the global frontier
    (skyline(S) = skyline(U skyline(S_i)) — the merge identity the
    two-phase plan relies on)."""
    pairs = [(float((i * 13) % 29), (i * 11) % 31) for i in range(200)]
    df = spark.createDataFrame(pairs, "x double, y int")
    from mapreduce_kmeans_clustering_spark.operators.skyline import (
        _frontier_filter,
    )

    distinct = df.groupBy("x", "y").count()
    bucketed = distinct.withColumn(
        "_b", F.pmod(F.xxhash64("x", "y"), F.lit(8))
    )
    local = {
        (r["x"], r["y"])
        for r in _frontier_filter(bucketed, "x", "y", "_b").collect()
    }
    assert set(_brute_skyline(pairs)) <= local
