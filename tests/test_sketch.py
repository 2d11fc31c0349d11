"""KMV sketch: exact below k, sane relative error above k, and
permutation/duplication invariance (the estimate is a pure function of
the distinct value set)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.functions.sketch import kmv_distinct


def test_small_groups_are_exact(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], "g STRING, v STRING"
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["est_distinct"] == 10.0


def test_estimate_within_tolerance(spark):
    n = 5000
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(n)], "g STRING, v STRING"
    ).repartition(8)
    row = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert row["n_kept"] == 256
    # KMV stddev ~ n/sqrt(k-2) ≈ 6.3%; 4 sigma bound keeps this stable
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_duplicates_and_order_do_not_change_estimate(spark):
    base = [("g", f"value-{i}") for i in range(1000)]
    a = spark.createDataFrame(base, "g STRING, v STRING")
    b = spark.createDataFrame(
        list(reversed(base)) + base[:500] * 3, "g STRING, v STRING"
    ).repartition(5)
    ra = kmv_distinct(a, ["g"], "v", k=64).collect()[0]
    rb = kmv_distinct(b, ["g"], "v", k=64).collect()[0]
    assert ra["est_distinct"] == rb["est_distinct"]


def test_salted_two_phase_equals_single_sort(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"value-{i}") for i in range(3000)], "g STRING, v STRING"
    ).repartition(8)
    one = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=64, salt_buckets=1).collect()))
    two = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=64, salt_buckets=16).collect()))
    assert one == two
