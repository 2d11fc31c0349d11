"""Skew tools: salted two-phase aggregation equals the direct
aggregate; jaccard's max_df stop-shingle filter is a documented
recall trade (subset of the exact result, identical when inert)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.functions.skew import salted_agg, salted_count
from mapreduce_kmeans_clustering_spark.operators.dedup import jaccard_pairs


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", float(i % 7)) for i in range(900)]
    rows += [(f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k STRING, v DOUBLE").repartition(8)


def test_salted_count_matches_direct(spark, skewed):
    direct = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r["k"]: r["n"] for r in salted_count(skewed, ["k"]).collect()}
    assert salted == direct


def test_salted_agg_sum_min_max_match_direct(spark, skewed):
    direct = {
        r["k"]: (r["s"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    got = {
        r["k"]: (r["s"], r["lo"], r["hi"])
        for r in salted_agg(
            skewed,
            ["k"],
            {"s": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")},
            salt=4,
        ).collect()
    }
    assert set(got) == set(direct)
    for k, (s, lo, hi) in direct.items():
        gs, glo, ghi = got[k]
        assert abs(gs - s) < 1e-9 and glo == lo and ghi == hi


def test_salted_agg_rejects_unknown_op(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"bad": ("v", "avg")})


def test_jaccard_max_df_is_subset_and_inert_when_large(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {(r["a"], r["b"]) for r in jaccard_pairs(docs, threshold=0.2).collect()}
    inert = {
        (r["a"], r["b"])
        for r in jaccard_pairs(docs, threshold=0.2, max_df=10**9).collect()
    }
    assert inert == full
    filtered = {
        (r["a"], r["b"])
        for r in jaccard_pairs(docs, threshold=0.2, max_df=2).collect()
    }
    # recall trade: never invents pairs
    assert filtered <= full


def test_aqe_skew_join_engages_on_hot_key(spark):
    """SCALE.md trusts AQE to split skewed join partitions; prove the
    mechanism actually fires: with skew thresholds lowered, a join
    whose one key holds ~90% of rows shows skew=true in the final
    adaptive plan, and results stay correct."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        right = spark.range(0, 100_000, 1).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = left.join(right, "k")
        n = len(j.collect())  # collect: the SAME QueryExecution finalizes
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        # correctness unaffected: hot key 7 matches once per left row
        assert n == left.join(right.where("k = 7"), "k").count() + left.where(
            "k != 7"
        ).join(right, "k").count()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
