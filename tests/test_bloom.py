"""Bloom-filter pre-join: no false negatives, low FPR, exact semi-join
equivalence, scan-local probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    semi_join_bloom,
)


def test_no_false_negatives_and_low_fpr(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=1 << 14, k=5)  # ~16 bits/key
    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    hits = probe.where(bloom_might_contain("k", words)).count()
    assert hits >= 1000  # every member passes
    fpr = (hits - 1000) / 9000
    assert fpr < 0.02, fpr


@pytest.mark.slow  # >=12 s in the idle full run (r13)
def test_semi_join_bloom_equals_plain_semi_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .where("o_totalprice > 400000")
        .select("o_orderkey")
    )
    got = semi_join_bloom(li, orders, "l_orderkey", "o_orderkey")
    want = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_probe_is_scan_local_codegen(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=1 << 10, k=3)
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    filtered = probe.where(bloom_might_contain("k", words))
    p = filtered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p  # pure scan-local predicate
    assert "BatchEvalPython" not in p


def test_build_rejects_bad_size(spark):
    import pytest

    keys = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(keys, "k", m_bits=1000)
