"""Property tests: asof_join and interval_join equal their brute-force
per-row definitions on randomized inputs (Spark round-trips are slow,
so examples are few but each covers many rows/keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.operators.joins import asof_join, interval_join

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

key = st.integers(0, 3)
sec = st.integers(0, 120)

left_rows = st.lists(st.tuples(key, sec), min_size=1, max_size=25)
right_rows = st.lists(st.tuples(key, sec), min_size=0, max_size=25)


import pytest

# Exhaustive property batch — slow (VERDICT r12 item 2): excluded
# from the default run; CI/round-close run with --runslow.
pytestmark = pytest.mark.slow


def _ts(s: int) -> str:
    return f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}"


@SETTINGS
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(lrows)],
        "k INT, lts STRING, lid INT",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(rrows)] or [],
        "k INT, rts STRING, rid INT",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            payload=["rid"], right_order="rid",
        ).collect()
    }
    # brute force: max (s, rid) among right rows with same key, s <= left s
    want = {}
    for i, (k, s) in enumerate(lrows):
        cands = [(rs, j) for j, (rk, rs) in enumerate(rrows) if rk == k and rs <= s]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@SETTINGS
@given(lrows=left_rows, rrows=right_rows, salt=st.sampled_from([2, 4, 7]))
def test_asof_salted_equals_unsalted(spark, lrows, rrows, salt):
    """The skew hatch must be a pure physical rewrite: replicating the
    right side to every salt keeps each (key, salt) window complete, so
    salted output == unsalted output on any input."""
    left = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(lrows)],
        "k INT, lts STRING, lid INT",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(rrows)] or [],
        "k INT, rts STRING, rid INT",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    kw = dict(
        on="k", left_ts="lts", right_ts="rts",
        payload=["rid"], right_order="rid",
    )
    plain = {r["lid"]: r["rid"] for r in asof_join(left, right, **kw).collect()}
    salted = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, salt=salt, **kw).collect()
    }
    assert salted == plain


iv_rows = st.lists(st.tuples(sec, st.integers(0, 40)), min_size=0, max_size=10)


@SETTINGS
@given(lrows=left_rows, ivs=iv_rows, width=st.sampled_from([1, 13, 60]))
def test_interval_matches_bruteforce(spark, lrows, ivs, width):
    left = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(lrows)],
        "k INT, pts STRING, pid INT",
    ).withColumn("pts", F.col("pts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(j, _ts(s), _ts(min(s + d, 120))) for j, (s, d) in enumerate(ivs)] or [],
        "iv INT, sts STRING, ets STRING",
    ).withColumn("sts", F.col("sts").cast("timestamp")).withColumn(
        "ets", F.col("ets").cast("timestamp")
    )

    out = interval_join(left, intervals, "pts", "sts", "ets", width)
    got = sorted((r["pid"], r["iv"]) for r in out.collect())
    want = sorted(
        (i, j)
        for i, (_, s) in enumerate(lrows)
        for j, (ivs_s, d) in enumerate(ivs)
        if ivs_s <= s <= min(ivs_s + d, 120)
    )
    assert got == want


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5), min_size=2, max_size=12
    )
)
@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_fuzzy_ed1_equals_brute_levenshtein(spark, names):
    """Deletion-neighborhood blocking is COMPLETE and exact: over a
    tiny random alphabet (dense in near-collisions) the blocked join's
    pair set equals brute-force levenshtein <= 1 on every draw."""
    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark.operators.joins import fuzzy_self_join_ed1

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "id LONG, name STRING"
    )
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in fuzzy_self_join_ed1(df, "name", "id").collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r["a"], r["b"]): r["d"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).cast("int").alias("d"),
        )
        .where(F.col("d") <= 1)
        .collect()
    }
    assert got == brute
