"""Snapshot diff: change classification, digest order-independence,
and Merkle-bucket damage localization."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.operators.diff import (
    bucket_digests,
    digest48,
    row_fingerprint,
    snapshot_diff,
)

SCHEMA = "id long, v string, w long"
BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40), (5, "e", 50)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_classifies_added_removed_changed(spark):
    a = _mk(spark, BASE)
    b = _mk(
        spark,
        [
            (1, "a", 10),          # unchanged
            (2, "B", 20),          # changed (v)
            (3, "c", 31),          # changed (w)
            (5, "e", 50),          # unchanged; 4 removed
            (6, "f", 60),          # added
        ],
    )
    got = {
        r["id"]: r["change"]
        for r in snapshot_diff(a, b, ["id"], ["v", "w"]).collect()
    }
    assert got == {2: "changed", 3: "changed", 4: "removed", 6: "added"}


def test_unchanged_rows_never_surface(spark):
    a = _mk(spark, BASE)
    assert snapshot_diff(a, a, ["id"], ["v", "w"]).count() == 0


def test_null_values_fingerprint_distinctly(spark):
    # null vs empty string vs the literal sentinel must all differ
    a = _mk(spark, [(1, None, 10)])
    b = _mk(spark, [(1, "", 10)])
    assert (
        snapshot_diff(a, b, ["id"], ["v", "w"]).collect()[0]["change"]
        == "changed"
    )


def test_digests_are_order_independent(spark):
    rows = [(i, f"v{i}", i * 3) for i in range(200)]
    a = _mk(spark, rows).repartition(7)
    b = _mk(spark, list(reversed(rows))).repartition(3)
    da = sorted(map(tuple, bucket_digests(a, ["id"], ["v", "w"], 16).collect()))
    db = sorted(map(tuple, bucket_digests(b, ["id"], ["v", "w"], 16).collect()))
    assert da == db


def test_single_edit_flips_exactly_one_bucket(spark):
    rows = [(i, f"v{i}", i * 3) for i in range(200)]
    edited = [(i, f"v{i}", i * 3 if i != 137 else 999) for i in range(200)]
    da = {r["bucket"]: (r["n_rows"], r["digest"])
          for r in bucket_digests(_mk(spark, rows), ["id"], ["v", "w"], 16).collect()}
    db = {r["bucket"]: (r["n_rows"], r["digest"])
          for r in bucket_digests(_mk(spark, edited), ["id"], ["v", "w"], 16).collect()}
    differ = {k for k in da if da[k] != db.get(k)}
    # the key set is identical, so bucket membership and counts agree;
    # only the edited key's bucket digest moves
    assert len(differ) == 1
    key_bucket = (
        _mk(spark, rows)
        .where(F.col("id") == 137)
        .select(F.pmod(digest48(row_fingerprint(["id"])), F.lit(16)).alias("b"))
        .collect()[0]["b"]
    )
    assert differ == {key_bucket}


def test_value_edit_keeps_bucket_assignment(spark):
    # buckets hash the KEY fingerprint only: an edited value must not
    # migrate the row to another bucket (counts stay equal everywhere)
    rows = [(i, f"v{i}", i) for i in range(100)]
    edited = [(i, f"x{i}", i) for i in range(100)]
    na = {r["bucket"]: r["n_rows"]
          for r in bucket_digests(_mk(spark, rows), ["id"], ["v", "w"], 8).collect()}
    nb = {r["bucket"]: r["n_rows"]
          for r in bucket_digests(_mk(spark, edited), ["id"], ["v", "w"], 8).collect()}
    assert na == nb


def test_bucket_digests_survive_wide_buckets_no_long_overflow(spark):
    """Round-11 ×100 sweep regression: a plain long sum of 48-bit
    digests overflows (ANSI: throws ARITHMETIC_OVERFLOW) once a bucket
    holds ~2^15 rows — sf10-equivalent orders already got there. The
    digest is now the DECIMAL-accumulated sum folded mod 2^48: exact
    at any bucket width, still order-independent, still a long."""
    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark.operators.diff import (
        bucket_digests,
    )

    n = 70_000  # sum of ~2^47-avg digests over 70k rows passes 2^63
    df = spark.range(n).select(
        F.col("id"), F.lit("v").alias("v")
    )
    out = bucket_digests(df, ["id"], ["v"], 1).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_rows"] == n
    assert 0 <= row["digest"] < (1 << 48)
    # order independence survives the fold: reversed input, same digest
    rev = bucket_digests(
        df.orderBy(F.col("id").desc()), ["id"], ["v"], 1
    ).collect()[0]
    assert rev["digest"] == row["digest"]
