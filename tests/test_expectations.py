"""Expectations gate on a crafted dirty dataset: every rule kind
catches exactly its planted violations."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.expectations import expect


def test_every_rule_kind_counts_planted_violations(spark):
    rows = [
        (1, 10.0, "A", "ok-1"),
        (2, -5.0, "A", "ok-2"),      # between violation
        (None, 10.0, "N", "ok-3"),   # not_null violation
        (4, 10.0, "X", "ok-4"),      # in_set violation
        (5, 10.0, "R", "bad id"),    # regex violation (space)
        (6, 10.0, "R", "ok-1"),      # unique violation (dup of row 1)
        (99, 10.0, "R", "ok-7"),     # fk violation (no parent 99)
    ]
    df = spark.createDataFrame(rows, "k LONG, q DOUBLE, f STRING, uid STRING")
    parents = spark.createDataFrame(
        [(i,) for i in [1, 2, 4, 5, 6]], "pk LONG"
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in expect(
            df,
            [
                ("not_null", "k"),
                ("between", "q", 0.0, 100.0),
                ("in_set", "f", ["A", "N", "R"]),
                ("regex", "uid", "^ok-[0-9]+$"),
                ("unique", "uid"),
                ("fk", "k", parents, "pk"),
            ],
        ).collect()
    }
    assert got == {
        "not_null:k": 1,
        "between:q": 1,
        "in_set:f": 1,
        "regex:uid": 1,  # "bad id"
        "unique:uid": 1,  # "ok-1" twice
        "fk:k": 1,  # only 99: a NULL FK is not_null's finding, not fk's
    }


def test_rules_validated(spark):
    df = spark.createDataFrame([(1,)], "k LONG")
    with pytest.raises(ValueError):
        expect(df, [])
    with pytest.raises(ValueError):
        expect(df, [("nope", "k")])


def test_fk_rule_null_contract(spark):
    """NULL FKs are not orphans (not_null's job); NULLs in the
    referenced column match nothing — and the count must not collapse
    to 0 the way a bare NOT IN would when either side has a NULL."""
    from mapreduce_kmeans_clustering_spark.operators.expectations import expect

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k INT"
    )
    parent = spark.createDataFrame([(1,), (2,), (None,)], "k INT")
    out = {
        r["rule"]: r["n_violations"]
        for r in expect(child, [("fk", "k", parent, "k")]).collect()
    }
    assert out == {"fk:k": 1}  # only 99 is an orphan
