"""Behavioral tests for per-key capping and TF-IDF term ranking."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.operators.curation import tfidf_top_terms
from mapreduce_kmeans_clustering_spark.operators.sampling import cap_per_key


def test_cap_per_key_limits_and_determinism(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    capped = cap_per_key(df, "source", 5)
    counts = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in cap_per_key(df, "source", 5).collect())
    assert a == b  # kept set is a pure function of the data


def test_cap_per_key_under_cap_passthrough(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id LONG, source STRING")
    got = sorted(r["doc_id"] for r in cap_per_key(df, "source", 10).collect())
    assert got == [1, 2, 3]


def test_cap_per_key_stable_under_growth(spark):
    # a doc kept from a small corpus stays kept when more docs hash AFTER it
    df1 = spark.createDataFrame([(i, "a") for i in range(10)], "doc_id LONG, source STRING")
    kept1 = {r["doc_id"] for r in cap_per_key(df1, "source", 10).collect()}
    assert kept1 == set(range(10))  # under cap: all stay


def test_tfidf_hand_check(spark):
    # doc 0: "apple apple banana"; doc 1: "banana cherry"
    # N=2; df(apple)=1, df(banana)=2, df(cherry)=1
    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry")], "doc_id LONG, text STRING"
    )
    rows = tfidf_top_terms(df, k=3).collect()
    got = {(r["doc_id"], r["term"]): (r["tf"], r["tfidf"], r["rank"]) for r in rows}
    ln2 = math.log(2.0)
    assert got[(0, "apple")] == (2, pytest.approx(round(2 * ln2, 6)), 1)
    assert got[(0, "banana")] == (1, pytest.approx(0.0), 2)  # ln(2/2) = 0
    assert got[(1, "cherry")] == (1, pytest.approx(round(ln2, 6)), 1)
    assert got[(1, "banana")] == (1, pytest.approx(0.0), 2)


def test_tfidf_k_cut_and_tie_break(spark):
    # four equal-score terms -> rank by term string, keep k=2
    df = spark.createDataFrame([(0, "dd cc bb aa")], "doc_id LONG, text STRING")
    rows = tfidf_top_terms(df, k=2).collect()
    assert sorted(r["term"] for r in rows) == ["aa", "bb"]
    assert {r["rank"] for r in rows} == {1, 2}


# ---------------------------------------------------------------------------
# Property tests: operators must match their plain-Python definitions
# ---------------------------------------------------------------------------

import hashlib
import math as _math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

_corpus = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=10
)


@given(_corpus, st.integers(min_value=1, max_value=4))
@_SETTINGS
def test_cap_per_key_matches_python(spark, texts, cap):
    rows = [(i, f"s{i % 2}") for i in range(len(texts))]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    got = sorted(r["doc_id"] for r in cap_per_key(df, "source", cap).collect())
    by_key: dict[str, list[int]] = {}
    for i, src in rows:
        by_key.setdefault(src, []).append(i)
    expected = sorted(
        i
        for ids in by_key.values()
        for i in sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[:cap]
    )
    assert got == expected


@given(_corpus)
@_SETTINGS
def test_tfidf_matches_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
        for r in tfidf_top_terms(df, k=1000).collect()
    }
    n = len(texts)
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in enumerate(texts)}
    tf = {(i, t): c for i, ts in toks.items() for t, c in Counter(ts).items()}
    dfreq = Counter(t for (_, t) in tf)
    expected = {
        (i, t): (c, round(c * _math.log(n / dfreq[t]), 6)) for (i, t), c in tf.items()
    }
    assert got.keys() == expected.keys()
    for k_ in got:
        assert got[k_][0] == expected[k_][0]
        assert got[k_][1] == pytest.approx(expected[k_][1], abs=1e-9)
