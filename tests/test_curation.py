"""Behavioral tests for corpus-curation operators (decontamination,
bigram-LM quality scoring, deterministic splitting)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.operators.curation import (
    SPLITS,
    bigram_lm_scores,
    contamination_report,
    doc_bigrams,
    split_assign,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),  # benchmark
        (1, "a quick brown fox jumps high today"),  # shares "quick brown fox..."
        (2, "completely different words entirely here now"),  # clean
        (3, "the quick brown cat"),  # shares "the quick brown"
        (4, "too short"),  # < 3 tokens -> no shingles, still reported
        (5, None),  # NULL text -> no shingles, still reported
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_contamination_flags_overlap(docs):
    rep = contamination_report(docs, F.col("doc_id") == 0, n=3)
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in rep.collect()}
    # every training doc reported, including no-shingle docs
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1][1] and got[1][0] >= 1  # "quick brown fox" + "brown fox jumps"
    assert got[3] == (1, True)  # exactly "the quick brown"
    assert got[2] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (0, False)


def test_bigram_lm_hand_check(spark):
    # corpus: "a b a b" (doc 0), "a c" (doc 1)
    # unigram counts: a=3, b=2, c=1 ; V=3
    # bigram counts: (a,b)=2, (b,a)=1, (a,c)=1
    df = spark.createDataFrame([(0, "a b a b"), (1, "a c")], "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert got[0]["n_bigrams"] == 3
    assert got[1]["n_bigrams"] == 1
    nll_ab = -math.log((2 + 1) / (3 + 3))  # c2=2, c1(a)=3, V=3
    nll_ba = -math.log((1 + 1) / (2 + 3))
    nll_ac = -math.log((1 + 1) / (3 + 3))
    assert got[0]["avg_nll"] == pytest.approx(
        round((2 * nll_ab + nll_ba) / 3, 6), abs=1e-6
    )
    assert got[1]["avg_nll"] == pytest.approx(round(nll_ac, 6), abs=1e-6)


def test_bigram_lm_drops_short_docs(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "single"), (2, ""), (3, None)],
        "doc_id LONG, text STRING",
    )
    ids = {r["doc_id"] for r in bigram_lm_scores(df).collect()}
    assert ids == {0}  # only the doc with >= 2 tokens gets a score


def test_doc_bigrams_multiplicity(spark):
    df = spark.createDataFrame([(0, "x y x y")], "doc_id LONG, text STRING")
    rows = doc_bigrams(df).collect()
    pairs = sorted((r["w1"], r["w2"]) for r in rows)
    assert pairs == [("x", "y"), ("x", "y"), ("y", "x")]  # occurrences, not distinct


def test_split_assign_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id LONG")
    a = {r["doc_id"]: (r["split"], r["shard"]) for r in split_assign(df).collect()}
    b = {r["doc_id"]: (r["split"], r["shard"]) for r in split_assign(df).collect()}
    assert a == b  # pure function of the id, no RNG
    splits = {v[0] for v in a.values()}
    assert splits == {"train", "val", "test"}
    # train dominates at the configured 98/1/1 thresholds
    n_train = sum(1 for v in a.values() if v[0] == "train")
    assert n_train / len(a) > 0.9
    assert all(0 <= v[1] < 8 for v in a.values())


def test_split_stable_under_growth(spark):
    # adding docs never moves an existing doc's split/shard
    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id LONG")
    big = spark.createDataFrame([(i,) for i in range(500)], "doc_id LONG")
    a = {r["doc_id"]: (r["split"], r["shard"]) for r in split_assign(small).collect()}
    b = {r["doc_id"]: (r["split"], r["shard"]) for r in split_assign(big).collect()}
    assert all(b[k] == v for k, v in a.items())
