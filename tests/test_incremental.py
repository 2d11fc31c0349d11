"""Incremental aggregate maintenance: merging batch summaries must
equal the from-scratch aggregate for ANY split of the fact rows, and
merging must be associative (merge of merges == one merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.operators.incremental import (
    aggregate_batch,
    merge_aggregates,
)

SPEC = {
    "n": ("count", ""),
    "s": ("sum", "v"),
    "mn": ("min", "v"),
    "mx": ("max", "v"),
}
KEYS = ["k"]


def _facts(spark):
    rows = [((i * 7) % 5, float(i % 13) - 6.0) for i in range(200)]
    rows += [(9, None)]  # all-NULL-measure group
    return spark.createDataFrame(rows, "k INT, v DOUBLE")


def _as_map(df):
    return {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in df.collect()
    }


def test_any_split_merges_to_full_aggregate(spark):
    facts = _facts(spark)
    full = _as_map(aggregate_batch(facts, KEYS, SPEC))
    for nparts in (2, 3, 5):
        parts = [
            aggregate_batch(
                facts.where(F.crc32(F.concat_ws(",", "k", "v")) % nparts == i),
                KEYS,
                SPEC,
            )
            for i in range(nparts)
        ]
        assert _as_map(merge_aggregates(parts, KEYS, SPEC)) == full, nparts


def test_merge_is_associative(spark):
    facts = _facts(spark)
    a = aggregate_batch(facts.where("k < 2"), KEYS, SPEC)
    b = aggregate_batch(facts.where("k >= 2 and k < 4"), KEYS, SPEC)
    c = aggregate_batch(facts.where("k >= 4"), KEYS, SPEC)
    ab_c = merge_aggregates(
        [merge_aggregates([a, b], KEYS, SPEC), c], KEYS, SPEC
    )
    abc = merge_aggregates([a, b, c], KEYS, SPEC)
    assert _as_map(ab_c) == _as_map(abc)


def test_merge_rejects_empty(spark):
    import pytest

    with pytest.raises(ValueError, match="nothing"):
        merge_aggregates([], KEYS, SPEC)
