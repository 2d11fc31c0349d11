"""Incremental aggregate maintenance — the continuous-rollup pattern:
keep a materialized per-key aggregate table and fold each new batch in
by MERGING summaries, never rescanning the historical fact.

This is the shape that matters at 100 TB: a daily rollup over an
append-only fact should cost O(batch) + O(aggregate), not O(history).
It works exactly when every measure is a mergeable summary — sum,
count, min, max here (avg is derived sum/count downstream;
distinct-ish measures ride the mergeable sketches in
``functions/sketch.py`` — KMV keeps min-hashes, CMS adds counters).

``merge_aggregates`` is deliberately just union→groupBy: Spark plans
it as one hash aggregate with map-side partial merge, and the same
code path serves base+delta, shard merges, and multi-day compaction
(associativity/commutativity is the whole contract — pinned by
property test and by an oracle query that checks merged-vs-full
recompute equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # a count column merges by SUMMING the counts
    "min": F.min,
    "max": F.max,
}


def aggregate_batch(
    df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Build the summary table for one batch of fact rows.

    spec: output_col -> (kind, input_col) where kind in
    {sum, count, min, max}; count ignores input_col.
    """
    aggs = []
    for out, (kind, col) in spec.items():
        if kind == "count":
            aggs.append(F.count("*").cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(col).alias(out))
        elif kind in ("min", "max"):
            aggs.append(getattr(F, kind)(col).alias(out))
        else:
            raise ValueError(f"unmergeable aggregate kind: {kind!r}")
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    parts: list[DataFrame], keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge summary tables built by ``aggregate_batch`` (any number,
    any grouping of the underlying rows). One union + one hash
    aggregate; by mergeability the result equals ``aggregate_batch``
    over the concatenated facts."""
    if not parts:
        raise ValueError("nothing to merge")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    aggs = [
        MERGE_FNS[kind](out).alias(out) for out, (kind, _) in spec.items()
    ]
    # count columns re-sum to long; min/max/sum keep their input types
    out_df = merged.groupBy(*keys).agg(*aggs)
    casts = [
        F.col(out).cast("long").alias(out) if kind == "count" else F.col(out)
        for out, (kind, _) in spec.items()
    ]
    return out_df.select(*keys, *casts)
