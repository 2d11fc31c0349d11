"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles moderate join skew automatically
(session.py turns it on), but a *hash aggregate* on a heavily skewed
key still funnels one key's rows into one task. The classic fix is
salting: phase 1 aggregates on (key, salt) — spreading each hot key
over `salt` tasks — phase 2 merges the partials on the key alone.
Correct for any algebraic aggregate whose partial and merge forms are
expressible (sum/count/min/max here; avg = sum+count then divide).

Only worth it on demonstrated skew: it doubles the shuffle count, so
it is an opt-in tool, not a default (see SCALE.md §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (phase-1 partial, phase-2 merge) per supported aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, op) with op in
    sum/count/min/max, e.g. ``{"n": ("*", "count"), "total": ("value",
    "sum")}``. The salt column is derived from a random-free spread —
    a hash of all non-key columns would not be deterministic across
    retries, so ``spark_partition_id()`` is used: rows of a hot key
    land in many input partitions, and partial aggregation then
    happens per (key, partition-group).
    """
    for op_col, (_, op) in aggs.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"unsupported op {op!r} for {op_col!r}")
    salted = df.withColumn("_salt", F.spark_partition_id() % salt)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[op][0](F.lit(1) if col == "*" and op == "count" else col).alias(
                f"_p_{out}"
            )
            for out, (col, op) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[op][1](f"_p_{out}").alias(out)
            for out, (col, op) in aggs.items()
        ]
    )


def salted_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """Per-key row counts through the salted path: (keys..., n)."""
    return salted_agg(df, keys, {"n": ("*", "count")}, salt)
