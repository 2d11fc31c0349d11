"""Distributed skyline (Pareto frontier) over two criteria.

The skyline of a point set under (minimize x, maximize y) is the set
of points no other point dominates, where q dominates p iff
q.x <= p.x AND q.y >= p.y with at least one strict. The classic
multi-objective shortlist: "no part is both cheaper and larger",
"no supplier is both closer and better rated".

Spark-first shape (no UDF, no cross join):

1. Collapse to DISTINCT (x, y) pairs with carried aggregates — one
   hash aggregate. On distinct pairs, dominance loses its tie case:
   sort by (x ASC, y DESC) and a pair is dominated IFF some earlier
   row has y' >= y (earlier means x' < x, or x' == x with y' > y —
   either way a dominator). So the frontier test is one cumulative
   max over the sort, a single window.
2. Because skyline(S) = skyline(U skyline(S_i)) for any partition
   of S, a bucketed local pass prunes first: the same window
   partitioned by a hash bucket keeps only per-bucket frontiers, so
   the final global window — a single-task sort, the only
   non-partitioned step — sees Sum_i |skyline(S_i)|, not |distinct
   pairs|. For independently-drawn dims the expected frontier is
   O(log n) per bucket; the worst case — criteria that never trade
   off (price and size rising together puts every distinct pair on
   the frontier) — degrades to the distinct-pair count, which the
   local pass cannot shrink: that bound is inherent to the operator,
   not the plan.

Derived from the reference's theta-join posture (SURVEY §2.1 O14 —
inter-cluster pair scans at SilhouetteCoefficient1.java:60-78): the
reference materializes all pairs; here dominance is resolved by a
sort order, never a pairwise join. The brute-force NOT EXISTS form
exists only as the DuckDB oracle and the tests' oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SKYLINE_BUCKETS = 32


def _frontier_filter(df: DataFrame, min_col: str, max_col: str,
                     *parts: str) -> DataFrame:
    """Keep rows of DISTINCT-(min_col, max_col) relation that are on
    the Pareto frontier, optionally within partition columns."""
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(min_col).asc(), F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_best = F.max(max_col).over(w)
    return df.withColumn("_prev", prev_best).where(
        F.col("_prev").isNull() | (F.col("_prev") < F.col(max_col))
    ).drop("_prev")


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    aggs: list[Column] | None = None,
    buckets: int = SKYLINE_BUCKETS,
) -> DataFrame:
    """Pareto frontier under (minimize ``min_col``, maximize
    ``max_col``).

    Returns one row per frontier (min_col, max_col) pair with the
    carried ``aggs`` (defaults to ``count(*) AS n_rows``). Plan: one
    hash aggregate (distinct pairs) + one bucketed window (local
    frontiers) + one global window over the survivors.
    """
    if aggs is None:
        aggs = [F.count("*").cast("long").alias("n_rows")]
    pairs = df.groupBy(min_col, max_col).agg(*aggs)
    bucketed = pairs.withColumn(
        "_b",
        F.pmod(F.xxhash64(F.col(min_col), F.col(max_col)), F.lit(buckets)),
    )
    local = _frontier_filter(bucketed, min_col, max_col, "_b").drop("_b")
    return _frontier_filter(local, min_col, max_col)
