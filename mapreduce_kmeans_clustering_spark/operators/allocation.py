"""Exact allocation operators: largest-remainder apportionment and
FIFO lot matching.

Both answer "who gets how much" questions with integer-exact
arithmetic — the class of query where a floating-point share times a
total silently fails to add up. House determinism recipe (SCALE.md
§5): stay in integer/DECIMAL until one final division.

Derived from the reference's single-pass aggregate posture (SURVEY
§2.1 O7-O8 — KMeansReducer.java:24-43 sums then divides once); the
allocation twist is that the *rounding* must be globally reconciled,
which the reference never needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def largest_remainder(
    weights: DataFrame,
    key_col: str,
    weight_col: str,
    total_units: int,
) -> DataFrame:
    """Hamilton / largest-remainder apportionment: split
    ``total_units`` indivisible units across keys proportionally to
    integer ``weight_col``, summing EXACTLY to ``total_units``.

    floor_units = (units * w) div W; the units lost to flooring
    (units - sum(floor)) go one each to the largest remainders
    (ties broken by key ascending — deterministic).

    Plan: one aggregate for W (1-row broadcast anchor, the house
    crossJoin(F.broadcast(...)) pattern — Catalyst constant-folds a
    literal-key join back into BNLJ, see tests/test_plans.py), one
    global rank window over K keys. K is the number of GROUPS (25
    nations, a few thousand shards), so the single-task rank sort is
    K-row, never corpus-sized; for huge K use the hash-priority
    TakeOrdered pattern (operators/sampling.py weight_priority).

    Bounds: weights must be positive integers; units * max(weight)
    must fit a long (both engines raise loudly on overflow — ANSI
    Spark and DuckDB alike — rather than silently diverging; rescale
    weights, e.g. cents -> whole units, before calling at the point
    that bound binds).
    """
    total = weights.agg(
        F.sum(F.col(weight_col).cast("long")).alias("_w_total")
    )
    staged = (
        weights.crossJoin(F.broadcast(total))
        .select(
            F.col(key_col),
            F.col(weight_col).cast("long").alias("_w"),
            F.col("_w_total"),
            (F.lit(int(total_units)) * F.col(weight_col).cast("long"))
            .alias("_num"),
        )
        .select(
            key_col,
            F.expr("_num div _w_total").alias("floor_units"),
            F.expr("_num % _w_total").alias("_rem"),
        )
    )
    wsum = Window.partitionBy()
    rank_w = Window.orderBy(F.col("_rem").desc(), F.col(key_col).asc())
    out = staged.select(
        key_col,
        "floor_units",
        "_rem",
        (F.lit(int(total_units)) - F.sum("floor_units").over(wsum)).alias(
            "_short"
        ),
        F.row_number().over(rank_w).alias("_rk"),
    )
    return out.select(
        key_col,
        F.col("floor_units").cast("long").alias("floor_units"),
        (F.col("_rk") <= F.col("_short")).cast("int").alias("got_extra"),
        (
            F.col("floor_units")
            + (F.col("_rk") <= F.col("_short")).cast("long")
        ).alias("units"),
    )


def fifo_match(
    lots: DataFrame,
    demands: DataFrame,
    key_col: str,
    seq_cols: list[str],
    qty_col: str,
) -> DataFrame:
    """FIFO matching: per key, demand quantities consume lot
    quantities strictly in ``seq_cols`` order (first-in-first-out) —
    the inventory-costing / lot-attribution primitive.

    Formulation: cumulative sums place each lot at the half-open
    integer interval [cum - qty, cum) on the key's supply axis and
    each demand likewise on the demand axis; FIFO consumption is
    EXACTLY interval overlap:

        matched(l, d) = max(0, min(l.hi, d.hi) - max(l.lo, d.lo))

    Plan: one window cumsum per side (partitioned by key — no global
    sort), then an equi-join ON KEY with the overlap predicate as a
    residual filter — shuffle-hash on the key, never a
    BroadcastNestedLoop (the interval_join lesson, joins.py:138).
    Output size is bounded: FIFO overlap is an ordered merge, at most
    n_lots + n_demands - 1 matched pairs per key.

    Quantities must be integral (cast to long); fractional
    quantities would reintroduce float cumsum drift. Non-positive
    quantities are DROPPED before interval construction: a zero
    quantity is an empty interval (it can match nothing, but its
    zero-width endpoints would still satisfy the strict overlap
    predicate and emit matched_qty=0 pairs past the n+m-1 bound),
    and a negative one would corrupt every later interval on its
    key's axis.
    """
    def cum(df: DataFrame, side: str) -> DataFrame:
        w = (
            Window.partitionBy(key_col)
            .orderBy(*[F.col(c).asc() for c in seq_cols])
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        q = F.col(qty_col).cast("long")
        return df.where(q > 0).select(
            F.col(key_col),
            F.concat_ws("|", *[F.col(c).cast("string") for c in seq_cols])
            .alias(f"{side}_seq"),
            q.alias(f"{side}_qty"),
            (F.sum(q).over(w) - q).alias(f"{side}_lo"),
            F.sum(q).over(w).alias(f"{side}_hi"),
        )
    L = cum(lots, "lot")
    D = cum(demands, "dem").withColumnRenamed(key_col, f"_{key_col}_d")
    joined = L.join(
        D,
        (F.col(key_col) == F.col(f"_{key_col}_d"))
        & (F.col("dem_lo") < F.col("lot_hi"))
        & (F.col("lot_lo") < F.col("dem_hi")),
    )
    return joined.select(
        key_col,
        "lot_seq",
        "dem_seq",
        (
            F.least("lot_hi", "dem_hi") - F.greatest("lot_lo", "dem_lo")
        ).alias("matched_qty"),
    )
