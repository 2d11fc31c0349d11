"""Single-pass column profiling — the data-quality gate a pipeline
runs before training on a new drop: row/null/distinct counts plus
numeric ranges per column, as one DataFrame.

Shape: ONE wide aggregate row over one scan (Catalyst plans the
multi-DISTINCT via Expand — n_cols copies of the projected row, still
a single pass over the files, partial→final), then an unpivot
(``stack``) to long (column, metrics) form. Nothing touches the
driver except the final n_cols-row result.

At 100 TB exact distinct counts are the expensive part (Expand
multiplies shuffle volume by the column count); ``approx=True`` swaps
in HyperLogLog ``approx_count_distinct`` which aggregates without
Expand. The exact form is the oracle-checkable default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def column_profile(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Profile ``cols`` of ``df``: one output row per column with
    n_rows, n_null, n_distinct (exact by default), and min/max cast to
    double for numeric columns (NULL for non-numeric — lexicographic
    string ranges are rarely what a pipeline wants to gate on)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        ).cast("long")
        aggs.append(F.count(c).cast("long").alias(f"__nn_{c}"))
        aggs.append(nd.alias(f"__nd_{c}"))
        if isinstance(df.schema[c].dataType, NumericType):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_null, n_distinct, min_val, max_val)",
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def source_unigram_kl(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source unigram KL divergence against the whole-corpus token
    distribution — the distribution-drift gate a training-mix report
    runs per source/drop: KL(s) = sum_t p_s(t) * ln(p_s(t) / p_c(t)),
    0 means "this source looks like the corpus", large means a skewed
    or off-domain vocabulary. Always finite: every source token is by
    construction part of the corpus distribution (p_c(t) > 0 wherever
    p_s(t) > 0), so no smoothing is needed.

    Shuffle inventory: one (source, token) count aggregate off the
    token stream (map-side combine collapses the Zipf head), a
    vocabulary-keyed equi-join of per-source counts against corpus
    counts, a broadcast of the S-row source totals and the 1-row
    corpus total, then an S-row final aggregate. Nothing pairwise,
    nothing driver-side; work scales with |vocabulary|, not corpus."""
    from mapreduce_kmeans_clustering_spark.operators.text import tokens

    t = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    c = t.groupBy("source", "tok").agg(
        F.count("*").cast("double").alias("n_st")
    )
    s = c.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    g = c.groupBy("tok").agg(F.sum("n_st").alias("n_t"))
    tot = c.agg(F.sum("n_st").alias("n"))
    p_s = F.col("n_st") / F.col("n_s")
    p_c = F.col("n_t") / F.col("n")
    return (
        c.join(g, "tok")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl"),
        )
    )


def length_ks_pairs(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on the token-length
    distribution for every source pair — "did source B's length
    profile drift from source A's?", the nonparametric gate that
    doesn't assume any distribution shape.

    Signed-mass formulation (the scale-right one): reduce each source
    to its (length, count) histogram, attach every pair (a < b), and
    give each histogram row mass +n/n_a on the a-side and -n/n_b on
    the b-side. The running sum of that mass ordered by length IS
    E_a(l) - E_b(l) at each observed point, so
    KS = max |running sum|. One histogram aggregate (|lengths| rows
    per source, never per-doc), a broadcast join against the P-row
    pair list, and one ordered window per pair: O(P * |lengths|)
    total, independent of corpus row count past the histogram.

    Determinism: each per-length mass is one IEEE division (or the sum
    of exactly two — commutative), and the running sum is evaluated in
    the window's total order (length asc), so both engines add the
    same doubles in the same sequence; ties cannot reorder it."""
    from mapreduce_kmeans_clustering_spark.operators.text import token_count

    lens = docs.select(
        F.col(source_col).alias("source"),
        token_count(F.col(text_col)).cast("long").alias("l"),
    )
    c = lens.groupBy("source", "l").agg(F.count("*").cast("double").alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("ns"))
    pairs = (
        tot.alias("a")
        .crossJoin(tot.alias("b"))
        .where(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.ns").alias("na"),
            F.col("b.ns").alias("nb"),
        )
    )
    a_side = c.join(
        F.broadcast(pairs), F.col("source") == F.col("source_a")
    ).select(
        "source_a", "source_b", "na", "nb", "l", (F.col("n") / F.col("na")).alias("d")
    )
    b_side = c.join(
        F.broadcast(pairs), F.col("source") == F.col("source_b")
    ).select(
        "source_a", "source_b", "na", "nb", "l", (-F.col("n") / F.col("nb")).alias("d")
    )
    from pyspark.sql import Window

    u = (
        a_side.unionByName(b_side)
        .groupBy("source_a", "source_b", "na", "nb", "l")
        .agg(F.sum("d").alias("d"))
    )
    w = (
        Window.partitionBy("source_a", "source_b")
        .orderBy("l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("ecdf_gap", F.sum("d").over(w))
        .groupBy("source_a", "source_b")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.round(F.max(F.abs(F.col("ecdf_gap"))), 6).alias("ks"),
        )
    )
