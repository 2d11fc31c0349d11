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


def cusum_daily(
    events: DataFrame,
    rel_slack: str = "0.02",
    rel_threshold: str = "0.10",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Two-sided CUSUM changepoint statistics over per-key daily value
    totals (Page 1954) — the mean-shift monitor a metrics pipeline
    runs where the rolling z-score (q_events_anomaly) watches single
    days: CUSUM accumulates small sustained drifts that never trip a
    per-day threshold.

        S+_t = max(0, S+_{t-1} + (x_t − μ − k)),  alarm at S+ > h
        S-_t symmetric; k = rel_slack·μ, h = rel_threshold·n·μ —
        RELATIVE thresholds, so the statistic is scale-free (daily
        totals grow ~100× from sf0.001 to sf0.1). h is
        volume-relative ("cumulative excursion exceeds 10% of the
        key's total volume"), the batch drift-gate reading; the
        output cusum columns are S/μ — excursion in units of the
        per-key daily mean.

    The max-reset recursion is solved in closed form so the whole
    thing is two windows, no iteration:

        C_t = Σ_{j≤t} y_j;  S+_t = C_t − min(0, min_{j≤t} C_j)

    Engine-exact by construction: every intermediate is DECIMAL. The
    recursion is multiplied through by n (the per-key day count), so
    μ never appears as a division — y'_t = n·x_t − (1+α)·Σx is exact
    decimal arithmetic, associative in ANY window evaluation order
    (Spark's running fold vs DuckDB's segment tree), and the alarm
    compare S'+ > β·Σx is exact. Division happens once, in the
    rounded double output (cusum columns are in units of the per-key
    mean). Key-partitioned windows only — no global sort; the daily
    aggregate is the single corpus-scale shuffle.
    """
    from pyspark.sql.window import Window

    daily = (
        events.groupBy(
            key_col, F.date_trunc("day", F.col(ts_col)).alias("day")
        )
        .agg(F.sum(F.col(value_col).cast("decimal(18,4)")).alias("x"))
    )
    part = Window.partitionBy(key_col)
    seq = part.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    alpha = F.lit(rel_slack).cast("decimal(6,4)")
    n = F.count("*").over(part).cast("decimal(10,0)")
    s = F.sum("x").over(part)
    # alarm threshold in the n-scaled domain: S > β·n·μ ⟺ S' > β·n·s.
    # Computed in double (left-assoc, identical literals) so no
    # decimal precision clamp can perturb it; every operand is an
    # exact double cast of an exact decimal.
    h = (
        F.lit(float(rel_threshold))
        * n.cast("double")
        * s.cast("double")
    )
    base = daily.select(
        key_col,
        "day",
        "x",
        (n * F.col("x") - (F.lit(1).cast("decimal(2,0)") + alpha) * s).alias("yp"),
        ((F.lit(1).cast("decimal(2,0)") - alpha) * s - n * F.col("x")).alias("yn"),
        h.alias("h"),
        s.alias("s"),
    )
    cp = F.sum("yp").over(seq)
    cn = F.sum("yn").over(seq)
    scored = base.select(
        key_col,
        "day",
        "x",
        "h",
        "s",
        cp.alias("cp"),
        cn.alias("cn"),
    ).select(
        key_col,
        "day",
        "x",
        "h",
        "s",
        (F.col("cp") - F.least(F.lit(0), F.min("cp").over(seq))).alias("sp"),
        (F.col("cn") - F.least(F.lit(0), F.min("cn").over(seq))).alias("sn"),
    )
    return scored.select(
        key_col,
        "day",
        F.round(F.col("x").cast("double"), 4).alias("total"),
        F.round(F.col("sp").cast("double") / F.col("s").cast("double"), 6).alias(
            "cusum_pos"
        ),
        F.round(F.col("sn").cast("double") / F.col("s").cast("double"), 6).alias(
            "cusum_neg"
        ),
        (F.col("sp").cast("double") > F.col("h")).alias("alarm_pos"),
        (F.col("sn").cast("double") > F.col("h")).alias("alarm_neg"),
    )


def woe_iv(
    df: DataFrame,
    bin_col: Column | str,
    bad_col: Column | str,
) -> DataFrame:
    """Weight-of-evidence / information-value profile of a binned
    feature against a binary target — the classic scorecard diagnostic
    for "does this feature separate the classes, and monotonically?".

    Per bin: ``woe = ln((bad/bad_tot) / (good/good_tot))`` and the IV
    contribution ``(bad/bad_tot - good/good_tot) * woe``. All counts
    are exact BIGINTs from one hash aggregate; the 1-row class totals
    come back via the broadcast-anchor crossJoin (house scalar
    pattern), so each woe is ONE ln of a ratio of integer products and
    each iv term multiplies the grid-snapped woe — deterministic
    cross-engine up to the 1e-6 half-up grid. Bins where either class
    count is zero get NULL woe/iv (undefined, flagged not faked).

    Plan: aggregate(bin) -> broadcast anchor -> projection. One
    shuffle on the bin key; bin cardinality is assumed profile-sized
    (<= thousands), the normal regime for scorecard features.
    Output: (bin, n_good, n_bad, woe_q6, iv_q6) sorted by bin.
    """
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    t = F.col(bad_col) if isinstance(bad_col, str) else bad_col
    per = df.select(b.alias("bin"), t.cast("int").alias("__bad")).groupBy(
        "bin"
    ).agg(
        F.sum(F.lit(1) - F.col("__bad")).cast("long").alias("n_good"),
        F.sum("__bad").cast("long").alias("n_bad"),
    )
    tot = per.agg(
        F.sum("n_good").cast("long").alias("__gt"),
        F.sum("n_bad").cast("long").alias("__bt"),
    )
    q6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    woe = F.when(
        (F.col("n_good") > 0) & (F.col("n_bad") > 0),
        q6(
            F.log(
                (F.col("n_bad") * F.col("__gt")).cast("double")
                / (F.col("n_good") * F.col("__bt")).cast("double")
            )
        ),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_good",
            "n_bad",
            woe.alias("woe_q6"),
            q6(
                (
                    F.col("n_bad") / F.col("__bt")
                    - F.col("n_good") / F.col("__gt")
                )
                * woe
            ).alias("iv_q6"),
        )
        .orderBy("bin")
    )


def binary_auc(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    score_decimals: int = 4,
) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean label via the
    Mann-Whitney rank statistic, computed entirely in integer
    arithmetic so both engines agree bit-for-bit:

        2U = Σ over distinct score values v of
             n_pos(v) · (2·cum_neg(<v) + n_neg(v))
        AUC = 2U / (2·N_pos·N_neg)        (ties count half)

    The score is snapped to its ``score_decimals`` grid first
    (``floor(s·10^d + 0.5)`` — the shared half-up recipe, exact when
    the score already lives on that grid, as every registered
    classifier score does). The only ordered window runs over the
    DISTINCT grid values — the q_length_ks discipline: window size is
    the score grid's cardinality, not the row count, so a 100 TB
    corpus still windows over at most ~10^d·range values. One hash
    aggregate on the grid key, one bounded window, one 1-row final
    aggregate; the single division is the last step.

    Output: one row (n_pos, n_neg, u2, auc) — auc on the half-up 6-dp
    grid; NULL auc when either class is empty (undefined, and NULL is
    safe in a single-row frame).

    All rank arithmetic runs in DECIMAL(38,0) (ADVICE r8): the long
    form ``u2 * 2000000`` wraps BIGINT once n_pos·n_neg exceeds
    ~2.3e12 (≈1.5 M rows per class — squarely in-corpus at 100 TB),
    and 2U itself can reach 2·n_pos·n_neg ≈ n²/2. DECIMAL(38,0)
    holds ~1e38, safe past 1e15 rows per class. The reported ``u2``
    column stays BIGINT for schema continuity via ``try_cast`` — it
    NULLs beyond long range on both engines (Spark 4's default ANSI
    mode makes a plain decimal→long cast THROW there, and DuckDB's
    plain ``::BIGINT`` throws OutOfRange; ADVICE r9); ``auc`` is
    exact at every magnitude.
    """
    from pyspark.sql.window import Window

    scale = 10**score_decimals
    g = (
        scored.select(
            F.floor(
                F.col(score_col) * F.lit(float(scale)) + F.lit(0.5)
            ).alias("q"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("q")
        .agg(
            F.sum("y").cast("long").alias("n1"),
            F.sum(1 - F.col("y")).cast("long").alias("n0"),
        )
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    per = g.select(
        "n1",
        "n0",
        F.coalesce(F.sum("n0").over(w), F.lit(0)).alias("cum0"),
    )
    tot = per.agg(
        F.sum("n1").cast("long").alias("n_pos"),
        F.sum("n0").cast("long").alias("n_neg"),
        F.sum(
            F.col("n1").cast("decimal(38,0)")
            * (2 * F.col("cum0") + F.col("n0"))
        )
        .cast("decimal(38,0)")
        .alias("u2d"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.expr(
            "(u2d * 2000000 + 2 * cast(n_pos as decimal(38,0)) * n_neg)"
            " div (4 * cast(n_pos as decimal(38,0)) * n_neg)"
        )
        / F.lit(1e6),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        # try_cast: under Spark 4's default ANSI mode a plain
        # decimal->long cast THROWS CAST_OVERFLOW past int64 (it does
        # not wrap or null); try_cast reports NULL, and the DuckDB
        # oracle mirrors it with TRY_CAST(u2h AS BIGINT) (ADVICE r9)
        F.col("u2d").try_cast("long").alias("u2"),
        auc.alias("auc"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability diagram for a score already living on a known
    [lo, hi] range: fixed-width bins (no data-dependent cutpoints, so
    the binning is scan-local and engine-exact), per bin the count,
    the mean score (6-dp half-up integer division of the summed 6-dp
    grid scores) and the empirical positive rate (same recipe). The
    curve a score owner reads before trusting ``keep = score ≥ t``.
    One projection + one hash aggregate."""
    span = hi - lo
    b = F.least(
        F.lit(n_bins - 1),
        F.floor(
            (F.col(score_col) - F.lit(lo)) / F.lit(span) * F.lit(n_bins)
        ).cast("int"),
    )
    q6 = F.floor(F.col(score_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    g = (
        scored.select(
            b.alias("bin"),
            q6.alias("s_q6"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("s_q6").alias("sum_s_q6"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    return g.select(
        "bin",
        "n",
        (F.expr("(sum_s_q6 * 2 + n) div (2 * n)") / F.lit(1e6)).alias(
            "mean_score"
        ),
        (F.expr("(n_pos * 2000000 + n) div (2 * n)") / F.lit(1e6)).alias(
            "pos_rate"
        ),
    ).orderBy("bin")
