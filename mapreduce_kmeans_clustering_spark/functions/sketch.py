"""KMV (k-minimum-values) distinct-count sketch.

`approx_count_distinct` (HyperLogLog++) is the built-in fast path, but
its estimates are engine-specific — useless under a cross-engine value
oracle. KMV is the determinism-friendly alternative: hash every value
to a uniform point in [0, 1), keep the k smallest distinct hashes, and
estimate |D| = (k-1) / h_(k) (Bar-Yossef et al., RANDOM 2002). With a
fixed hash (md5) the estimate is a pure function of the value set, so
Spark and DuckDB produce bit-identical doubles.

Scale shape: distinct-reduce on (group, value) — the same shuffle an
exact count-distinct needs — then a per-group sort limited to k rows
via row_number. At 100 TB the second stage moves only k rows per group
(the first stage's map-side partial distinct already collapses
duplicates), so the sketch's win over exact counting is the tiny
final aggregate, and its real use is as a mergeable per-partition
summary. The hot path stays in whole-stage codegen: md5 → 13-hex-char
prefix → 52-bit integer → double in [0, 1) are all built-in exprs.

DuckDB twin of the hash (keep shapes identical, SURVEY registry rule):
  ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 13))::BIGINT / 4503599627370496.0
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: exactly representable in a double, so the
# normalization divides two exact integers and both engines agree.
_HEX_CHARS = 13
_SCALE = float(1 << 52)


def kmv_hash(col: Column | str) -> Column:
    """Uniform double in [0, 1) from the value's md5 prefix."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX_CHARS), 16, 10)
    return h.cast("double") / F.lit(_SCALE)


def kmv_distinct(
    df: DataFrame, groups: list[str], value: str, k: int = 64, salt_buckets: int = 16
) -> DataFrame:
    """Per-group approximate distinct count of ``value``.

    Output: groups + (n_kept INT, est_distinct DOUBLE). Groups holding
    fewer than k distinct values return the exact count (the sketch is
    the whole set), so small groups are never approximated badly.

    The global k smallest hashes per group are found in two stages:
    k-minima per (group, salt) first, then k-minima over the
    ``k * salt_buckets`` survivors. The union of per-salt k-minima is a
    superset of the global k-minima for any deterministic salt, so the
    result is bit-identical to the single-sort plan — but the big sort
    runs ``salt_buckets``-way parallel per group instead of funneling
    every distinct value of a group through one task. The salt reuses
    md5 hex chars disjoint from the estimate's prefix; correlation is
    irrelevant (salting only partitions the value set)."""
    hashed = (
        df.select(*groups, F.col(value).alias("__v"))
        .distinct()
        .withColumn("__h", kmv_hash("__v"))
    )
    if salt_buckets > 1:
        salt = (
            F.conv(F.substring(F.md5(F.col("__v").cast("string")), 30, 3), 16, 10)
            .cast("int")
            % salt_buckets
        )
        w1 = Window.partitionBy(*groups, "__salt").orderBy("__h")
        hashed = (
            hashed.withColumn("__salt", salt)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .drop("__salt", "__r1")
        )
    w = Window.partitionBy(*groups).orderBy("__h")
    topk = hashed.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    return topk.groupBy(*groups).agg(
        F.count("*").cast("int").alias("n_kept"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.max("__h")
            ),
            4,
        ).alias("est_distinct"),
    )


def histogram_quantiles(
    df: DataFrame,
    value: str,
    qs: list[float],
    lo: float,
    hi: float,
    buckets: int = 100,
    groups: list[str] | None = None,
) -> DataFrame:
    """Single-pass fixed-width-histogram quantile estimates — the
    deterministic, mergeable alternative to ``percentile_approx``
    (whose Greenwald-Khanna sketch is engine-specific and
    merge-order-dependent, so a cross-engine oracle can't replay it).

    One hash aggregate builds the (group, bucket) counts — partial→
    final, at most ``buckets`` keys per group ever shuffle — then a
    cumulative window over ≤``buckets`` rows per group interpolates
    each requested quantile inside its covering bucket:

        est = lo + width * (bucket + (q*total - cum_prev) / n_bucket)

    Error is bounded by the bucket width (exact counts, linear
    interpolation within one bucket); the counts table is a mergeable
    summary (sum counts across shards/days, re-derive quantiles).
    All arithmetic is integer-derived doubles combined in a fixed
    order, so Spark and the DuckDB oracle agree bit-for-bit.

    Edge contract: quantiles must lie in (0, 1] — q<=0 raises
    (the covering-bucket predicate ``cum_prev < q*total`` has no
    solution at q=0, which would silently drop the row); NULL values
    are excluded before bucketing (they'd otherwise form a spurious
    bucket that inflates ``total``, ordered differently by engine).
    """
    bad = [q for q in qs if not 0.0 < q <= 1.0]
    if bad:
        raise ValueError(
            f"quantiles must be in (0, 1], got {bad}; "
            "q=0.0 is the min — read it off the first bucket directly"
        )
    groups = groups or []
    width = (hi - lo) / buckets
    b = F.least(
        F.lit(buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col(value) - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    counts = (
        df.where(F.col(value).isNotNull())
        .groupBy(*groups, b.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    wspec = Window.partitionBy(*groups).orderBy("bucket")
    tspec = Window.partitionBy(*groups)
    c = counts.withColumn("cum", F.sum("n").over(wspec)).withColumn(
        "total", F.sum("n").over(tspec)
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    j = c.crossJoin(F.broadcast(qdf)).withColumn("qt", F.col("q") * F.col("total"))
    est = F.lit(lo) + F.lit(width) * (
        F.col("bucket") + (F.col("qt") - (F.col("cum") - F.col("n"))) / F.col("n")
    )
    return (
        j.where((F.col("cum") >= F.col("qt")) & ((F.col("cum") - F.col("n")) < F.col("qt")))
        .select(*groups, "q", F.round(est, 6).alias("est"))
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(col: Column | str, row: int, width: int) -> Column:
    """Row ``row``'s md5-derived bucket for a value — the fixed hash
    family that makes the sketch replayable cross-engine. DuckDB twin:
    ('0x' || substr(md5('cms{row}:' || v), 1, 8))::BIGINT % width."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def cms_counts(
    df: DataFrame,
    value: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch as a (row, bucket, cnt) table — depth*width
    counters no matter how many distinct values flow through, and
    MERGEABLE: union the tables and re-sum to combine shards/days.

    One explode (depth rows per input row) + one hash aggregate whose
    partial step collapses to <= depth*width counters per map task —
    the bounded-memory frequency summary for a key domain too large
    to count exactly (think raw URLs at 100 TB)."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"), cms_bucket(value, d, width).alias("b")
                )
                for d in range(depth)
            ]
        )
    ).alias("rb")
    return (
        df.select(rows)
        .select("rb.d", "rb.b")
        .groupBy("d", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each key's frequency: min over the depth rows of
    its counters (classic CMS — never underestimates, overestimates by
    collision mass ~ n/width per row). Equi-join on (d, bucket) against
    the counter table, one min-aggregate per key."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key_col, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.d", "rb.b")
    return (
        probes.join(cms, ["d", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_n"))
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

HLL_P = 6                      # 2^6 = 64 registers; std error 1.04/8 = 13%
HLL_M = 1 << HLL_P
HLL_W = 52 - HLL_P             # 46 rank bits under the 52-bit md5 hash


def hll_registers(
    df: DataFrame, groups: list[str], value: str
) -> DataFrame:
    """Per-group HLL register table: groups + (bucket INT, rho INT),
    one row per NON-ZERO register (rho = max leading-zero rank seen).

    This IS the mergeable summary: registers from any partitioning /
    any shard union by groupBy(bucket).max(rho) — the property that
    makes HLL the 100 TB distinct-count workhorse. Deterministic by
    construction: the 52-bit md5 prefix splits into a 6-bit bucket and
    46 rank bits; rho = 47 - bit_length(rank bits), with bit_length
    taken as length(bin(x)) — a STRING length, so no float log can
    disagree between engines."""
    c = F.col(value).cast("string")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("hll:"), c)), 1, 13), 16, 10).cast(
        "long"
    )
    bucket = F.expr(f"_h div {1 << HLL_W}")
    rem = F.expr(f"_h % {1 << HLL_W}")
    rho = F.when(rem == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(rem))
    )
    return (
        df.select(*groups, h.alias("_h"))
        .select(*groups, bucket.cast("int").alias("bucket"), rho.alias("_rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("_rho").cast("int").alias("rho"))
    )


def hll_estimate(registers: DataFrame, groups: list[str]) -> DataFrame:
    """Distinct-count estimate from a register table: groups +
    (n_zero_registers INT, est_distinct DOUBLE). Standard HLL with the
    small-range linear-counting correction (E <= 2.5m and zero
    registers exist -> m·ln(m/V)).

    Engine-exact: the harmonic sum Σ 2^-M_j is computed as the LONG
    Σ 2^(46-M_j) (every term a power of two, total <= 64·2^46 = 2^52
    < 2^53 — an exact integer that also casts to double exactly, in
    any summation order), divided once at the end. alpha is spelled
    as its defining expression so both engines bind the same double.
    """
    # rho = HLL_W + 1 (all rank bits zero, p ≈ 2^-46 per distinct)
    # would make the shift negative — shiftleft(1L, -1) is
    # Long.MIN_VALUE on the JVM, corrupting the whole harmonic sum.
    # Clamp to 0: the saturated register contributes 2^0 (as rho =
    # HLL_W would), a one-ulp-of-2^-46 underestimate of its true
    # 2^-(W+1) term — bounded, documented, and mirrored verbatim in
    # the DuckDB oracle (_hll_est_sql).
    terms = registers.groupBy(*groups).agg(
        F.sum(
            F.expr(f"shiftleft(1L, greatest(0, {HLL_W} - rho))")
        ).alias("_s"),
        F.count("*").alias("_nb"),
    )
    # zero registers contribute 2^46 each (rho = 0)
    s_full = F.col("_s") + (F.lit(HLL_M) - F.col("_nb")) * F.lit(1 << HLL_W)
    v = (F.lit(HLL_M) - F.col("_nb")).cast("int")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    raw = (
        alpha
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << HLL_W))
        / s_full.cast("double")
    )
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), lc).otherwise(raw)
    # half-up 4 dp via the floor chain — Spark/DuckDB round(double, n)
    # disagree near .5 ties (the q_min_cost_supplier lesson)
    return terms.select(
        *groups,
        v.alias("n_zero_registers"),
        (F.floor(est * 1e4 + F.lit(0.5)) / 1e4).alias("est_distinct"),
    )


def kmv_minima(
    df: DataFrame,
    value: str,
    k: int,
    salt_buckets: int = 16,
    assume_distinct: bool = False,
) -> DataFrame:
    """The k smallest distinct-value hashes as (__v, __h) rows — the
    mergeable KMV sketch itself (kmv_distinct keeps only the
    estimate). Same salted two-stage as kmv_distinct, bit-identical
    to the single-sort plan; the final window moves k rows.
    ``assume_distinct`` skips the distinct-reduce when the caller
    already holds one (kmv_set_ops shares it with the exact side)."""
    vals = df.select(F.col(value).alias("__v"))
    if not assume_distinct:
        vals = vals.distinct()
    hashed = vals.withColumn("__h", kmv_hash("__v"))
    if salt_buckets > 1:
        salt = (
            F.conv(
                F.substring(F.md5(F.col("__v").cast("string")), 30, 3), 16, 10
            )
            .cast("int")
            % salt_buckets
        )
        w1 = Window.partitionBy("__salt").orderBy("__h")
        hashed = (
            hashed.withColumn("__salt", salt)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .drop("__salt", "__r1")
        )
    w = Window.orderBy("__h")
    return (
        hashed.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_set_ops(a: DataFrame, b: DataFrame, value: str, k: int) -> DataFrame:
    """One-row distinct-cardinality estimates for A, B, A ∪ B and
    A ∩ B from two KMV sketches (Beyer et al., SIGMOD'07) next to
    the exact counts — the set-operation gate: "how many NEW
    documents does source B add" / "how big is the overlap" from
    k-row summaries instead of a full distinct join.

    The union's k minima are a subset of the two sides' k-minima
    union (any union minimum lives in one side's k smallest), so the
    merge stage handles <= 2k rows regardless of corpus size. The
    intersection estimator is the union-sketch membership ratio:
    D(A ∩ B) ~= (|{union minima in both}| / k) * D(A ∪ B), exact
    when the union has fewer than k distinct values. Deterministic
    md5 hashes make every estimate a pure function of the value sets
    (the same cross-engine contract as kmv_distinct); the exact side
    is one distinct-merge aggregate.
    """
    # one distinct-reduce per side feeds BOTH the sketch and the
    # exact gate (deferred checkpoint — computed once per action)
    da = (
        a.select(F.col(value).alias("__v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    db = (
        b.select(F.col(value).alias("__v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ma = kmv_minima(da, "__v", k, assume_distinct=True).withColumnRenamed(
        "__h", "__ha"
    )
    mb = kmv_minima(db, "__v", k, assume_distinct=True).withColumnRenamed(
        "__h", "__hb"
    )
    merged = (
        ma.join(mb, "__v", "full_outer")
        .select(
            "__v",
            F.coalesce("__ha", "__hb").alias("__h"),
            F.col("__ha").isNotNull().cast("int").alias("__in_a"),
            F.col("__hb").isNotNull().cast("int").alias("__in_b"),
        )
    )
    w = Window.orderBy("__h")
    topu = merged.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= k
    )

    def est(n_col, hmax_col):
        return F.round(
            F.when(n_col < k, n_col.cast("double")).otherwise(
                F.lit(float(k - 1)) / hmax_col
            ),
            4,
        )

    ea = ma.agg(
        est(F.count("*"), F.max("__ha")).alias("est_a")
    )
    eb = mb.agg(
        est(F.count("*"), F.max("__hb")).alias("est_b")
    )
    eu = topu.agg(
        F.count("*").cast("int").alias("n_kept"),
        F.sum(F.col("__in_a") * F.col("__in_b")).cast("int").alias("n_both"),
        est(F.count("*"), F.max("__h")).alias("est_union"),
    ).select(
        "n_kept",
        "n_both",
        "est_union",
        F.round(
            F.when(
                F.col("n_kept") < k, F.col("n_both").cast("double")
            ).otherwise(
                F.col("n_both").cast("double")
                / F.lit(float(k))
                * F.col("est_union")
            ),
            4,
        ).alias("est_inter"),
    )
    exact = (
        da.select("__v", F.lit(1).alias("__a"))
        .join(db.select("__v", F.lit(1).alias("__b")), "__v", "full_outer")
        .agg(
            F.coalesce(F.sum("__a"), F.lit(0)).cast("long").alias("exact_a"),
            F.coalesce(F.sum("__b"), F.lit(0)).cast("long").alias("exact_b"),
            F.count("*").cast("long").alias("exact_union"),
            F.sum(
                (F.col("__a").isNotNull() & F.col("__b").isNotNull()).cast(
                    "int"
                )
            )
            .cast("long")
            .alias("exact_inter"),
        )
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(exact))
    )
