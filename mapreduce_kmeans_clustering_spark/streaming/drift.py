"""Streaming distribution-drift monitor: per-micro-batch two-sample
KS against a frozen reference histogram — the live twin of the batch
gate ``operators/profile.length_ks_pairs`` (q_length_ks). A corpus
ingest keeps this running beside the dedup/quality stages: when a new
drop's token-length profile drifts from the reference corpus the
batch is flagged BEFORE it mixes in.

Shape per micro-batch: one histogram aggregate over the batch
(|distinct lengths| rows, never per-doc), a union with the
(broadcast-sized) reference histogram carrying signed mass
(+n/n_batch, -n/n_ref), one ordered window for the running ECDF gap,
a 1-row max — then a single appended result row
(batch_id, n_docs, ks, drifted). State is the reference histogram
only; nothing grows with stream history. Same signed-mass
determinism argument as the batch operator: the window order fixes
the summation sequence.

Pinned in tests/test_streaming.py: the stream verdicts equal the
batch operator's KS on the same data (tagged-union replay), matched
batches pass, a shifted batch flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mapreduce_kmeans_clustering_spark.operators.text import token_count


def length_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(l, n) token-length histogram — the reference state a drift
    monitor freezes once per corpus release."""
    return (
        docs.select(token_count(F.col(text_col)).cast("long").alias("l"))
        .groupBy("l")
        .agg(F.count("*").cast("double").alias("n"))
    )


def ks_against_reference(
    batch_hist: DataFrame, ref_hist: DataFrame
) -> DataFrame:
    """1-row (n_batch, n_ref, ks) from two (l, n) histograms via the
    signed-mass running sum (see operators/profile.length_ks_pairs)."""
    bt = batch_hist.agg(F.sum("n").alias("nb"))
    rt = ref_hist.agg(F.sum("n").alias("nr"))
    b = batch_hist.crossJoin(F.broadcast(bt)).select(
        "l",
        (F.col("n") / F.col("nb")).alias("d"),
        "nb",
        F.lit(None).cast("double").alias("nr"),
    )
    r = ref_hist.crossJoin(F.broadcast(rt)).select(
        "l",
        (-F.col("n") / F.col("nr")).alias("d"),
        F.lit(None).cast("double").alias("nb"),
        "nr",
    )
    u = (
        b.unionByName(r)
        .groupBy("l")
        .agg(
            F.sum("d").alias("d"),
            F.max("nb").alias("nb"),
            F.max("nr").alias("nr"),
        )
    )
    w = Window.orderBy("l").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        u.withColumn("gap", F.sum("d").over(w))
        .agg(
            F.max("nb").cast("long").alias("n_batch"),
            F.max("nr").cast("long").alias("n_ref"),
            F.round(F.max(F.abs(F.col("gap"))), 6).alias("ks"),
        )
    )


def stream_length_drift(
    stream: DataFrame,
    ref_hist: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.3,
    text_col: str = "text",
) -> StreamingQuery:
    """Start the drift monitor (availableNow trigger: drain, score
    each micro-batch, stop — reschedule for continuous operation).
    Appends one row per micro-batch to ``out_dir``:
    (batch_id, n_batch, n_ref, ks, drifted). ``ref_hist`` should be a
    small materialized (l, n) relation (length_histogram of the
    reference corpus); it is re-broadcast per batch, never mutated."""

    def fold(batch_df: DataFrame, epoch: int) -> None:
        row = ks_against_reference(
            length_histogram(batch_df, text_col), ref_hist
        ).select(
            F.lit(int(epoch)).alias("batch_id"),
            "n_batch",
            "n_ref",
            "ks",
            (F.col("ks") >= threshold).alias("drifted"),
        )
        row.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_cusum(
    stream: DataFrame,
    ref_means: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    rel_slack: float = 0.02,
    threshold_means: float = 2.0,
    key_col: str = "event_type",
    value_col: str = "value",
) -> StreamingQuery:
    """Stateful streaming CUSUM — the live twin of
    ``operators/profile.cusum_daily``, with micro-batches as the
    accumulation steps: per key,

        dev   = Σ_batch(value) − n_batch · μ_ref · (1 + slack)
        S+'   = max(0, S+ + dev);  S-' symmetric;
        alarm = S± > threshold_means · μ_ref

    ``ref_means`` is the frozen per-key reference (key, mu) — the
    corpus-release baseline, like the drift monitor's histogram.
    Unlike the KS monitor the statistic CARRIES STATE across batches
    (that is CUSUM's whole point), stored as a (key, sp, sn) parquet
    under the rollup module's marker-committed version protocol:
    replayed epochs fold onto versions strictly below themselves and
    overwrite their own directory — idempotent, and readers never see
    a half-written version. State grows with KEYS, never history, and
    carries across batches a key skips (full-outer state join:
    deviation 0 for absent keys, never a reset). Keys missing from
    ``ref_means`` are carried but unscored — alarms false plus an
    explicit ``unknown_key`` flag, never NULL alarm rows.
    Appends one row per (batch, key-present-in-batch) to ``out_dir``:
    (batch_id, key, batch_value, sp, sn, alarm_pos, alarm_neg,
    unknown_key)."""
    import os

    from mapreduce_kmeans_clustering_spark.streaming.rollup import _versions

    def fold(batch_df: DataFrame, epoch: int) -> None:
        spark = batch_df.sparkSession
        totals = batch_df.groupBy(F.col(key_col).alias("key")).agg(
            F.sum(F.col(value_col).cast("decimal(18,4)"))
            .cast("double")
            .alias("x"),
            F.count("*").cast("long").alias("n"),
        )
        vs = [v for v in _versions(state_dir) if v < epoch]
        prior = (
            spark.read.parquet(f"{state_dir}/v={vs[-1]}")
            if vs
            else spark.createDataFrame([], "key STRING, sp DOUBLE, sn DOUBLE")
        )
        ref = ref_means.select(F.col(key_col).alias("key"), "mu")
        # FULL outer join against prior state: a key absent from this
        # micro-batch must CARRY its accumulated S+/S− forward
        # unchanged (deviation 0), not silently reset to 0 on its next
        # appearance — resetting would defeat CUSUM's
        # accumulate-small-sustained-drift contract for intermittent
        # keys. Keys with no reference mean (mu null) are carried but
        # never scored: deviation 0, alarms false, flagged
        # unknown_key so the operator surfaces them instead of writing
        # NULL alarm rows.
        scored = F.col("in_batch") & F.col("known")
        j = (
            totals.join(prior, "key", "full")
            .join(F.broadcast(ref), "key", "left")
            .select(
                "key",
                F.col("x").isNotNull().alias("in_batch"),
                F.col("mu").isNotNull().alias("known"),
                F.coalesce(F.col("x"), F.lit(0.0)).alias("x"),
                F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
                F.coalesce(F.col("sp"), F.lit(0.0)).alias("sp0"),
                F.coalesce(F.col("sn"), F.lit(0.0)).alias("sn0"),
                F.col("mu"),
            )
            .select(
                "key",
                "in_batch",
                "known",
                "x",
                F.when(
                    scored,
                    F.col("x")
                    - F.col("n") * F.col("mu") * F.lit(1.0 + rel_slack),
                )
                .otherwise(F.lit(0.0))
                .alias("dev_p"),
                F.when(
                    scored,
                    F.col("n") * F.col("mu") * F.lit(1.0 - rel_slack)
                    - F.col("x"),
                )
                .otherwise(F.lit(0.0))
                .alias("dev_n"),
                "sp0",
                "sn0",
                F.col("mu"),
            )
            .select(
                "key",
                "in_batch",
                "known",
                "x",
                F.greatest(F.lit(0.0), F.col("sp0") + F.col("dev_p")).alias("sp"),
                F.greatest(F.lit(0.0), F.col("sn0") + F.col("dev_n")).alias("sn"),
                F.col("mu"),
            )
        )
        new_state = j.select("key", "sp", "sn")
        vdir = f"{state_dir}/v={epoch}"
        new_state.write.mode("overwrite").parquet(vdir)
        marker = os.path.join(vdir, "_SUCCESS")
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
        h = F.lit(threshold_means) * F.col("mu")
        out = j.filter("in_batch").select(
            F.lit(int(epoch)).alias("batch_id"),
            "key",
            F.round("x", 4).alias("batch_value"),
            F.round("sp", 4).alias("sp"),
            F.round("sn", 4).alias("sn"),
            F.coalesce(F.col("sp") > h, F.lit(False)).alias("alarm_pos"),
            F.coalesce(F.col("sn") > h, F.lit(False)).alias("alarm_neg"),
            (~F.col("known")).alias("unknown_key"),
        )
        out.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
