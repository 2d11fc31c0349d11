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
