"""Continuously-maintained rollup: the streaming twin of
operators/incremental.py — a per-key aggregate table kept current by
MERGING each micro-batch's summary into the stored state, never
rescanning history.

Why not a plain streaming groupBy in complete mode? Complete mode
re-emits (and re-shuffles) the ENTIRE aggregate every trigger and its
state must hold every group forever — fine for dashboards, wrong for
a 100 TB rollup with millions of groups. The foreachBatch + merge
pattern keeps Spark's streaming state at just the file-source log;
the aggregate lives in a parquet table of (key, mergeable summaries)
that grows with GROUPS, not history, and each trigger costs
O(batch) + O(aggregate) — exactly the batch operator's contract,
proven by the same merge-law tests.

Exactly-once: versions commit by MARKER, not by rename — each epoch
writes ``<state>/v=<epoch>`` and a version is visible to readers only
once its ``_SUCCESS`` file exists (the Hadoop committer writes it
last; ``fold`` double-checks and creates it if the committer was
configured not to). ``_versions``/``read_rollup_state`` ignore
marker-less directories, so a crash mid-write (or a concurrent
reader racing a replay) resolves to the newest COMMITTED version,
never a half-written one. A replayed epoch re-merges the same batch
into the same pre-batch snapshot (only versions strictly below the
epoch count as prior state) and overwrites its own directory —
idempotent. State dirs are driver-local paths (``os.listdir`` on the
driver): for an object-store deployment swap ``_versions`` for a
listing via the Hadoop FS API; the marker protocol is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mapreduce_kmeans_clustering_spark.operators.incremental import (
    aggregate_batch,
    merge_aggregates,
)


def _versions(state_dir: str) -> list[int]:
    """Committed version ids, ascending. Only directories holding a
    ``_SUCCESS`` marker count — a crashed or in-flight write is
    invisible until the committer drops the marker (its last act).
    Driver-local listing; see the module docstring for object stores."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if (
            name.startswith("v=")
            and name[2:].isdigit()
            and os.path.exists(os.path.join(state_dir, name, "_SUCCESS"))
        ):
            out.append(int(name[2:]))
    return sorted(out)


def read_rollup_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Newest committed state version, or None before the first
    commit."""
    vs = _versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(f"{state_dir}/v={vs[-1]}")


def stream_rollup(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
) -> StreamingQuery:
    """Start the rollup maintenance query (availableNow trigger:
    drain, merge, stop — reschedule for continuous operation).

    Each micro-batch: summarize the batch (aggregate_batch), merge
    with the newest committed state (merge_aggregates — one union +
    hash aggregate), commit as ``v=<epoch>``. Versions are
    monotonically increasing epoch ids, so checkpoint replay of an
    epoch overwrites ITS OWN version directory (idempotent) and the
    read path — max committed v — never sees a half-written merge."""

    def fold(batch_df: DataFrame, epoch: int) -> None:
        spark = batch_df.sparkSession
        summary = aggregate_batch(batch_df, keys, spec)
        # a replayed epoch must not merge onto its own output: only
        # versions strictly below this epoch count as prior state
        vs = [v for v in _versions(state_dir) if v < epoch]
        prior = (
            spark.read.parquet(f"{state_dir}/v={vs[-1]}") if vs else None
        )
        merged = (
            merge_aggregates([prior, summary], keys, spec)
            if prior is not None
            else merge_aggregates([summary], keys, spec)
        )
        vdir = f"{state_dir}/v={epoch}"
        merged.write.mode("overwrite").parquet(vdir)
        # the Hadoop committer writes _SUCCESS last; if the session
        # disabled marksuccessfuljobs, commit explicitly so the
        # version becomes visible to _versions at all
        marker = os.path.join(vdir, "_SUCCESS")
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
