"""Snapshot reconciliation: row-level diff and Merkle-style bucket
digests between two versions of a keyed table.

The data-versioning primitive behind "what changed between
yesterday's corpus and today's": classify every key as
added / removed / changed / unchanged, and localize the damage to
hash buckets whose order-independent digests disagree — at 100 TB
you ship bucket digests (nbuckets rows) between sites, not rows,
and only replay the buckets that differ (the anti-entropy protocol
shape: Merkle trees in Dynamo-style stores).

Determinism: row fingerprints are md5 over a '|'-separated
null-sentineled rendering (the portable hash family — DuckDB replays
it bit-for-bit); bucket digests sum a 48-bit integer slice of the
fingerprint, so the digest is ORDER-INDEPENDENT (addition commutes).
The sum accumulates in DECIMAL(38,0) and folds mod 2^48 — exact at
ANY bucket width (the pre-round-11 long accumulator overflowed past
~2^15 rows/bucket under ANSI mode; see bucket_digests), so nbuckets
is purely a granularity/transfer-size knob, not a safety bound.

Derived from the reference's sink-verification posture (SURVEY §5 —
golden task outputs compared file-by-file); here the comparison
itself is the distributed operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00"


def row_fingerprint(cols: list[str]) -> Column:
    """md5 fingerprint over value columns, null-safe."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def digest48(fp: Column) -> Column:
    """First 12 hex chars of the fingerprint as a 48-bit long —
    summable without overflow, engine-portable via conv()."""
    return F.conv(F.substring(fp, 1, 12), 16, 10).cast("long")


def snapshot_diff(
    a: DataFrame, b: DataFrame, key_cols: list[str], val_cols: list[str]
) -> DataFrame:
    """Per-key change class between snapshots ``a`` and ``b``.

    One full outer join on the key (shuffle both sides on the key —
    with both snapshots written bucketed by the key this is
    shuffle-free). Returns (key_cols..., change) with change in
    {'added','removed','changed'} — unchanged keys are filtered
    EARLY (the overwhelming majority at scale never leaves the
    join's output).
    """
    fa = a.select(*key_cols, row_fingerprint(val_cols).alias("_fp_a"))
    fb = b.select(*key_cols, row_fingerprint(val_cols).alias("_fp_b"))
    j = fa.join(fb, key_cols, "full_outer")
    change = (
        F.when(F.col("_fp_a").isNull(), F.lit("added"))
        .when(F.col("_fp_b").isNull(), F.lit("removed"))
        .when(F.col("_fp_a") != F.col("_fp_b"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def bucket_digests(
    snap: DataFrame, key_cols: list[str], val_cols: list[str], nbuckets: int
) -> DataFrame:
    """(bucket, n_rows, digest): order-independent per-bucket summary
    — the Merkle leaf level. Buckets come from the KEY fingerprint
    (stable under value edits), digests from the full-row
    fingerprint, so a changed value flips the digest but not the
    bucket."""
    kf = row_fingerprint(key_cols)
    rf = row_fingerprint(key_cols + val_cols)
    staged = snap.select(
        F.pmod(digest48(kf), F.lit(nbuckets)).alias("bucket"),
        digest48(rf).alias("_d"),
    )
    # The digest is the 48-bit-folded sum: accumulate in DECIMAL(38,0)
    # (exact past 1e26 rows/bucket), then mod 2^48 back to a long. A
    # plain long sum overflows once a bucket holds ~2^15 rows — at
    # sf10-equivalent the round-11 ×100 sweep THREW ARITHMETIC_OVERFLOW
    # under Spark 4's default ANSI mode (and silently wrapped non-ANSI)
    # — while the folded sum stays order-independent (addition and mod
    # commute) with the same 48-bit Merkle collision class.
    return staged.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.sum(F.col("_d").cast("decimal(38,0)")) % F.lit(1 << 48))
        .cast("long")
        .alias("digest"),
    )
