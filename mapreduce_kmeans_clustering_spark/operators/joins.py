"""As-of and interval (range) joins — the two time-join shapes Spark's
built-in join strategies don't express directly (SURVEY.md §2.2 lists
both as absent from the reference; a training-data/event pipeline needs
them constantly: attribution, campaign windows, slowly-changing dims).

Both are built as compositions of existing DataFrame ops so Catalyst
still owns the physical plan — no Python UDFs, no BroadcastNestedLoopJoin
on the hot path.

**As-of join** (latest right row with right_ts <= left_ts per key):
the classic implementations are a per-key sorted merge (not expressible
declaratively) or a non-equi join + argmax (quadratic blow-up per key).
Instead: UNION the two sides with the right side's payload columns
nulled on the left rows, then one window
``last(payload, ignorenulls=True)`` ordered by (ts, side) per key.
One shuffle on the key, linear work, AQE-sized — at 100 TB this is a
single sort-exchange over events, which is the floor for any time-join.
Equal timestamps: right rows sort before left rows (side 0 < 1), so a
right row at exactly left_ts matches, mirroring standard ASOF `<=`
semantics (DuckDB, QuestDB, kdb).

**Interval join** (left.ts BETWEEN right.start AND right.end): a raw
range predicate forces BroadcastNestedLoopJoin — O(|L|·|R|) and a
broadcast of whichever side is "small". Bucketing fixes the asymptotics:
quantize time into fixed-width buckets, explode each interval into the
bucket ids it covers (``F.sequence``), equi-join on bucket id, then
re-check the exact predicate. The equi-join hashes/broadcasts like any
other join, and each event is compared only against intervals sharing
its bucket — at 100 TB the cost is |L| + Σ interval_spans/width instead
of |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_order: str | None = None,
    salt: int | None = None,
) -> DataFrame:
    """For every left row, attach ``payload`` columns from the latest
    right row of the same ``on`` key with right_ts <= left_ts (null
    payload when no prior right row exists).

    ``right_order`` breaks ties among right rows sharing a timestamp
    (highest value wins); required for cross-engine determinism when
    duplicate (key, ts) pairs are possible.

    Payload column names must not collide with left's columns.

    NULL payload fields of the matched row propagate: the window fills
    ONE struct of all payload columns (non-null on every right row), so
    a legitimately-NULL field of the latest right row stays NULL in the
    output instead of being skipped for a stale older value — standard
    ASOF semantics.

    ``salt`` (opt-in skew hatch): one hot key (a bot user with 10^8
    events) otherwise funnels its whole window partition into a single
    task. With salt = S, each LEFT row lands in one of S sub-partitions
    (deterministic hash of its timestamp — no RNG, stable across task
    retries) while every RIGHT row is replicated to ALL S — so each
    (key, salt) window still sees the full right history and the
    result is EXACTLY the unsalted one (property-tested). Cost: right
    side shuffled S times — the right trade when left >> right, which
    is the asof shape (events vs dim-updates). Not a default: it
    S-folds the right shuffle for skew only the caller can see.
    """
    # left's own columns ride along; each side carries nulls for the
    # other side's columns so the two halves union by name. The
    # tie-break column travels as internal "__ord" so it need not be
    # part of the requested payload.
    carry = [c for c in left.columns if c not in {on, left_ts}]
    ord_src = right_order or right_ts
    p_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[ord_src].dataType).alias("__ord"),
        F.lit(None).cast(p_type).alias("__p"),
        *[F.col(c) for c in carry],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        F.col(ord_src).alias("__ord"),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
    )
    part_keys = [on]
    if salt and salt > 1:
        l = l.withColumn("__salt", F.pmod(F.xxhash64(F.col("__ts")), F.lit(salt)))
        r = r.withColumn(
            "__salt",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long"))
            ),
        )
        part_keys.append("__salt")
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        on,
        "__ts",
        _SIDE,
        *carry,
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return (
        filled.where(F.col(_SIDE) == 1)
        .select(
            on,
            "__ts",
            *carry,
            *[F.col(f"__p.{c}").alias(c) for c in payload],
        )
        .withColumnRenamed("__ts", left_ts)
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join each left row to every interval row whose
    [start, end] (inclusive) contains left.ts, via bucket equi-join.

    ``bucket_seconds`` should be on the order of the typical interval
    length: too small explodes the interval table, too large degrades
    toward per-bucket nested loops. Column names must be disjoint.
    """
    b = lambda c: F.floor(F.unix_timestamp(F.col(c)) / bucket_seconds)
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(b(start), b(end)))
    )
    return (
        left.withColumn("__bucket", b(ts))
        .join(iv, "__bucket")
        .where(F.col(ts).between(F.col(start), F.col(end)))
        .drop("__bucket")
    )


def fuzzy_self_join_ed1(
    df: DataFrame,
    name_col: str,
    id_col: str,
) -> DataFrame:
    """EXACT fuzzy self-join at Levenshtein distance <= 1 via
    deletion-neighborhood blocking (the SymSpell/Norvig dictionary
    trick applied as a join): each string's candidate key set is
    itself plus every single-character deletion; two strings within
    edit distance 1 ALWAYS share a key (substitution -> delete the
    differing position from both; insert/delete -> the shorter string
    is itself a deletion of the longer; equality -> self key), so the
    equi-join on keys is a complete candidate generator and the
    ``levenshtein() <= 1`` verify filter removes the false positives
    (strings sharing a deletion at distance 2). Never a pairwise
    nested loop: candidate work is O(sum of name lengths) join keys,
    each key shared by few strings — the record-linkage shape that
    survives a billion-row entity table.

    Returns (a, b, name_a, name_b, dist) with a < b by id."""
    c = F.col(name_col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            c.substr(F.lit(1), i - F.lit(1)), c.substr(i + F.lit(1), F.length(c))
        ),
    )
    keyed = df.select(
        F.col(id_col).alias("_id"),
        c.alias("_name"),
        F.explode(F.array_union(F.array(c), deletions)).alias("_k"),
    ).distinct()
    a = keyed.select(
        F.col("_id").alias("a"), F.col("_name").alias("name_a"), "_k"
    )
    b = keyed.select(
        F.col("_id").alias("b"), F.col("_name").alias("name_b"), "_k"
    )
    cand = (
        a.join(b, "_k")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "a", "b", "name_a", "name_b", dist.cast("int").alias("dist")
    ).where(F.col("dist") <= 1)
