"""Deterministic Bloom filter — the pre-shuffle semi-join reducer.

The 100 TB problem: `fact LEFT SEMI JOIN keys` shuffles the entire
fact table even when 99% of its rows can't match. A Bloom filter
built from the keys and broadcast to the fact scan drops non-members
BEFORE the exchange, so the shuffle moves only plausible rows (plus
the false-positive dribble). Spark's own runtime row-group filters
cover some of this; an explicit filter works on any predicate column,
survives into checkpointed/staged plans, and its bitset can be saved
and reused across jobs (it is just an array of longs).

Everything is md5-derived and JVM-side:
- BUILD: k probe positions per key (codegen projection), positions
  fold into 64-bit words via one `bit_or` hash aggregate — shuffle
  carries at most m/64 longs per partition — then an m/64-word
  collect (driver state: m bits, e.g. 2^20 bits = 128 KiB).
- PROBE: the word array is a literal; membership is k
  `element_at` + bitwise-AND tests, whole-stage codegen, scan-local.

False negatives: none (every inserted key sets all its bits).
False-positive rate ~ (1 - e^{-k*n/m})^k; size m ≈ 10 bits/key with
k=5 gives <1%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 5

# literal long with bit i set (i == 63 is the sign bit in two's
# complement); indexed via element_at because shiftleft's shift
# amount must be a Python literal in the DataFrame API
_BITS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def _bit(pos_mod_64: "Column") -> "Column":
    arr = F.array(*[F.lit(b).cast("long") for b in _BITS])
    return F.element_at(arr, pos_mod_64.cast("int") + 1)


def _positions(col: Column, k: int, m_bits: int) -> list[Column]:
    """k independent md5-derived probe positions in [0, m_bits)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bf{i}:"), col.cast("string"))), 1, 13
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 17, k: int = DEFAULT_K
) -> list[int]:
    """Distributed build: returns the filter as m_bits/64 longs."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            _bit(F.col("pos") % 64).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r["w"])] = int(r["bits"])
    return out


def bloom_might_contain(
    col: Column | str, words: list[int], k: int = DEFAULT_K
) -> Column:
    """Membership test column against a built filter (scan-local,
    whole-stage codegen; the word array is a broadcast-sized literal)."""
    c = F.col(col) if isinstance(col, str) else col
    m_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for p in _positions(c, k, m_bits):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        t = word.bitwiseAND(_bit(p % 64)) != 0
        cond = t if cond is None else (cond & t)
    return cond


def semi_join_bloom(
    fact: DataFrame,
    keys: DataFrame,
    fact_col: str,
    key_col: str | None = None,
    m_bits: int = 1 << 17,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact LEFT SEMI join with a Bloom pre-filter: the filter drops
    non-members before the fact's shuffle (scan-local predicate), the
    semi join removes the false positives. Result rows == plain semi
    join (no false negatives by construction); shuffle volume drops to
    matches + FPR."""
    key_col = key_col or fact_col
    words = bloom_build(keys, key_col, m_bits=m_bits, k=k)
    pre = fact.where(bloom_might_contain(fact_col, words, k=k))
    return pre.join(
        keys.select(F.col(key_col).alias(fact_col)).distinct(), fact_col, "left_semi"
    )
