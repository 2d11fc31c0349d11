"""Allocation operators: largest-remainder exactness and FIFO
interval matching vs a straight Python queue simulation."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.allocation import (
    fifo_match,
    largest_remainder,
)


def _alloc(spark, weights, units):
    df = spark.createDataFrame(
        [(k, w) for k, w in weights.items()], "k string, w long"
    )
    rows = largest_remainder(df, "k", "w", units).collect()
    return {r["k"]: (r["floor_units"], r["got_extra"], r["units"]) for r in rows}


@pytest.mark.slow  # 7-12 s band, sibling fast coverage kept (r13)
def test_exact_proportions_get_no_extras(spark):
    out = _alloc(spark, {"a": 5, "b": 3, "c": 2}, 10)
    assert out == {"a": (5, 0, 5), "b": (3, 0, 3), "c": (2, 0, 2)}


def test_equal_remainders_break_ties_by_key_asc(spark):
    # 10 units over three equal weights: floors 3/3/3, one extra unit,
    # identical remainders -> lowest key wins
    out = _alloc(spark, {"a": 1, "b": 1, "c": 1}, 10)
    assert out["a"] == (3, 1, 4)
    assert out["b"] == (3, 0, 3)
    assert out["c"] == (3, 0, 3)


def test_sums_exactly_and_within_one_of_floor(spark):
    weights = {f"k{i:02d}": (i * 37) % 11 + 1 for i in range(25)}
    units = 997
    out = _alloc(spark, weights, units)
    assert sum(u for _, _, u in out.values()) == units
    for fl, extra, u in out.values():
        assert u in (fl, fl + 1)
        assert extra == u - fl


def test_largest_remainders_win(spark):
    # units=10, W=7: a floor 10*4//7=5 rem 5; b floor 10*2//7=2 rem 6;
    # c floor 10*1//7=1 rem 3 -> short=2 extras go to b (rem 6), a (rem 5)
    out = _alloc(spark, {"a": 4, "b": 2, "c": 1}, 10)
    assert out == {"a": (5, 1, 6), "b": (2, 1, 3), "c": (1, 0, 1)}


def _fifo_brute(lots, demands):
    """Straight queue simulation: (key, seq, qty) lists -> matched
    (key, lot_seq, dem_seq, qty) tuples."""
    out = []
    keys = {k for k, _, _ in lots} | {k for k, _, _ in demands}
    for key in keys:
        L = [[s, q] for k, s, q in sorted(lots) if k == key]
        D = [[s, q] for k, s, q in sorted(demands) if k == key]
        li = 0
        for ds, dq in D:
            while dq > 0 and li < len(L):
                take = min(dq, L[li][1])
                if take > 0:
                    out.append((key, L[li][0], ds, take))
                L[li][1] -= take
                dq -= take
                if L[li][1] == 0:
                    li += 1
    return sorted(out)


def test_fifo_matches_queue_simulation(spark):
    lots = [
        ("p1", "01", 10), ("p1", "02", 5), ("p1", "03", 8),
        ("p2", "01", 4),
        ("p3", "01", 6),
    ]
    demands = [
        ("p1", "01", 7), ("p1", "02", 9), ("p1", "03", 20),  # overflows
        ("p2", "01", 4),                                      # exact
        ("p4", "01", 3),                                      # no lots
    ]
    ldf = spark.createDataFrame(lots, "k string, seq string, qty long")
    ddf = spark.createDataFrame(demands, "k string, seq string, qty long")
    got = sorted(
        (r["k"], r["lot_seq"], r["dem_seq"], r["matched_qty"])
        for r in fifo_match(ldf, ddf, "k", ["seq"], "qty").collect()
        if r["matched_qty"] > 0
    )
    assert got == _fifo_brute(lots, demands)


def test_fifo_pair_count_is_bounded(spark):
    # ordered-merge bound: <= n_lots + n_demands - 1 pairs per key
    lots = [("k", f"{i:03d}", 1) for i in range(40)]
    demands = [("k", f"{i:03d}", 3) for i in range(10)]
    ldf = spark.createDataFrame(lots, "k string, seq string, qty long")
    ddf = spark.createDataFrame(demands, "k string, seq string, qty long")
    rows = fifo_match(ldf, ddf, "k", ["seq"], "qty").collect()
    positive = [r for r in rows if r["matched_qty"] > 0]
    assert len(positive) <= len(lots) + len(demands) - 1
    assert sum(r["matched_qty"] for r in positive) == 30
