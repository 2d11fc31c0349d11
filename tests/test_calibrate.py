"""Isotonic PAV operator: equality with the brute minimax
characterization, monotonicity, and pooling edge cases."""

from __future__ import annotations

from fractions import Fraction

from mapreduce_kmeans_clustering_spark.operators.calibrate import isotonic_fit

SCHEMA = "g string, x int, num long, den long"


def _brute_minimax(points):
    """y_hat_i = max_{j<=i} min_{k>=i} mean(points[j..k]) as exact
    Fractions (the isotonic-regression characterization)."""
    out = []
    n = len(points)
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                sn = sum(p[0] for p in points[j : k + 1])
                sd = sum(p[1] for p in points[j : k + 1])
                r = Fraction(sn, sd)
                worst = r if worst is None or r < worst else worst
            best = worst if best is None or worst > best else best
        out.append(best)
    return out


def _fit(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = isotonic_fit(df, ["g"], "x", "num", "den").collect()
    return {
        (r["g"], r["x"]): (r["num"], r["den"], r["y_hat"]) for r in got
    }


def test_matches_brute_minimax(spark):
    pts = [(3, 10), (1, 10), (2, 10), (9, 10), (5, 10), (8, 10)]
    rows = [("a", i, n, d) for i, (n, d) in enumerate(pts)]
    got = _fit(spark, rows)
    expect = _brute_minimax(pts)
    for i, frac in enumerate(expect):
        assert abs(got[("a", i)][2] - float(frac)) < 1e-12, i


def test_weighted_pooling(spark):
    # unequal trial counts: the pooled rate is the weighted mean
    pts = [(8, 10), (1, 100)]  # 0.8 then 0.01 -> pooled 9/110
    rows = [("w", i, n, d) for i, (n, d) in enumerate(pts)]
    got = _fit(spark, rows)
    assert got[("w", 0)][2] == got[("w", 1)][2] == 9 / 110


def test_monotone_output_and_identity_on_sorted(spark):
    inc = [(1, 10), (3, 10), (7, 10), (9, 10)]
    rows = [("m", i, n, d) for i, (n, d) in enumerate(inc)]
    got = _fit(spark, rows)
    ys = [got[("m", i)][2] for i in range(4)]
    assert ys == sorted(ys)
    # already strictly increasing input is returned untouched
    assert ys == [n / d for n, d in inc]


def test_groups_are_independent(spark):
    rows = [("a", 0, 9, 10), ("a", 1, 1, 10), ("b", 0, 1, 10), ("b", 1, 9, 10)]
    got = _fit(spark, rows)
    assert got[("a", 0)][2] == got[("a", 1)][2] == 0.5  # pooled
    assert got[("b", 0)][2] == 0.1 and got[("b", 1)][2] == 0.9  # untouched


def test_equal_rates_pool_without_float_compares(spark):
    # exact tie (2/4 == 1/2) must pool (>= merge rule), which float
    # equality would also get right here — the integer cross-mult
    # matters for ties like 1/3 vs 333333.../1e18 that floats mangle
    rows = [("t", 0, 2, 4), ("t", 1, 1, 2), ("t", 2, 1, 2)]
    got = _fit(spark, rows)
    assert {v[2] for v in got.values()} == {0.5}
