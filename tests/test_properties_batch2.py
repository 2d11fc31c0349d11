"""Property tests for the round-5 frontier/allocation/reconciliation
operators: laws that must hold for EVERY input, checked on drawn
fixtures (the suite that caught the -0.0 codegen bug — falsifiers
get promoted to explicit tests per SCALE.md §7 posture)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

pair = st.tuples(
    st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=40)
)
pairset = st.lists(pair, min_size=1, max_size=40)

weightmap = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=1, max_value=1000),
    min_size=1,
    max_size=12,
)

lotlist = st.lists(
    st.tuples(st.integers(0, 9), st.integers(1, 20)), min_size=0, max_size=12
)


import pytest

# Exhaustive property batch — slow (VERDICT r12 item 2): excluded
# from the default run; CI/round-close run with --runslow.
pytestmark = pytest.mark.slow


def _brute_skyline(pts):
    pts = sorted(set(pts))
    return sorted(
        p
        for p in pts
        if not any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )
    )


@SETTINGS
@given(pairs=pairset)
def test_skyline_equals_brute_for_any_pointset(spark, pairs):
    from mapreduce_kmeans_clustering_spark.operators.skyline import skyline_2d

    rows = [(float(x), y) for x, y in pairs]
    df = spark.createDataFrame(rows, "x double, y int")
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y", buckets=4).collect()
    )
    assert got == [(float(x), y) for x, y in _brute_skyline(pairs)]


@SETTINGS
@given(weights=weightmap, units=st.integers(min_value=0, max_value=5000))
def test_largest_remainder_always_sums_exactly(spark, weights, units):
    from mapreduce_kmeans_clustering_spark.operators.allocation import (
        largest_remainder,
    )

    df = spark.createDataFrame(list(weights.items()), "k int, w long")
    rows = largest_remainder(df, "k", "w", units).collect()
    assert sum(r["units"] for r in rows) == units
    total = sum(weights.values())
    for r in rows:
        # each key within 1 unit of its exact proportional share
        exact = units * weights[r["k"]] / total
        assert exact - 1 < r["units"] < exact + 1
        assert r["units"] - r["floor_units"] == r["got_extra"] in (0, 1)


@SETTINGS
@given(lots=lotlist, demands=lotlist)
def test_fifo_conservation_laws(spark, lots, demands):
    from mapreduce_kmeans_clustering_spark.operators.allocation import fifo_match

    lrows = [(f"k{k}", f"{i:02d}", q) for i, (k, q) in enumerate(lots)]
    drows = [(f"k{k}", f"{i:02d}", q) for i, (k, q) in enumerate(demands)]
    ldf = spark.createDataFrame(lrows, "k string, seq string, qty long")
    ddf = spark.createDataFrame(drows, "k string, seq string, qty long")
    got = fifo_match(ldf, ddf, "k", ["seq"], "qty").collect()
    keys = {f"k{k}" for k, _ in lots} | {f"k{k}" for k, _ in demands}
    for key in keys:
        supply = sum(q for i, (k, q) in enumerate(lots) if f"k{k}" == key)
        demand = sum(q for i, (k, q) in enumerate(demands) if f"k{k}" == key)
        rows = [r for r in got if r["k"] == key]
        matched = sum(r["matched_qty"] for r in rows)
        # per-key conservation: matched = min(supply, demand); every
        # pair positive; pair count within the ordered-merge bound
        assert matched == min(supply, demand), key
        assert all(r["matched_qty"] > 0 for r in rows), key
        n_l = sum(1 for k, _ in lots if f"k{k}" == key)
        n_d = sum(1 for k, _ in demands if f"k{k}" == key)
        if n_l and n_d:
            assert len(rows) <= n_l + n_d - 1, key
        # per-lot and per-demand totals never exceed their quantities
        per_lot: dict[str, int] = {}
        per_dem: dict[str, int] = {}
        for r in rows:
            per_lot[r["lot_seq"]] = per_lot.get(r["lot_seq"], 0) + r["matched_qty"]
            per_dem[r["dem_seq"]] = per_dem.get(r["dem_seq"], 0) + r["matched_qty"]
        for i, (k, q) in enumerate(lots):
            if f"k{k}" == key:
                assert per_lot.get(f"{i:02d}", 0) <= q
        for i, (k, q) in enumerate(demands):
            if f"k{k}" == key:
                assert per_dem.get(f"{i:02d}", 0) <= q


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 200), st.text(max_size=4), st.integers(0, 50)),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    nbuckets=st.integers(min_value=1, max_value=8),
)
def test_diff_digests_invariant_to_row_order(spark, rows, nbuckets):
    from mapreduce_kmeans_clustering_spark.operators.diff import bucket_digests

    if not rows:
        return
    a = spark.createDataFrame(rows, "id long, v string, w long").repartition(5)
    b = spark.createDataFrame(
        list(reversed(rows)), "id long, v string, w long"
    ).repartition(2)
    da = sorted(map(tuple, bucket_digests(a, ["id"], ["v", "w"], nbuckets).collect()))
    db = sorted(map(tuple, bucket_digests(b, ["id"], ["v", "w"], nbuckets).collect()))
    assert da == db


iso_points = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 30)),  # (num<=den enforced below)
    min_size=1,
    max_size=10,
)


@SETTINGS
@given(pts=iso_points)
def test_isotonic_matches_minimax_for_any_rates(spark, pts):
    from fractions import Fraction

    from mapreduce_kmeans_clustering_spark.operators.calibrate import (
        isotonic_fit,
    )

    pts = [(min(n, d), d) for n, d in pts]  # valid rates num<=den
    rows = [("g", i, n, d) for i, (n, d) in enumerate(pts)]
    df = spark.createDataFrame(rows, "g string, x int, num long, den long")
    got = {
        r["x"]: r["y_hat"]
        for r in isotonic_fit(df, ["g"], "x", "num", "den").collect()
    }
    # minimax characterization with exact Fractions
    n = len(pts)
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                sn = sum(p[0] for p in pts[j : k + 1])
                sd = sum(p[1] for p in pts[j : k + 1])
                r = Fraction(sn, sd)
                worst = r if worst is None or r < worst else worst
            best = worst if best is None or worst > best else best
        assert abs(got[i] - float(best)) < 1e-12, i
    # monotone nondecreasing
    ys = [got[i] for i in range(n)]
    assert all(ys[i] <= ys[i + 1] + 1e-15 for i in range(n - 1))


edgeset = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=30
)


@SETTINGS
@given(edges=edgeset, hops=st.integers(1, 4))
def test_bfs_matches_dijkstra_unit_weights(spark, edges, hops):
    from mapreduce_kmeans_clustering_spark.operators.graph import bfs_levels

    df = spark.createDataFrame(
        edges or [(0, 0)], "src int, dst int"
    )
    got = {r["nk"]: r["hops"] for r in bfs_levels(df, [0], hops).collect()}
    # brute BFS with unit weights, capped at `hops`
    dist = {0: 0}
    frontier = {0}
    for h in range(1, hops + 1):
        nxt = {
            d
            for s, d in (edges or [(0, 0)])
            if s in frontier and d not in dist
        }
        for d in nxt:
            dist[d] = h
        frontier = nxt
    assert got == dist
    # both modes agree
    got2 = {
        r["nk"]: r["hops"]
        for r in bfs_levels(df, [0], hops, frontier_dedup=False).collect()
    }
    assert got2 == dist
