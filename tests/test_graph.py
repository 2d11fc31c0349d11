"""PageRank vs a plain-Python power-iteration replay."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.graph import pagerank


def _python_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, v in set(edges):
        out.setdefault(u, []).append(v)
    n = len(nodes)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        dangling = sum(r[x] for x in nodes if x not in out)
        base = (1 - d) / n + d * dangling / n
        nxt = {x: base for x in nodes}
        for u, vs in out.items():
            share = r[u] / len(vs)
            for v in vs:
                nxt[v] += d * share
        r = nxt
    return r


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1),
    (6, 5), (7, 5), (3, 8),  # 8 is dangling
]


@pytest.fixture(scope="module")
def ranks(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    return got


def test_matches_python_replay(ranks):
    want = _python_pagerank(EDGES, iters=10)
    assert set(ranks) == set(want)
    for k in want:
        assert ranks[k] == pytest.approx(want[k], rel=1e-9)


def test_ranks_sum_to_one_and_hub_wins(ranks):
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks[3] == max(ranks.values())  # most-linked node on top


def test_duplicate_edges_do_not_double_count(spark):
    df = spark.createDataFrame(EDGES + EDGES, "src LONG, dst LONG")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    want = _python_pagerank(EDGES, iters=5)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


# ---------------------------------------------------------------------------
# Triangle counting / clustering coefficient
# ---------------------------------------------------------------------------

def _tri(spark, edges):
    from mapreduce_kmeans_clustering_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {r["node"]: r for r in triangle_counts(df).collect()}


def test_triangle_hand_graph(spark):
    # K3 on {0,1,2} plus a pendant 3-0 and an isolated edge 4-5.
    out = _tri(spark, [(0, 1), (1, 2), (2, 0), (3, 0), (4, 5)])
    assert {n: r["n_triangles"] for n, r in out.items()} == {
        0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0,
    }
    assert out[0]["degree"] == 3 and out[3]["degree"] == 1
    # clustering: node 0 has 3 neighbor pairs, 1 closed -> 1/3
    assert out[0]["clustering"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[1]["clustering"] == 1.0
    assert out[3]["clustering"] == 0.0  # degree < 2 guard


def test_triangle_k4_and_duplicates(spark):
    # K4: each node sits in C(3,2)=3 triangles, clustering 1.0.
    # Duplicate/reversed/self-loop edges must not change anything.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(1, 0), (2, 2), (0, 1), (3, 1)]
    out = _tri(spark, noisy)
    for n in range(4):
        assert out[n]["n_triangles"] == 3
        assert out[n]["degree"] == 3
        assert out[n]["clustering"] == 1.0


def test_triangle_square_has_none(spark):
    # C4 (4-cycle): no triangles, clustering 0 everywhere.
    out = _tri(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert all(r["n_triangles"] == 0 for r in out.values())
    assert all(r["clustering"] == 0.0 for r in out.values())


def test_bfs_levels_min_over_paths(spark):
    from mapreduce_kmeans_clustering_spark.operators.graph import bfs_levels

    # 0->1->2->3 chain plus a 0->2 shortcut; 4 unreachable; 5->0 wrong
    # direction (directed edges must not be followed backwards)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (5, 0)], "src int, dst int"
    )
    got = {r["nk"]: r["hops"] for r in bfs_levels(edges, [0], 3).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_levels_hop_cap_and_multi_source(spark):
    from mapreduce_kmeans_clustering_spark.operators.graph import bfs_levels

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src int, dst int"
    )
    got = {r["nk"]: r["hops"] for r in bfs_levels(chain, [0], 2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # nodes past the cap absent
    got2 = {r["nk"]: r["hops"] for r in bfs_levels(chain, [0, 4], 2).collect()}
    assert got2 == {0: 0, 1: 1, 2: 2, 4: 0, 5: 1, 6: 2}


def test_bfs_path_enumeration_mode_equals_dedup_mode(spark):
    from mapreduce_kmeans_clustering_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (2, 0), (3, 1)], "src int, dst int"
    )
    a = sorted(map(tuple, bfs_levels(edges, [0], 3).collect()))
    b = sorted(
        map(tuple, bfs_levels(edges, [0], 3, frontier_dedup=False).collect())
    )
    assert a == b
