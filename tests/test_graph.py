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
