"""Behavioral tests for similarity search (brute-force + LSH)."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.similarity import (
    cosine_topk,
    hyperplanes,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    import math

    rows = []
    # 40 vectors on a ring in 4-d; neighbors are adjacent angles
    for i in range(40):
        a = 2 * math.pi * i / 40
        rows.append((i, [math.cos(a), math.sin(a), 0.1, -0.1]))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_hyperplanes_deterministic():
    a = hyperplanes(8, 4)
    b = hyperplanes(8, 4)
    assert a == b
    assert all(c in (-1.0, 1.0) for row in a for c in row)


def test_cosine_topk_finds_ring_neighbors(emb):
    out = cosine_topk(emb, query_ids=[0], k=2, vec_col="embedding")
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == [1, 39] or [
        r["neighbor_id"] for r in rows
    ] == [39, 1]
    assert rows[0]["cos"] > 0.98
    # self excluded
    assert all(r["neighbor_id"] != 0 for r in rows)


def test_topk_respects_k_and_rank(emb):
    out = cosine_topk(emb, query_ids=[0, 5, 10], k=3, vec_col="embedding")
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 5, 10}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_lsh_topk_subset_of_bucket_with_sane_cos(emb):
    """LSH results are exact cosines over bucket-restricted candidates:
    every (query, neighbor) it returns must score identically in the
    brute-force result set."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in cosine_topk(emb, query_ids=[0, 7], k=39, vec_col="embedding").collect()
    }
    approx = lsh_topk(emb, query_ids=[0, 7], k=3, dim=4, vec_col="embedding").collect()
    assert len(approx) > 0
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        assert key in brute
        assert r["cos"] == pytest.approx(brute[key], abs=1e-12)


def test_ivf_index_partition_pruning(spark, tmp_path):
    from mapreduce_kmeans_clustering_spark.operators.similarity import (
        ivf_assign,
        ivf_probe_index,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    ivf_write_index(emb, path, nlist=8)

    probed = ivf_probe_index(spark, path, [1, 3])
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the list filter must prune partitions at the scan, not filter rows
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters")[1][:200]

    expected = ivf_assign(emb, nlist=8)
    got_ids = {r["vec_id"] for r in probed.collect()}
    exp_ids = {
        r["vec_id"] for r in expected.where("list_id in (1, 3)").collect()
    }
    assert got_ids == exp_ids and got_ids
