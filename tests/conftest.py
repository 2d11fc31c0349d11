from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.session import get_spark

REF = "/root/reference"
REF_POINTS_CSV = f"{REF}/3d_points_dataset.csv"
REF_SEEDS_CSV = f"{REF}/seed_points_K5.csv"
TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mrkc-tests", master="local[*]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ref_points(spark):
    from mapreduce_kmeans_clustering_spark.sources.points import read_points_csv

    return read_points_csv(spark, REF_POINTS_CSV).cache()


@pytest.fixture(scope="session")
def ref_seeds():
    from mapreduce_kmeans_clustering_spark.sources.seeds import load_seeds

    return load_seeds(REF_SEEDS_CSV)
