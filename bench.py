"""Benchmark harness: runs every registered query plus a convergent
K-Means fit at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries are forced through the `noop` sink so the full plan executes
(count() alone would let Catalyst prune the computed columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from mapreduce_kmeans_clustering_spark import get_spark
    from mapreduce_kmeans_clustering_spark.plans.kmeans import fit
    from mapreduce_kmeans_clustering_spark.queries import (
        ALL_QUERIES,
        scale_points,
        scale_seeds,
    )

    spark = get_spark(app_name="mrkc-bench")
    timings: dict[str, float] = {}

    # warm the JVM/codegen once so per-query numbers reflect steady state
    scale_points(spark, sf_dir).limit(1).count()

    for name, fn in sorted(ALL_QUERIES.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pts = scale_points(spark, sf_dir).cache()
    res = fit(pts, scale_seeds(spark, sf_dir), max_iter=30, threshold=5.0)
    timings["fit_converge"] = round(time.perf_counter() - t0, 3)
    timings["fit_iterations"] = res.iterations
    pts.unpersist()

    # the BLAS path: convergent 64-dim Lloyd over the embeddings table
    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark.plans.kmeans_nd import fit_nd

    t0 = time.perf_counter()
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )
    nd = fit_nd(emb, k=8, max_iter=10, threshold=1e-3)
    timings["fit_nd_converge"] = round(time.perf_counter() - t0, 3)
    timings["fit_nd_iterations"] = nd.iterations
    emb.unpersist()

    total = round(
        sum(
            v
            for k, v in timings.items()
            if k not in ("fit_iterations", "fit_nd_iterations")
        ),
        3,
    )
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
