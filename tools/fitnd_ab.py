"""Round-13 idle A/B of fit_nd's timed input layout (VERDICT r12
next-3): interleave 1/4/8/16-partition cached inputs in ONE session,
min-of-N each, so host noise cannot masquerade as a layout effect.
Mirrors bench.py's fit_nd block exactly (cache + fit_nd(k=8,
max_iter=10, threshold=1e-3) + unpersist).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--parts", default="1,4,8,16")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark import get_spark
    from mapreduce_kmeans_clustering_spark.plans.kmeans_nd import fit_nd

    spark = get_spark(app_name="mrkc-fitnd-ab")
    sf_dir = args.sf_dir
    parts = [int(p) for p in args.parts.split(",")]
    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    out: dict[str, list[float]] = {str(p): [] for p in parts}
    iters: dict[str, int] = {}
    # one throwaway warm pass so JVM/codegen cost lands nowhere
    emb0 = raw.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).cache()
    fit_nd(emb0, k=8, max_iter=10, threshold=1e-3)
    emb0.unpersist()

    for _ in range(args.rounds):
        for p in parts:
            df = raw if p == 1 else raw.repartition(p)
            t0 = time.perf_counter()
            emb = df.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"),
            ).cache()
            nd = fit_nd(emb, k=8, max_iter=10, threshold=1e-3)
            out[str(p)].append(round(time.perf_counter() - t0, 3))
            iters[str(p)] = nd.iterations
            emb.unpersist()
    print(json.dumps({"timings": out, "iterations": iters,
                      "min": {k: min(v) for k, v in out.items()}}))


if __name__ == "__main__":
    main()
