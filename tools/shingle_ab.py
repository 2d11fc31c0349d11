"""Round-13 interleaved A/B of the shared-shingle-index change
(VERDICT r12 next-1): OLD shape (each operator builds its own
exploded-shingles index — reconstructed inline from the same public
operators with shingles=None) vs NEW shape (the registered query,
one shared localCheckpoint'ed index), alternated in ONE session,
plus a row-level equality check between the two forms.
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
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark import get_spark
    from mapreduce_kmeans_clustering_spark.operators import dedup as D
    from mapreduce_kmeans_clustering_spark.queries_pipeline import (
        JACCARD_THRESHOLD,
        VERIFY_THRESHOLD,
        _docs,
    )
    from mapreduce_kmeans_clustering_spark.queries import ALL_QUERIES

    spark = get_spark(app_name="mrkc-shingle-ab")
    sf_dir = args.sf_dir
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1).count()

    def old_minhash_pr():
        docs = _docs(spark, sf_dir)
        cand = D.lsh_candidate_pairs(docs).select("a", "b").withColumn("_c", F.lit(1))
        truth = (
            D.jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
            .select("a", "b")
            .withColumn("_t", F.lit(1))
        )
        m = cand.join(truth, ["a", "b"], "full_outer").agg(
            F.sum("_c").cast("long").alias("n_candidates"),
            F.sum("_t").cast("long").alias("n_true"),
            F.sum(F.col("_c") * F.col("_t")).cast("long").alias("n_hits"),
        )
        return m.select(
            "n_candidates", "n_true", "n_hits",
            F.round(F.col("n_hits") * F.lit(1.0) / F.col("n_candidates"), 6).alias("prec"),
            F.round(F.col("n_hits") * F.lit(1.0) / F.col("n_true"), 6).alias("recall"),
        )

    def old_dedup_pipeline():
        docs = _docs(spark, sf_dir)
        exact_drops = D.exact_dup_drops(docs).select("doc_id")
        survivors = docs.join(exact_drops, "doc_id", "left_anti")
        cands = D.lsh_candidate_pairs(survivors)
        verified = D.jaccard_for_pairs(survivors, cands).where(
            F.col("jaccard") >= VERIFY_THRESHOLD
        )
        near_drops = verified.select(F.col("b").alias("doc_id")).distinct()
        return (
            docs.select("doc_id")
            .join(exact_drops.withColumn("_ex", F.lit(1)), "doc_id", "left")
            .join(near_drops.withColumn("_nd", F.lit(1)), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("_ex") == 1, F.lit("exact_dup"))
                .when(F.col("_nd") == 1, F.lit("near_dup"))
                .otherwise(F.lit("keep"))
                .alias("status"),
            )
        )

    pairs = {
        "q_minhash_pr": (old_minhash_pr, ALL_QUERIES["q_minhash_pr"]),
        "q_dedup_pipeline": (old_dedup_pipeline, ALL_QUERIES["q_dedup_pipeline"]),
    }

    out: dict[str, dict[str, list[float]]] = {
        k: {"old": [], "new": []} for k in pairs
    }
    for _ in range(args.rounds):
        for name, (old_fn, new_fn) in pairs.items():
            t0 = time.perf_counter()
            old_fn().write.mode("overwrite").format("noop").save()
            out[name]["old"].append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            new_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            out[name]["new"].append(round(time.perf_counter() - t0, 3))

    eq = {}
    for name, (old_fn, new_fn) in pairs.items():
        a = sorted(map(tuple, old_fn().collect()))
        b = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
        eq[name] = a == b
    print(json.dumps({
        "timings": out,
        "min": {k: {s: min(v) for s, v in d.items()} for k, d in out.items()},
        "rows_equal_old_vs_new": eq,
    }, indent=1))


if __name__ == "__main__":
    main()
