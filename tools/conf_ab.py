"""Config A/B harness for round 12: times a representative query set
under a given extra session config (one JVM per invocation — pass the
variant via env CONF_VARIANT), so variants are compared across
identical fresh sessions.

Usage: CONF_VARIANT=shj python tools/conf_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    # guide §3.1 / §9: allow shuffled-hash join over sort-merge
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
    # guide §2.3: zstd shuffle codec
    "zstd": {"spark.io.compression.codec": "zstd"},
    "shj_zstd": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
        "spark.io.compression.codec": "zstd",
    },
}

KEYS = [
    "q_dedup_minhash",
    "q_dedup_passages",
    "q_ngram_diversity",
    "q_linkage_entities",
    "q_members",
    "q_copurchase_triangles",
    "q_dedup_jaccard",
    "q_minhash_pr",
    "q_split_leakage",
    "q_dsir_select",
]


def main() -> None:
    variant = os.environ.get("CONF_VARIANT", "base")
    repeat = int(os.environ.get("CONF_REPEAT", "3"))
    from mapreduce_kmeans_clustering_spark import get_spark
    from mapreduce_kmeans_clustering_spark.queries import ALL_QUERIES, scale_points

    spark = get_spark(
        app_name=f"conf-ab-{variant}", extra_conf=VARIANTS[variant]
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale_points(spark, sf_dir).limit(1).count()
    out: dict[str, list[float]] = {}
    for name in KEYS:
        fn = ALL_QUERIES[name]
        runs = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
    print(json.dumps({"variant": variant, "runs": out}))


if __name__ == "__main__":
    main()
