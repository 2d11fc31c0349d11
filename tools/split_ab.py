"""Round-13 interleaved A/B of the scan-split policy per key (VERDICT
r12 next-6): flip queries_pipeline._SCAN_SPLIT_MIN_BYTES between a
normal value and 'never split' inside ONE session, min-of-N per arm,
to quantify the round-robin-Exchange tax on join/agg-first consumers
vs its win on scan-local-heavy keys.
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mapreduce_kmeans_clustering_spark import get_spark
    from mapreduce_kmeans_clustering_spark import queries_pipeline as QP
    from mapreduce_kmeans_clustering_spark.queries import ALL_QUERIES

    spark = get_spark(app_name="mrkc-split-ab")
    sf_dir = args.sf_dir
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    # arms flip the TABLE-DEFAULT policy: "split" = r12's
    # split-everything behavior, "nosplit" = the round-13 default
    # (documents/embeddings only). Call-site split= overrides are
    # honored in both arms.
    tables = "lineitem orders customer part supplier nation region events documents embeddings".split()
    r12_policy = {t: True for t in tables}
    r13_policy = dict(QP._SCAN_SPLIT_DEFAULT)
    out: dict[str, dict[str, list[float]]] = {
        n: {"split": [], "nosplit": []} for n in args.names
    }
    for i in range(args.rounds):
        for name in args.names:
            fn = ALL_QUERIES[name]
            arms = [("split", r12_policy), ("nosplit", r13_policy)]
            if i % 2:  # alternate order: warm-cache bias cancels
                arms.reverse()
            for arm, v in arms:
                QP._SCAN_SPLIT_DEFAULT = v
                # the events relation is memoized per app x sf_dir; a
                # cache pinned under one arm would leak into the other
                for df in QP._EVENTS_CACHE.values():
                    df.unpersist()
                QP._EVENTS_CACHE.clear()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                out[name][arm].append(round(time.perf_counter() - t0, 3))
    QP._SCAN_SPLIT_DEFAULT = r13_policy
    print(json.dumps({
        "timings": out,
        "min": {n: {a: min(v) for a, v in d.items()} for n, d in out.items()},
    }, indent=1))


if __name__ == "__main__":
    main()
