"""Round-13 breakdown of ann_baseline_warmup (VERDICT r12 next-4):
time the two memo builds (_exact_topk form variants, _ivf_assigned)
in one session, interleaved, separating plan+first-action cost from
warm re-execution. Each variant is expressed directly against the
operators so no memo hides the cost being measured.
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

    from mapreduce_kmeans_clustering_spark import get_spark
    from mapreduce_kmeans_clustering_spark.operators import similarity as SIM
    from mapreduce_kmeans_clustering_spark.queries_pipeline import (
        ANN_K,
        ANN_QUERY_IDS,
        IVF_NLIST,
        _emb,
    )

    spark = get_spark(app_name="mrkc-ann-ab")
    sf_dir = args.sf_dir
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(1).count()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    out: dict[str, list[float]] = {}

    def run(name, thunk):
        t0 = time.perf_counter()
        noop(thunk())
        out.setdefault(name, []).append(round(time.perf_counter() - t0, 3))

    for _ in range(args.rounds):
        emb = _emb(spark, sf_dir)
        run("exact_topk_unrolled64", lambda: SIM.cosine_topk(
            emb, ANN_QUERY_IDS, k=ANN_K, vec_dim=64))
        run("exact_topk_hof", lambda: SIM.cosine_topk(
            emb, ANN_QUERY_IDS, k=ANN_K, vec_dim=None))
        run("ivf_assign_hof", lambda: SIM.ivf_assign(emb, IVF_NLIST))
    print(json.dumps({k: {"runs": v, "min": min(v)} for k, v in out.items()},
                     indent=1))


if __name__ == "__main__":
    main()
