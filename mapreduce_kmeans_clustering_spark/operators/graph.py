"""Link-graph operators: PageRank for domain/page authority scoring —
the web-curation signal (a la Common Crawl host ranking) that decides
which domains a training corpus should trust. Complements the
connected-components operator in operators/dedup.py (dup_groups);
both follow the same iterative join-aggregate shape.

Physical shape per iteration: ranks ⋈ edges on src (one shuffle on
src), contributions aggregate on dst (one shuffle on dst), plus a
1-row dangling-mass aggregate. Rank state is (node, rank) — never
adjacency on the driver. `localCheckpoint` truncates the lineage each
round (the same iterative-plan hazard documented for dup_groups in
SCALE.md §4.6).

Convergence is damped-fixed-point; numbers are doubles summed in
partition order, so tests compare against a plain-Python replay with
tolerances rather than bit-equality (same posture as PCA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations over the
    directed edge list. Ranks sum to 1; dangling nodes (no out-edges)
    redistribute their mass uniformly, the standard correction."""
    # materialize the deduplicated edge list ONCE: every iteration's
    # dangling aggregate and contribution join re-reads it, and
    # without the pin each of those actions replays the full upstream
    # edge-construction DAG (measured 5.4 s -> 1.9 s for the
    # 3-iteration nation-graph query whose edges come from a
    # 4-table fact join)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iters):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "deg")
        # mass of dangling nodes is shared by everyone
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            with_deg.join(e, with_deg["node"] == e["src"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
