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


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation and local clustering coefficient
    over the UNDIRECTED simple graph induced by the edge list
    (self-loops dropped, parallel edges collapsed):

        (node, degree, n_triangles, clustering)
        clustering = 2 * n_triangles / (degree * (degree - 1)),
        0.0 when degree < 2; rounded to 6 decimals.

    Algorithm: the degree-oriented wedge join (the MapReduce-era
    Cohen / Suri-Vassilvitskii shape, and what GraphFrames' triangle
    count compiles to). Every undirected edge is oriented from the
    endpoint with the LOWER (degree, node) rank to the higher — a
    total order, so each triangle survives in exactly one orientation.
    Wedges join oriented edges on their common source; a wedge
    (u→v, u→w) with rank(v) < rank(w) closes iff the oriented edge
    (v→w) exists — one more equi-join, never an all-pairs scan.

    Scale shape: degree is a |V|-row aggregate (broadcast back onto
    the edge list); the wedge self-join shuffles oriented edges on
    their source. Orientation is the skew defense — a hub of degree d
    would contribute O(d²) wedges as a source, but orientation gives
    every hub mostly IN-edges, capping per-source out-degrees near
    sqrt(|E|) on power-law graphs (the standard result). AQE handles
    the residue.
    """
    e0 = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionAll(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e0.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    o1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    wedges = o1.join(o2, "u").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    tn = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v1").alias("node")))
        .unionAll(tri.select(F.col("v2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(tn, "node", "left")
        .select(
            "node",
            F.col("deg").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.coalesce(F.col("n_triangles"), F.lit(0))
                    * 2.0
                    / (F.col("deg") * (F.col("deg") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def bfs_levels(
    edges: DataFrame,
    sources: list[int],
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    frontier_dedup: bool = True,
) -> DataFrame:
    """Shortest-path hop levels from ``sources`` over a directed edge
    relation, unrolled to ``max_hops`` min-plus rounds:

        dist_{k+1}(v) = min(dist_k(v), min over (u,v) in E of dist_k(u) + 1)

    Returns (nk, hops) for every node reachable within ``max_hops``;
    unreachable nodes are absent (no sentinel infinities).

    Physical shape per round: frontier ⋈ edges on the node key (the
    frontier is |reached| rows, edges broadcast when small), then a
    min aggregate — the same iterative join-aggregate posture as
    pagerank above and dup_groups' label propagation. The unroll is
    FIXED depth, so the plan is finite and replayable declaratively
    (the reference's fixed-R chain posture, SURVEY §2.1 O9 —
    KMeansDriver.java's bounded reducer rounds); for unbounded-depth
    traversals switch to the dup_groups convergence loop with
    deferred checkpoints.
    """
    spark = edges.sparkSession
    d = spark.createDataFrame(
        [(int(s), 0) for s in sources], "nk int, hops int"
    )
    if frontier_dedup:
        for _ in range(max_hops):
            nxt = d.join(edges, d["nk"] == edges[src_col]).select(
                F.col(dst_col).cast("int").alias("nk"),
                (F.col("hops") + F.lit(1)).cast("int").alias("hops"),
            )
            d = (
                d.unionByName(nxt)
                .groupBy("nk")
                .agg(F.min("hops").cast("int").alias("hops"))
            )
        return d
    # path-enumeration mode: expand without per-round dedup and take
    # ONE final min — a single shuffle instead of max_hops of them.
    # Frontier size is Sum_k sources*degree^k, so this is strictly
    # for small max_hops x bounded out-degree (the sparsified-graph
    # case); per-round dedup is the general-graph default.
    layers = [d]
    for _ in range(max_hops):
        d = layers[-1].join(edges, layers[-1]["nk"] == edges[src_col]).select(
            F.col(dst_col).cast("int").alias("nk"),
            (F.col("hops") + F.lit(1)).cast("int").alias("hops"),
        )
        layers.append(d)
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    return out.groupBy("nk").agg(F.min("hops").cast("int").alias("hops"))
