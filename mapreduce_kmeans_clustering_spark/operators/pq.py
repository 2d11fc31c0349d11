"""Product quantization (PQ) — vector compression + ADC search.

Public basis: Jegou, Douze & Schmid, "Product Quantization for Nearest
Neighbor Search" (IEEE TPAMI 2011): split each ``dim``-dimensional
vector into ``m`` contiguous subspaces, quantize each subspace against
its own ``ksub``-codeword codebook, and answer nearest-neighbor
queries with Asymmetric Distance Computation (ADC) — the query stays
exact while every database vector is represented by ``m`` small codes.

Why it belongs in this engine: the embeddings column is the widest
thing a 100 TB corpus carries (64 float64s = 512 B/row after cast).
PQ codes at m=8, ksub=16 are 8 nibbles — 4 B/row, a 128x reduction —
and ADC scans touch only the code columns, so the similarity family
(operators/similarity.py) gets a memory-resident scan path at corpus
scale. This extends the reference's quantization story the same way
kmeans_nd extends its 3-D Lloyd: the codebook trainer IS per-subspace
K-Means (reference Task1-Task3 semantics, provenance
Task1.java:31-60 assign / Task2 mean update), so `train_codebooks`
simply runs plans/kmeans_nd.fit_nd on each slice.

Physical design:
- ENCODE is scan-local: the m codebooks are inlined as literal arrays
  (constants travel in the serialized plan — the same zero-shuffle
  centroid channel as operators/assign.py:57 and semantic_assign_expr)
  and each subspace argmin is ``array_min(transform(codebook_literal,
  (cw, i) -> struct(sqdist, i)))`` — ONE transform per subspace, the
  measured-fastest expression packaging (SCALE.md §4.17). No join, no
  Exchange, no Python.
- ADC pairs each query against every encoded vector through a
  broadcast of the (bounded) query set; each database row is DECODED
  once scan-local (element_at over the literal codebooks) and the
  per-pair distance is one 64-element sqdist aggregate —
  element-ascending, left-associated, bit-identical to the DuckDB
  oracle's list_sum(list_transform(...)) over concatenated codeword
  slices.
- The production twin `pq_adc_topk_lut` builds the classic per-query
  lookup table (m x ksub sqdists) once in numpy and scans codes via
  Arrow-batched mapInPandas — O(1) float ops per (query, vector,
  subspace) instead of O(sub_dim), the shape a vector engine ships.
  Pinned equal to the expression form in tests/test_pq.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_kmeans_clustering_spark.functions.literals import const_vec

DEFAULT_DIM = 64
DEFAULT_M = 8
DEFAULT_KSUB = 16


def subspace_offsets(dim: int = DEFAULT_DIM, m: int = DEFAULT_M) -> list[tuple[int, int]]:
    """(0-based offset, width) of each contiguous subspace; dim must
    split evenly (the paper's layout; uneven tails would silently
    change every distance, so fail loudly)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    return [(s * sub, sub) for s in range(m)]


def seeded_codebooks(
    vectors: DataFrame,
    m: int = DEFAULT_M,
    ksub: int = DEFAULT_KSUB,
    dim: int = DEFAULT_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic codebooks: codeword ``c`` of subspace ``s`` is the
    s-th slice of the vector with the c-th LOWEST id (orderBy+limit —
    TakeOrdered, no Exchange; robust to sparse/offset id spaces). This
    is the oracle-replayable seeding policy shared with
    seed_centroids_nd and semantic_dedup; `train_codebooks` is the
    quality path."""
    rows = (
        vectors.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors to seed codebooks, got {len(rows)}")
    offs = subspace_offsets(dim, m)
    return [
        [[float(x) for x in r["v"][off : off + sub]] for r in rows]
        for (off, sub) in offs
    ]


def train_codebooks(
    vectors: DataFrame,
    m: int = DEFAULT_M,
    ksub: int = DEFAULT_KSUB,
    dim: int = DEFAULT_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    threshold: float = 1e-4,
) -> list[list[list[float]]]:
    """Production codebooks: per-subspace Lloyd K-Means via
    plans/kmeans_nd.fit_nd (BLAS assign, fused Arrow partials). Each
    subspace trains on its slice independently — m small fits over the
    same scan, centroid state m*ksub*sub_dim floats on the driver.
    Empty clusters drop out during Lloyd; the codebook keeps the
    converged centroids (codes stay dense 0..len-1)."""
    from mapreduce_kmeans_clustering_spark.plans.kmeans_nd import fit_nd

    offs = subspace_offsets(dim, m)
    books: list[list[list[float]]] = []
    for off, sub in offs:
        sliced = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col).cast("array<double>"), off + 1, sub).alias(
                "embedding"
            ),
        )
        res = fit_nd(sliced, k=ksub, max_iter=max_iter, threshold=threshold)
        books.append([list(c) for c in res.centroids])
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector to ``codes`` (array<int>, one per subspace)
    plus ``recon_sqdist`` (summed chosen sub-distances — the squared
    reconstruction error, free from the argmin). Scan-local: codebooks
    ride the plan as literals, ties break to the lowest code via
    struct ordering (array_min over struct(d, code)).

    Expression shape (measured A/B at sf0.1, 5k x 64, local[32]): the
    per-subspace argmin is ONE ``transform`` over the literal codebook
    with the (codeword, index) lambda computing the slice sqdist —
    4.2-7.2 s as m*ksub separate HOF aggregates, 8-9 s fully unrolled
    (the ~3k-node janino compile dominates at this ksub), 1.9 s as
    transform-with-index. Same doubles, same argmin: the inner
    zip_with/aggregate math and the struct(d, code) ordering are
    identical — only the expression-tree packaging changes
    (SCALE.md §4.11's node-count rule applied once more)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    bests = []
    for s in range(m):
        off = s * sub
        lit = F.array(*[const_vec(cw) for cw in codebooks[s]])
        sl = F.slice(v, off + 1, sub)
        cands = F.transform(
            lit,
            lambda cw, i: F.struct(
                F.aggregate(
                    F.zip_with(sl, cw, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ).alias("d"),
                i.cast("int").alias("code"),
            ),
        )
        bests.append(F.array_min(cands))
    recon = bests[0]["d"]
    for b in bests[1:]:
        recon = recon + b["d"]
    return vectors.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.array(*[b["code"] for b in bests]).alias("codes"),
        recon.alias("recon_sqdist"),
    )


_ENC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
        T.StructField("recon_sqdist", T.DoubleType()),
    ]
)


def pq_encode_blas(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production encode twin: Arrow-batched mapInPandas computing all
    m argmins per batch with one numpy distance block per subspace
    ((N, ksub) sqdists via the expansion |x|^2 - 2xC^T + |c|^2 —
    O(N*ksub*sub) BLAS flops, no per-row interpretation). np.argmin
    takes the FIRST minimum, preserving the lowest-code tie-break.
    Same verdicts as `pq_encode` on real data (pinned in
    tests/test_pq.py); float-sum ORDER differs (pairwise numpy
    reduction vs left-associated HOF), so last-ulp recon drift is
    possible — the oracle-gated registered query stays on the
    expression form, the established BLAS-twin convention
    (plans/kmeans_nd.py, dedup.semantic_dedup_blas)."""
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = np.array(codebooks, dtype=np.float64)  # (m, ksub, sub)
    bnorm = (books**2).sum(axis=2)  # (m, ksub)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)  # (N, dim)
            xs = x.reshape(len(ids), m, sub)  # (N, m, sub)
            codes = np.empty((len(ids), m), dtype=np.int32)
            recon = np.zeros(len(ids), dtype=np.float64)
            for s in range(m):
                d = (
                    (xs[:, s, :] ** 2).sum(axis=1)[:, None]
                    - 2.0 * xs[:, s, :] @ books[s].T
                    + bnorm[s][None, :]
                )  # (N, ksub)
                c = d.argmin(axis=1)
                codes[:, s] = c
                # exact chosen sub-distance (the expansion form can go
                # slightly negative on near-zero distances)
                recon += ((xs[:, s, :] - books[s][c]) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": ids, "codes": list(codes), "recon_sqdist": recon}
            )

    return vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(enc, schema=_ENC_SCHEMA)


def pq_decode_expr(codes: Column, codebooks: list[list[list[float]]]) -> Column:
    """Reconstructed vector: concat of each subspace's selected
    codeword, indexed out of literal nested arrays (element_at is
    1-based)."""
    parts = []
    for s, book in enumerate(codebooks):
        lit = F.array(*[const_vec(cw) for cw in book])
        parts.append(F.element_at(lit, F.element_at(codes, s + 1) + F.lit(1)))
    return F.concat(*parts)


def pq_adc_dist_expr(
    qv: Column, codes: Column, codebooks: list[list[list[float]]]
) -> Column:
    """ADC distance: sqdist between the EXACT query vector and the
    decoded database vector — mathematically d(q, decode(x)), one HOF
    aggregate over the 64 concatenated elements (index-ascending,
    left-associated: the same doubles as DuckDB's
    list_sum(list_transform(range(1, dim+1), ...)) over the
    concatenated codeword slices). Prefer computing decode ONCE per
    database row (scan-local) and passing the decoded column here —
    see pq_adc_topk; per-pair decode re-selects codewords
    |queries| times over."""
    return F.aggregate(
        F.zip_with(
            qv, pq_decode_expr(codes, codebooks), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_adc_topk(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Top-k neighbors per query by ADC distance — expression form
    (the oracle-gated twin of `pq_adc_topk_lut`).

    Plan: encode the corpus and DECODE it once per row (both
    scan-local — codes select codewords out of plan literals, so the
    decoded array costs 8 element_ats per database row, not per pair),
    broadcast the bounded query set (len(query_ids) rows) through a
    crossJoin — a BroadcastNestedLoopJoin against a K-row side, the
    engine's blessed bounded-fanout shape (SCALE.md §4.10) — score
    each pair with ONE 64-element aggregate, then one rank window
    partitioned by query. Measured at sf0.1 (5k rows, local[32]): the
    per-pair 8-aggregate subspace form ran 3.0-3.6 s, decode-once +
    single aggregate 2.7-2.8 s."""
    enc = encoded if encoded is not None else pq_encode(vectors, codebooks, id_col, vec_col)
    dec = enc.select(
        F.col(id_col).alias("neighbor_id"),
        pq_decode_expr(F.col("codes"), codebooks).alias("_dec"),
    )
    queries = (
        vectors.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
    )
    pairs = dec.crossJoin(F.broadcast(queries))
    pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with("qv", "_dec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("adist"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist")
    )


_ADC_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("adist", T.DoubleType()),
    ]
)


def pq_adc_topk_lut(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Production ADC: per-query distance lookup tables (m x ksub
    sqdists, built once in numpy from the collected K query vectors)
    broadcast to an Arrow-batched mapInPandas scan over the CODES
    table — each (query, vector) distance is m table lookups + adds,
    independent of sub_dim, and the scan never touches the original
    vectors. Per-partition top-k partials (heap via np.argpartition)
    then one final rank window over candidates <= parts * k rows.
    Verdict-pinned equal to pq_adc_topk in tests/test_pq.py."""
    import numpy as np

    enc = encoded if encoded is not None else pq_encode(vectors, codebooks, id_col, vec_col)
    qrows = (
        vectors.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, F.col(vec_col).cast("array<double>").alias("qv"))
        .collect()
    )
    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = np.array(codebooks, dtype=np.float64)  # (m, ksub, sub)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)  # (Q, dim)
    # LUT[q, s, c] = sqdist(query q's slice s, codeword c of subspace s)
    qsl = qmat.reshape(len(qids), m, sub)  # (Q, m, sub)
    luts = ((qsl[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)

    kk = int(k)

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (N, m)
            nids = pdf["_nid"].to_numpy()
            out = []
            for qi, qid in enumerate(qids):
                # dist[n] = sum_s LUT[qi, s, codes[n, s]]
                d = luts[qi, np.arange(m)[None, :], codes].sum(axis=1)
                mask = nids != qid
                dm, nm = d[mask], nids[mask]
                if not len(dm):
                    continue
                take = min(kk, len(dm))
                # partial top-k must respect the SAME (adist, neighbor_id)
                # total order as the final rank window and the expression
                # twin pq_adc_topk: with tied distances (duplicate
                # embeddings are common in dedup corpora) a distance-only
                # argpartition could drop the tied neighbor with the
                # lowest id from a batch. lexsort: last key is primary.
                idx = np.lexsort((nm, dm))[:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": nm[idx],
                            "adist": dm[idx],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    cand = enc.select(F.col(id_col).alias("_nid"), "codes").mapInPandas(
        scan, schema=_ADC_SCHEMA
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "rank", "adist")
    )


def residual_codebooks(
    residuals: DataFrame,
    skip_ids: int,
    m: int = DEFAULT_M,
    ksub: int = DEFAULT_KSUB,
    dim: int = DEFAULT_DIM,
    id_col: str = "vec_id",
    vec_col: str = "r",
) -> list[list[list[float]]]:
    """Seeded codebooks over RESIDUAL vectors, skipping the first
    ``skip_ids`` ids: the coarse-quantizer seeds' own residuals are
    exactly zero (each seed is its list's centroid), so seeding from
    them would degenerate every codeword to the origin. Takes the
    ksub lowest ids >= skip_ids instead — deterministic and
    SQL-derivable like seeded_codebooks."""
    rows = (
        residuals.where(F.col(id_col) >= skip_ids)
        .select(F.col(id_col), F.col(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"need >= {ksub} residuals with id >= {skip_ids}")
    offs = subspace_offsets(dim, m)
    return [
        [[float(x) for x in r["v"][off : off + sub]] for r in rows]
        for (off, sub) in offs
    ]


def ivfpq_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = DEFAULT_M,
    ksub: int = DEFAULT_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVFADC (Jegou et al. 2011 §IV): coarse inverted-list quantizer
    + product-quantized RESIDUALS + asymmetric distance — the
    two-level index a production vector store runs at billion scale.

    - coarse: operators/similarity.ivf_assign (cosine argmin against
      the nlist seed table, broadcast fanout, one hash agg);
    - residual r = v - centroid(list), PQ-encoded with codebooks
      seeded from the ksub lowest non-seed ids (residual_codebooks);
    - search: probe the nprobe best lists per query (by cosine, the
      same probe rule as ivf_topk), form the query's PER-LIST residual
      qr = q - centroid(list), and rank candidates by the ADC
      estimate ||qr - decode(code)||^2 — one 64-element aggregate per
      pair, decode computed scan-local per database row.

    Candidate work per query is |corpus| * nprobe / nlist pairs over
    4-byte codes; the exact vectors are touched only at scan time.
    Expression form throughout (bit-matched by the q_ann_ivfpq
    oracle); the BLAS/LUT twins for each stage exist on the flat-PQ
    path (pq_encode_blas / pq_adc_topk_lut) and compose the same way."""
    from mapreduce_kmeans_clustering_spark.operators.similarity import ivf_assign

    if assigned is None:
        assigned = ivf_assign(vectors, nlist, id_col, vec_col)  # (id, v, list_id)
    vecs = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    seeds = F.broadcast(
        vecs.where(F.col(id_col) < nlist).select(
            F.col(id_col).alias("list_id"), F.col("v").alias("sv")
        )
    )
    res = assigned.join(seeds, "list_id").select(
        F.col(id_col),
        "list_id",
        F.zip_with("v", "sv", lambda a, b: a - b).alias("r"),
    )
    books = residual_codebooks(res, skip_ids=nlist, m=m, ksub=ksub)
    # list_id rides through the encode projection, so the decoded
    # relation needs no join back to res (scan-local end to end)
    enc = pq_encode(res, books, id_col=id_col, vec_col="r", keep_cols=("list_id",))
    dec = enc.select(
        F.col(id_col).alias("neighbor_id"),
        "list_id",
        pq_decode_expr(F.col("codes"), books).alias("_dec"),
    )

    from pyspark.sql import Window

    q = vecs.where(F.col(id_col).isin([int(x) for x in query_ids])).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    from mapreduce_kmeans_clustering_spark.functions.distance import (
        cosine_similarity,
    )

    pw = Window.partitionBy("query_id").orderBy(F.col("qc").desc(), F.col("list_id"))
    probes = (
        q.crossJoin(seeds)
        .select(
            "query_id",
            "qv",
            "list_id",
            cosine_similarity(F.col("qv"), F.col("sv")).alias("qc"),
            F.zip_with("qv", "sv", lambda a, b: a - b).alias("qr"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "list_id", "qr")
    )
    cand = probes.join(dec, "list_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with("qr", "_dec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("adist"),
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query_id", "neighbor_id", "rank", "adist")
    )
