"""Similarity search over embedding columns (array<float>).

LLM-pipeline extension (no analog in the reference — its async framework is
the hook for embedding RPCs, api/async/AsyncProcessorSupplier.java:34-115).

Two strategies:
- ``brute_force_topk``: exact cosine top-k. Query side is small (a handful of
  probe vectors) so it is BROADCAST against the full corpus scan — at 100 TB
  the corpus is scanned once, never shuffled, and the top-k per query is a
  partial-aggregated window; cost is O(corpus * queries).
- ``lsh_topk``: random-hyperplane bucketing; only same-bucket candidates are
  scored. The bucket id is a per-row JVM expression; candidate generation is
  an equi-join on (bucket), turning O(n*q) into O(n*q/2^bits) at scale.

Cosine math is the engine-portable double left-fold from
``functions.vectors`` so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from responsive_pub_spark.functions.portable import dround, pround
from responsive_pub_spark.functions.vectors import (
    RHP_BITS,
    cosine_duck,
    cosine_sql,
    rhp_bucket_sql,
)

DEFAULT_K = 5
N_QUERY_VECS = 5
EMBED_DIM = 64
LSH_QUERY_VECS = 20
LSH_K = 3


def brute_force_topk(
    emb: DataFrame,
    k: int = DEFAULT_K,
    n_queries: int = N_QUERY_VECS,
) -> DataFrame:
    """Exact cosine top-k neighbors for the first `n_queries` vectors.

    Deterministic ranking: (rounded cosine DESC, neighbor id ASC)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", pround(F.expr(cosine_sql("qv", "cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def brute_force_topk_oracle(k: int = DEFAULT_K, n_queries: int = N_QUERY_VECS) -> str:
    cos = cosine_duck("q.embedding", "c.embedding")
    return f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   (floor(({cos}) * 1000000 + 0.5) / 1000000) AS cosine
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {n_queries}
        ), ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
    """


def lsh_topk(
    emb: DataFrame,
    k: int = LSH_K,
    n_queries: int = LSH_QUERY_VECS,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's RHP bucket."""
    bucket = F.expr(rhp_bucket_sql("embedding", dim, "spark", RHP_BITS))
    withb = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    q = withb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = withb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", pround(F.expr(cosine_sql("qv", "cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


IVF_CENTROIDS = 8
IVF_PROBES = 2
IVF_K = 3
IVF_QUERY_VECS = 10


def train_centroids(
    emb: DataFrame, n_centroids: int = IVF_CENTROIDS, iters: int = 2
) -> DataFrame:
    """Lloyd k-means for IVF centroids, fully declarative (no Python loop
    over data — the driver loop iterates PLANS, each iteration is one
    broadcast-join assignment pass + one element-wise mean):

      assign: corpus x broadcast(centroids) -> argmax-cosine cid
      update: posexplode embedding -> per-(cid, dim) mean -> re-assembled
              array via sorted collect

    Engine-portable determinism: the per-dimension mean is a LEFT FOLD in
    vec_id order (sorted collect + ``aggregate``), not ``avg()`` — float
    summation order is pinned, so the same IEEE-754 result falls out of
    Spark and DuckDB and the unrolled-SQL oracle (``ivf_trained_oracle``)
    hash-matches. Components are pround'd to 6 decimals per iteration.
    Init = the first ``n_centroids`` vectors (deterministic, same as the
    pinned variant). Training state per group is O(cluster size) via
    collect_list — fine for centroid training, which at 100 TB runs on a
    sample of the corpus, not the full table."""
    cent = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centv")
    )
    for _ in range(iters):
        scored = emb.join(F.broadcast(cent)).withColumn(
            "ccos", pround(F.expr(cosine_sql("embedding", "centv")), 6)
        )
        assign = scored.groupBy("vec_id", "embedding").agg(
            F.max_by(F.col("cid"), F.struct(F.col("ccos"), -F.col("cid"))).alias("cid")
        )
        dims = assign.select(
            "vec_id", "cid", F.posexplode("embedding").alias("pos", "x")
        )
        means = dims.groupBy("cid", "pos").agg(
            pround(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("vec_id"), F.col("x").cast("double").alias("x")
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["x"],
                )
                / F.count("*").cast("double"),
                6,
            ).alias("m")
        )
        cent = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centv")
        )
    return cent


def ivf_topk(
    emb: DataFrame,
    k: int = IVF_K,
    n_queries: int = IVF_QUERY_VECS,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = IVF_PROBES,
    centroids: "DataFrame | None" = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest centroid
    (inverted lists); a query probes only its ``n_probes`` nearest lists.

    Centroids are pinned deterministically (the first ``n_centroids``
    vectors) instead of k-means — the index STRUCTURE is the scale story:
    at 100 TB the assignment is one broadcast-join pass over the corpus
    (centroids are tiny), the probe lookup shuffles only on centroid id,
    and each query scores ~corpus/n_centroids*n_probes candidates instead
    of the full corpus. Pass ``centroids=train_centroids(emb)`` for k-means
    lists — changes recall, not the plan."""
    if centroids is not None:
        cent = centroids
    else:
        cent = emb.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("centv")
        )
    scored_c = emb.join(F.broadcast(cent)).withColumn(
        "ccos", pround(F.expr(cosine_sql("embedding", "centv")), 6)
    )
    # inverted-list assignment: argmax centroid per vector (ties -> low cid)
    assign = scored_c.groupBy("vec_id", "embedding").agg(
        F.max_by(F.col("cid"), F.struct(F.col("ccos"), -F.col("cid"))).alias("cid")
    )
    # query probe lists: top n_probes centroids per query
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        scored_c.filter(F.col("vec_id") < n_queries)
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= n_probes)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cid")
    )
    cand = assign.join(F.broadcast(probes), "cid").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.withColumn(
        "cosine", pround(F.expr(cosine_sql("qv", "embedding")), 6)
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk_oracle(
    k: int = IVF_K,
    n_queries: int = IVF_QUERY_VECS,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = IVF_PROBES,
) -> str:
    ccos = cosine_duck("e.embedding", "c.embedding")
    qcos = cosine_duck("p.qv", "a.embedding")
    return f"""
        WITH scored_c AS (
            SELECT e.vec_id, e.embedding, c.vec_id AS cid,
                   (floor(({ccos}) * 1000000 + 0.5) / 1000000) AS ccos
            FROM embeddings e JOIN embeddings c ON c.vec_id < {n_centroids}
        ), assign AS (
            SELECT vec_id, embedding, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM scored_c
            ) WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, embedding AS qv, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS prank
                FROM scored_c WHERE vec_id < {n_queries}
            ) WHERE prank <= {n_probes}
        ), scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   (floor(({qcos}) * 1000000 + 0.5) / 1000000) AS cosine
            FROM assign a JOIN probes p USING (cid)
            WHERE p.query_id <> a.vec_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
                AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def _kmeans_cte(n_centroids: int, iters: int) -> str:
    """DuckDB CTE chain unrolling ``train_centroids``: ``iters`` Lloyd
    iterations as SQL, ending in ``cent_{iters}(cid, centv)``. Every float
    op mirrors the Spark side exactly: pround'd cosines, and per-dimension
    means as a left fold in vec_id order (list(... ORDER BY vec_id) +
    list_reduce) — the order-pinning that makes the iterative query
    hash-oracle-able at all."""
    fold_mean = dround(
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list(CAST(x AS DOUBLE) ORDER BY vec_id)), (acc, v) -> acc + v)"
        " / CAST(count(*) AS DOUBLE)",
        6,
    )
    parts = [
        f"cent_0 AS (SELECT vec_id AS cid, embedding AS centv "
        f"FROM embeddings WHERE vec_id < {n_centroids})"
    ]
    for i in range(1, iters + 1):
        ccos = dround(cosine_duck("e.embedding", "c.centv"), 6)
        parts.append(
            f"scored_{i} AS (SELECT e.vec_id, e.embedding, c.cid, {ccos} AS ccos "
            f"FROM embeddings e CROSS JOIN cent_{i - 1} c)"
        )
        parts.append(
            f"assign_{i} AS (SELECT vec_id, embedding, cid FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY ccos DESC, cid ASC) AS rn FROM scored_{i}) WHERE rn = 1)"
        )
        parts.append(
            f"dims_{i} AS (SELECT vec_id, cid, "
            f"generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x "
            f"FROM assign_{i})"
        )
        parts.append(
            f"means_{i} AS (SELECT cid, pos, {fold_mean} AS m "
            f"FROM dims_{i} GROUP BY cid, pos)"
        )
        parts.append(
            f"cent_{i} AS (SELECT cid, list(m ORDER BY pos) AS centv "
            f"FROM means_{i} GROUP BY cid)"
        )
    return ",\n".join(parts)


def ivf_trained_oracle(
    k: int = IVF_K,
    n_queries: int = IVF_QUERY_VECS,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = IVF_PROBES,
    iters: int = 2,
) -> str:
    """Full hash-match oracle for the k-means-trained IVF query: unrolled
    Lloyd training (``_kmeans_cte``) feeding the same probe/assign/top-k
    pipeline as ``ivf_topk_oracle``."""
    ccos = dround(cosine_duck("e.embedding", "c.centv"), 6)
    qcos = dround(cosine_duck("p.qv", "a.embedding"), 6)
    return f"""
        WITH {_kmeans_cte(n_centroids, iters)},
        scored_c AS (
            SELECT e.vec_id, e.embedding, c.cid, {ccos} AS ccos
            FROM embeddings e CROSS JOIN cent_{iters} c
        ), assign AS (
            SELECT vec_id, embedding, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM scored_c
            ) WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, embedding AS qv, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS prank
                FROM scored_c WHERE vec_id < {n_queries}
            ) WHERE prank <= {n_probes}
        ), scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id, {qcos} AS cosine
            FROM assign a JOIN probes p USING (cid)
            WHERE p.query_id <> a.vec_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
                AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def lsh_topk_oracle(
    k: int = LSH_K, n_queries: int = LSH_QUERY_VECS, dim: int = EMBED_DIM
) -> str:
    bucket = rhp_bucket_sql("embedding", dim, "duck", RHP_BITS)
    cos = cosine_duck("q.qv", "c.cv")
    return f"""
        WITH withb AS (
            SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, embedding AS qv, bucket
            FROM withb WHERE vec_id < {n_queries}
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM withb
        ), scored AS (
            SELECT q.query_id, c.neighbor_id, (floor(({cos}) * 1000000 + 0.5) / 1000000) AS cosine
            FROM c JOIN q USING (bucket)
            WHERE q.query_id <> c.neighbor_id
        ), ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
    """
