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

from responsive_pub_spark.functions.portable import pround
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
