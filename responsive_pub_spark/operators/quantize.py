"""Scalar quantization (SQ8) for embedding columns.

The standard vector-store compression next to PQ (``similarity.pq_topk``):
each dimension is linearly mapped to an unsigned 8-bit code using corpus
per-dimension min/max — a 4x shrink for float32 embeddings with bounded,
per-element reconstruction error. At 100 TB the compressed table is what
ANN scans; raw vectors are only fetched for the final re-rank (same
shortlist pattern as IVF-PQ).

Spark-first plan: one pass computes per-dim stats (posexplode -> 64-key
groupBy — map-side partial aggregation collapses this to 64 rows per
partition before the shuffle), then the stats are BROADCAST back onto the
corpus; quantization itself is pure codegen arithmetic. No Python, no
cross join, corpus shuffled zero times (explode is narrow; the only
exchange moves 64-row partials).

Determinism / oracle parity: min/max are exact selections (no FP
accumulation); the code and the reconstruction error use one fixed
IEEE-754 op order shared with the DuckDB oracle, so values hash-match
bit-for-bit. Reference analog: none (the reference has no vector surface);
this extends the LLM-pipeline inventory (SURVEY.md §2-ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from responsive_pub_spark.functions.portable import pround

#: registry query keeps the first N dims so the gate's row count stays small
SQ8_REGISTRY_DIMS = 8


def sq8_stats(
    emb: DataFrame, vec_col: str = "embedding", max_dim: "int | None" = None
) -> DataFrame:
    """Per-dimension corpus (dim, mn, mx) — the quantizer's codebook.
    ``max_dim`` prunes the explode BEFORE the aggregation (don't pay 64
    dims of explode for an 8-dim codebook)."""
    exploded = emb.select(
        F.posexplode(vec_col).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    if max_dim is not None:
        exploded = exploded.filter(F.col("dim") < int(max_dim))
    return exploded.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )


def _code_expr() -> F.Column:
    # fixed op order: ((x - mn) * 255.0) / (mx - mn), floored and clamped.
    raw = F.floor(((F.col("x") - F.col("mn")) * F.lit(255.0)) / (F.col("mx") - F.col("mn")))
    clamped = F.least(F.lit(255), F.greatest(F.lit(0), raw))
    return F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(clamped).cast("bigint")


def sq8_table(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_dim: "int | None" = None,
) -> DataFrame:
    """Exploded SQ8 codes: one row per (vec, dim) with the 0..255 code and
    the absolute reconstruction error of that element. ``max_dim`` truncates
    to the first N dims (registry/gate shape); None = all dims."""
    exploded = emb.select(
        id_col, F.posexplode(vec_col).alias("dim", "xf")
    ).select(id_col, "dim", F.col("xf").cast("double").alias("x"))
    if max_dim is not None:
        exploded = exploded.filter(F.col("dim") < int(max_dim))
    stats = sq8_stats(emb, vec_col, max_dim=max_dim)
    q = exploded.join(F.broadcast(stats), "dim").withColumn("code", _code_expr())
    recon = F.col("mn") + (
        ((F.col("code") + F.lit(0.5)) * (F.col("mx") - F.col("mn"))) / F.lit(255.0)
    )
    return q.select(
        F.col(id_col),
        F.col("dim").cast("bigint").alias("dim"),
        "code",
        pround(F.abs(F.col("x") - recon), 6).alias("abs_err"),
    )


def sq8_pack(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Library surface: pack exploded codes back to one array per vector
    (dim order), the shape an ANN scan would read. One shuffle on the id."""
    return codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def sq8_oracle(max_dim: int = SQ8_REGISTRY_DIMS) -> str:
    return f"""
        WITH exploded AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ), lim AS (
            SELECT * FROM exploded WHERE dim < {int(max_dim)}
        ), stats AS (
            SELECT dim, min(x) AS mn, max(x) AS mx FROM lim GROUP BY dim
        ), q AS (
            SELECT l.vec_id, l.dim, l.x, s.mn, s.mx,
                   CASE WHEN s.mx = s.mn THEN 0
                        ELSE CAST(least(255, greatest(0,
                            floor(((l.x - s.mn) * 255.0) / (s.mx - s.mn))))
                            AS BIGINT)
                   END AS code
            FROM lim l JOIN stats s USING (dim)
        )
        SELECT vec_id, CAST(dim AS BIGINT) AS dim, code,
               (floor((abs(x - (mn + (((code + 0.5) * (mx - mn)) / 255.0))))
                   * 1000000 + 0.5) / 1000000) AS abs_err
        FROM q
    """
