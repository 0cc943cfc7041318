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

from responsive_pub_spark.cache import scoped_persist

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


# ---------------------------------------------------------------------------
# top principal component by fixed-point integer power iteration
# ---------------------------------------------------------------------------

#: embedding quantization scale for the PCA Gram products (|e| <= ~1)
PCA_QSCALE = 1024
#: fixed-point scale of the iterated direction vector (L-inf normalized)
PCA_VSCALE = 10_000
#: power-iteration count (fixed + unrolled in the oracle)
PCA_ITERS = 3


def pca_power_top(emb: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """POWER ITERATION toward the top principal direction of the
    (uncentered) embedding Gram matrix X^T X — the whitening/centering
    primitive of an embedding pipeline (dominant-direction removal, ABTT
    "all-but-the-top", PCA-based index rotations), expressed as iterative
    dataflow like :mod:`graph` PageRank.

    The gated contract is the FIXED-ROUND iterate (``iters`` unrolled
    rounds from the all-ones start), exactly like the 3-iteration
    PageRank row — not a converged eigenvector: convergence rate is
    (λ2/λ1)^t, so on a near-isotropic corpus (this fixture's random
    embeddings: λ1/λ2 ≈ 1.02) no small round count converges, while on
    real embedding corpora the dominant direction is pronounced (the ABTT
    observation) and a few rounds suffice; raise ``iters`` as the
    spectrum demands — per-round cost is flat and the plan is O(1) deep.

    Everything is FIXED-POINT INTEGER so the result is bit-identical
    across engines (float matrix products would drift with aggregation
    order): embeddings quantize to q = round(e * QSCALE); one iteration is
        p_i   = (Σ_d q_id * v_d) DIV QSCALE          (per-vector projection)
        w_d   = Σ_i q_id * p_i                       (back-projection)
        v'_d  = w_d * VSCALE DIV max_d |w_d|         (L-inf renormalize)
    Both engines truncate integer division toward zero, so DIV == `//`
    on negatives (verified). Overflow bound: |w| <= rows * QSCALE *
    64 * QSCALE * VSCALE / QSCALE — safe past 1e8 rows per shard at these
    scales; for more, shard the Gram accumulation and merge (documented
    knob, same pattern as collocations_pmi/bm25).

    Plan per iteration: v (dim-sized) broadcasts onto the quantized
    table, ONE keyed shuffle per projection/back-projection pair;
    ``localCheckpoint`` pins the per-round plan to O(1) like PageRank/BPE.
    Output: one row per dimension (d, component_fp)."""
    q = (
        emb.select("vec_id", F.posexplode("embedding").alias("d0", "e"))
        .select(
            "vec_id",
            (F.col("d0") + 1).cast("bigint").alias("d"),
            F.expr(f"CAST(floor(e * {PCA_QSCALE} + 0.5) AS BIGINT)").alias("q"),
        )
    )
    # scoped_persist, reused every iteration (see dedup.minhash_pairs)
    q = scoped_persist(q)
    v = q.select("d").distinct().select(
        "d", F.lit(int(PCA_VSCALE)).cast("bigint").alias("v")
    )
    for _ in range(int(iters)):
        dot = (
            q.join(F.broadcast(v), "d")
            .groupBy("vec_id")
            .agg(F.expr(f"sum(q * v) DIV {PCA_QSCALE}").alias("p"))
        )
        w = (
            q.join(dot, "vec_id")
            .groupBy("d")
            .agg(F.sum(F.col("q") * F.col("p")).alias("w"))
        )
        mx = w.agg(F.greatest(F.max(F.abs(F.col("w"))), F.lit(1)).alias("m"))
        v = (
            w.crossJoin(F.broadcast(mx))
            .select("d", F.expr(f"w * {PCA_VSCALE} DIV m").alias("v"))
            .localCheckpoint()
        )
    return v.select("d", F.col("v").alias("component_fp"))


def pca_power_top_oracle(iters: int = PCA_ITERS) -> str:
    qs, vs = PCA_QSCALE, PCA_VSCALE
    body = [
        f"""
        q AS (
            SELECT vec_id, CAST(d AS BIGINT) AS d,
                   CAST(floor(e * {qs} + 0.5) AS BIGINT) AS q
            FROM (SELECT vec_id, unnest(embedding) AS e,
                         generate_subscripts(embedding, 1) AS d
                  FROM embeddings)
        ),
        v0 AS (SELECT DISTINCT d, CAST({vs} AS BIGINT) AS v FROM q)"""
    ]
    prev = "v0"
    for i in range(int(iters)):
        body.append(
            f"""
        dot{i} AS (
            SELECT q.vec_id, sum(q.q * v.v) // {qs} AS p
            FROM q JOIN {prev} v USING (d) GROUP BY q.vec_id
        ),
        w{i} AS (
            SELECT q.d, sum(q.q * dot{i}.p) AS w
            FROM q JOIN dot{i} USING (vec_id) GROUP BY q.d
        ),
        v{i + 1} AS (
            SELECT d, CAST(w * {vs} //
                   (SELECT greatest(max(abs(w)), 1) FROM w{i}) AS BIGINT) AS v
            FROM w{i}
        )"""
        )
        prev = f"v{i + 1}"
    return (
        "WITH " + ",".join(body)
        + f"\n        SELECT d, CAST(v AS BIGINT) AS component_fp FROM {prev}"
    )
