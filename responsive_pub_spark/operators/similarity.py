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
    dot_sql,
    norm_sql,
    rhp_bucket_sql,
)


def _cos_norms(a: str, b: str, na: str, nb: str):
    """Pair cosine with PRE-COMPUTED per-row norms: ``dot(a,b)/(na*nb)``.

    Bit-identical to ``cosine_sql(a, b)`` — the norm is the same
    ``sqrt(fold)`` expression, merely evaluated once per ROW before the
    join instead of once per PAIR after it, and the division sees the
    same IEEE-754 operands in the same order. On pair-scoring joins
    (corpus x broadcast probes) the fold cosine ran THREE interpreted
    ~dim-step lambda folds per pair; carrying the two norms through the
    join leaves one (the dot) — measured 2.7x on knn_label_purity at
    sf0.1 (guide §1.2 per-task work). The unrolled-dot form was also
    measured and LOSES here: these non-equi broadcast joins fall outside
    whole-stage codegen, where a 64-term expression tree evaluates
    slower than one HOF fold."""
    return pround(F.expr(dot_sql(a, b)) / (F.col(na) * F.col(nb)), 6)

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
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.expr(norm_sql("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.expr(norm_sql("embedding")).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cos_norms("qv", "cv", "qn", "cn"))
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
    withb = emb.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        F.expr(norm_sql("embedding")).alias("nrm"),
    )
    q = withb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "bucket",
        F.col("nrm").alias("qn"),
    )
    c = withb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "bucket",
        F.col("nrm").alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cos_norms("qv", "cv", "qn", "cn"))
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
    # corpus-side norm once per row per pass (not once per (row, centroid)
    # pair); centroid norms ride on the broadcast side — see _cos_norms
    embn = emb.withColumn("en", F.expr(norm_sql("embedding")))
    for _ in range(iters):
        centn = cent.withColumn("cn", F.expr(norm_sql("centv")))
        scored = embn.join(F.broadcast(centn)).withColumn(
            "ccos", _cos_norms("embedding", "centv", "en", "cn")
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
    # per-row norms computed once (corpus row / centroid row), carried
    # through both pair-scoring joins — see _cos_norms
    scored_c = (
        emb.withColumn("en", F.expr(norm_sql("embedding")))
        .join(F.broadcast(cent.withColumn("cn", F.expr(norm_sql("centv")))))
        .withColumn("ccos", _cos_norms("embedding", "centv", "en", "cn"))
    )
    # inverted-list assignment: argmax centroid per vector (ties -> low cid)
    assign = scored_c.groupBy("vec_id", "embedding").agg(
        F.max_by(F.col("cid"), F.struct(F.col("ccos"), -F.col("cid"))).alias("cid"),
        F.max("en").alias("en"),
    )
    # query probe lists: top n_probes centroids per query
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        scored_c.filter(F.col("vec_id") < n_queries)
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= n_probes)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("en").alias("qn"),
            "cid",
        )
    )
    cand = assign.join(F.broadcast(probes), "cid").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.withColumn(
        "cosine", _cos_norms("qv", "embedding", "qn", "en")
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


def ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Inverted-list assignment: (vec_id, embedding, cid, ccos) via ONE
    broadcast-join argmax pass over the corpus — the write path of the
    incremental index (streaming/ann_stream.IvfIncremental). ``ccos`` (the
    pround'd cosine to the winning centroid) rides along so the residual
    (1 - ccos) is available for drift accounting without a re-score.

    Identical expressions to ``ivf_topk``'s inline assignment, so a list
    table built incrementally batch-by-batch equals the batch-built one
    row-for-row (asserted in tests/test_ann_incremental.py)."""
    scored_c = (
        emb.withColumn("en", F.expr(norm_sql("embedding")))
        .join(F.broadcast(cent.withColumn("cn", F.expr(norm_sql("centv")))))
        .withColumn("ccos", _cos_norms("embedding", "centv", "en", "cn"))
    )
    return (
        scored_c.groupBy("vec_id", "embedding")
        .agg(
            F.max_by(
                F.struct("cid", "ccos"), F.struct(F.col("ccos"), -F.col("cid"))
            ).alias("best")
        )
        .select(
            "vec_id",
            "embedding",
            F.col("best.cid").alias("cid"),
            F.col("best.ccos").alias("ccos"),
        )
    )


def ivf_probes(
    assign: DataFrame,
    cent: DataFrame,
    n_queries: int = IVF_QUERY_VECS,
    n_probes: int = IVF_PROBES,
) -> DataFrame:
    """The probe-selection stage of :func:`ivf_query_lists`, exposed so a
    caller can resolve the probed cid set up front (it is control-plane
    sized: <= n_queries * n_probes rows) and turn the candidate scan into
    a static partition filter on a cid-partitioned list table. Output:
    (query_id, qv, cid), deterministic — rounded cosine DESC, cid ASC."""
    queries = assign.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qscored = queries.join(F.broadcast(cent)).withColumn(
        "ccos", pround(F.expr(cosine_sql("qv", "centv")), 6)
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        qscored.withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= n_probes)
        .select("query_id", "qv", "cid")
    )


def ivf_query_lists(
    assign: DataFrame,
    cent: DataFrame,
    k: int = IVF_K,
    n_queries: int = IVF_QUERY_VECS,
    n_probes: int = IVF_PROBES,
    cand_source: "DataFrame | None" = None,
) -> DataFrame:
    """IVF query over a PREBUILT inverted-list table — the read path of the
    incremental index. ``assign`` is (vec_id, embedding, cid, ...) as built
    by :func:`ivf_assign` (possibly accumulated across many streaming
    micro-batches); probes score query vectors against the broadcast
    centroids, candidates come from the probe equi-join on cid. Same
    output contract as ``ivf_topk`` (query_id, neighbor_id, rank, cosine);
    with the same centroids and corpus the two are row-identical.

    ``cand_source``: optional candidate-side frame (default: ``assign``
    itself). The incremental index passes its cid-partition-PRUNED list
    table here (probed cids resolved up front via :func:`ivf_probes`) so
    the candidate scan touches only the probed partitions — queries must
    still derive from the FULL table (a query vector may live in a
    non-probed cell)."""
    probes = ivf_probes(
        assign, cent, n_queries=n_queries, n_probes=n_probes
    ).withColumn("qn", F.expr(norm_sql("qv")))
    src = cand_source if cand_source is not None else assign
    cand = (
        src.withColumn("en", F.expr(norm_sql("embedding")))
        .join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    scored = cand.withColumn(
        "cosine", _cos_norms("qv", "embedding", "qn", "en")
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_drift_report(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    retrain_pm: int = 1200,
) -> DataFrame:
    """Per-centroid assignment-residual drift — the RETRAIN TRIGGER of the
    incremental IVF index. A centroid whose newly-ingested vectors sit
    much farther from it than its early vectors did is covering a shifted
    distribution; when enough centroids drift, re-run train_centroids.

    Portable integer arithmetic end-to-end: residual basis points
    ``1e6 - round(ccos * 1e6)`` (ccos is already pround'd to 6, so this is
    exact), per-centroid mean residuals as floor-divided bigints over the
    base half (vec_id < max/2 — the "built then" cohort) vs the recent
    half, and the drift ratio in per-mille. ``retrain`` fires when the
    recent mean residual exceeds ``retrain_pm``/1000 of the base mean.

    Scale: one broadcast-join assignment pass + one keyed agg on cid +
    a broadcast 1-row split-point scalar — no shuffle beyond the
    centroid-count-sized agg."""
    cent = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centv")
    )
    # ids_source=emb: the split scalar is max(vec_id) DIV 2, which is the
    # same over the raw table as over the assignment (assignment preserves
    # every vec_id) — deriving it from emb spares re-running the whole
    # broadcast-assignment pass under the split's broadcast subquery
    # (exactly the DuckDB oracle's derivation, which reads embeddings).
    return drift_from_assign(
        ivf_assign(emb, cent), retrain_pm=retrain_pm, ids_source=emb
    )


def drift_from_assign(
    assign: DataFrame,
    retrain_pm: int = 1200,
    ids_source: "DataFrame | None" = None,
) -> DataFrame:
    """The drift aggregation over an EXISTING (vec_id, cid, ccos)
    assignment table — shared by the batch report above and the
    incremental index's stored inverted lists (streaming/ann_stream),
    where the assignment was already computed at ingest time.

    ``ids_source``: optional cheaper relation carrying the SAME vec_id
    population as ``assign`` (e.g. the raw embeddings table) for the
    1-row split-point scalar — the batch report passes its input so the
    broadcast subquery scans the parquet instead of re-running the
    assignment join; the streaming lane's stored lists stay the default."""
    a = assign.withColumn(
        "res_bp",
        (
            F.lit(1000000)
            - F.floor(F.col("ccos") * 1000000 + F.lit(0.5)).cast("bigint")
        ),
    )
    # integer DIV end-to-end (r8 ADVICE): counts/sums/means are all
    # non-negative bigints, so DIV == floor-division here and — unlike
    # floor(double / double) — stays exact past 2^53 accumulated residual
    split = (ids_source if ids_source is not None else assign).agg(
        F.expr("max(vec_id) DIV 2").cast("bigint").alias("split_id")
    )
    a = a.join(F.broadcast(split))
    per_cid = a.groupBy("cid").agg(
        F.count(F.when(F.col("vec_id") < F.col("split_id"), 1)).alias("n_base"),
        F.count(F.when(F.col("vec_id") >= F.col("split_id"), 1)).alias("n_recent"),
        F.sum(
            F.when(F.col("vec_id") < F.col("split_id"), F.col("res_bp")).otherwise(0)
        ).alias("sum_base"),
        F.sum(
            F.when(F.col("vec_id") >= F.col("split_id"), F.col("res_bp")).otherwise(0)
        ).alias("sum_recent"),
    )
    mean_base = F.when(
        F.col("n_base") > 0, F.expr("sum_base DIV n_base")
    ).cast("bigint")
    mean_recent = F.when(
        F.col("n_recent") > 0, F.expr("sum_recent DIV n_recent")
    ).cast("bigint")
    out = per_cid.select(
        "cid",
        "n_base",
        "n_recent",
        mean_base.alias("mean_base_bp"),
        mean_recent.alias("mean_recent_bp"),
    ).withColumn(
        "drift_pm",
        F.when(
            (F.col("mean_base_bp") > 0) & F.col("mean_recent_bp").isNotNull(),
            F.expr("(mean_recent_bp * 1000) DIV mean_base_bp").cast("bigint"),
        ),
    )
    return out.withColumn(
        "retrain", F.coalesce(F.col("drift_pm") > retrain_pm, F.lit(False))
    )


def ivf_drift_report_oracle(
    n_centroids: int = IVF_CENTROIDS, retrain_pm: int = 1200
) -> str:
    ccos = dround(cosine_duck("e.embedding", "c.embedding"), 6)
    return f"""
        WITH scored_c AS (
            SELECT e.vec_id, c.vec_id AS cid, {ccos} AS ccos
            FROM embeddings e JOIN embeddings c ON c.vec_id < {n_centroids}
        ), assign AS (
            SELECT vec_id, cid,
                   1000000 - CAST(floor(ccos * 1000000 + 0.5) AS BIGINT) AS res_bp
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM scored_c
            ) WHERE rn = 1
        ), split AS (
            SELECT CAST(max(vec_id) // 2 AS BIGINT) AS split_id
            FROM embeddings
        ), per_cid AS (
            SELECT cid,
                   count(*) FILTER (vec_id < split_id) AS n_base,
                   count(*) FILTER (vec_id >= split_id) AS n_recent,
                   COALESCE(sum(res_bp) FILTER (vec_id < split_id), 0) AS sum_base,
                   COALESCE(sum(res_bp) FILTER (vec_id >= split_id), 0) AS sum_recent
            FROM assign CROSS JOIN split
            GROUP BY cid
        ), stats AS (
            SELECT cid, n_base, n_recent,
                   CASE WHEN n_base > 0
                        THEN CAST(sum_base // n_base AS BIGINT) END AS mean_base_bp,
                   CASE WHEN n_recent > 0
                        THEN CAST(sum_recent // n_recent AS BIGINT) END AS mean_recent_bp
            FROM per_cid
        )
        SELECT cid, n_base, n_recent, mean_base_bp, mean_recent_bp,
               CASE WHEN mean_base_bp > 0 AND mean_recent_bp IS NOT NULL
                    THEN CAST((mean_recent_bp * 1000) // mean_base_bp AS BIGINT)
               END AS drift_pm,
               COALESCE(
                   CASE WHEN mean_base_bp > 0 AND mean_recent_bp IS NOT NULL
                        THEN CAST((mean_recent_bp * 1000) // mean_base_bp AS BIGINT)
                             > {retrain_pm}
                   END, FALSE) AS retrain
        FROM stats
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


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the 100 TB index shape)
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces (PQ_M * PQ_SUBDIM == EMBED_DIM)
PQ_SUBDIM = 8
PQ_K = 16         # codes per subspace codebook
PQ_RERANK = 10    # ADC shortlist size fed to exact re-rank
PQ_TOPK = 3
PQ_QUERY_VECS = 10


def _pq_subs(
    df: DataFrame,
    idc: str,
    vc: str,
    out_id: str,
    out_v: str,
    m_sub: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    extra: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id, [extra...], m, subvector) rows + the full-vector squared
    norm — the shared subspace projection of every PQ stage (codebook,
    encode, query LUT). ``extra`` carries passthrough columns (the
    incremental index threads cid through the encode so codes land
    cid-partitioned without a join back)."""
    from responsive_pub_spark.functions.vectors import dot_sql

    return df.select(
        F.col(idc).alias(out_id),
        F.expr(dot_sql(vc, vc)).alias(f"{out_id}_n2"),
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.expr(
                            f"slice({vc}, {m * subdim + 1}, {subdim})"
                        ).alias(out_v),
                    )
                    for m in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select(
        out_id,
        f"{out_id}_n2",
        *extra,
        F.col("s.m").alias("m"),
        F.col(f"s.{out_v}"),
    )


def pq_codebook(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    n_codes: int = PQ_K,
) -> DataFrame:
    """(j, m, cbv) pinned per-subspace codebooks: the subvectors of the
    vectors with id < ``n_codes`` (the pq_topk convention — swap in
    trained codebooks without changing any downstream plan). The
    incremental index derives these from its FROZEN CENTROIDS, so the
    codebooks retrain exactly when the drift loop retrains and the
    serving {centroids, lists, codes} triple is self-consistent by
    construction."""
    return _pq_subs(
        vecs.filter(F.col(id_col) < n_codes),
        id_col,
        vec_col,
        "j",
        "cbv",
        m_sub,
        subdim,
    ).select("j", "m", "cbv")


def pq_encode(
    vecs: DataFrame,
    cb: DataFrame,
    m_sub: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    extra: "tuple[str, ...]" = (),
) -> DataFrame:
    """Encode (vec_id, embedding[, extra...]) against broadcast
    codebooks: argmin ||sv - cbv||^2 per (vector, subspace), ties to the
    low code — ONE broadcast join over the input, the per-batch cost of
    the incremental index's code maintenance. Output: (vid, vid_n2,
    [extra...], m, code)."""
    from responsive_pub_spark.functions.vectors import dot_unrolled

    corpus = _pq_subs(
        vecs, "vec_id", "embedding", "vid", "sv", m_sub, subdim, extra
    )
    d2 = (
        f"({dot_unrolled('sv', 'sv', subdim, 'spark')}) "
        f"- 2 * ({dot_unrolled('sv', 'cbv', subdim, 'spark')}) "
        f"+ ({dot_unrolled('cbv', 'cbv', subdim, 'spark')})"
    )
    return (
        corpus.join(F.broadcast(cb), "m")
        .withColumn("d2", pround(F.expr(d2), 6))
        .groupBy("vid", "vid_n2", *extra, "m")
        .agg(
            F.min_by(F.col("j"), F.struct(F.col("d2"), F.col("j"))).alias(
                "code"
            )
        )
    )


def pq_topk(
    emb: DataFrame,
    k: int = PQ_TOPK,
    n_queries: int = PQ_QUERY_VECS,
    rerank: int = PQ_RERANK,
    m_sub: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    n_codes: int = PQ_K,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance + exact re-rank.

    The scale story (why PQ is THE 100 TB vector-index shape): the corpus
    is encoded ONCE into per-subspace codes — ``m_sub`` bytes per vector
    instead of ``4 * dim`` (32x smaller here) — so the scan side of every
    query touches only the code table; raw vectors are fetched just for
    the top-``rerank`` shortlist. Scoring is codes JOIN broadcast
    lookup-table (query x code dot products), never a full-vector scan.

    Deterministic/portable math throughout: codebooks are PINNED (the
    subvectors of the first ``n_codes`` corpus vectors — same convention
    as ivf_topk's pinned centroids; swap in trained codebooks without
    changing the plan); encode argmin and ADC sums are pround'd, and the
    over-subspace sum is an m-ordered left fold (array_sort + aggregate),
    never float sum() — the DuckDB twin is bit-identical.

    Stages: codebook (broadcast) -> encode (one corpus scan, argmin L2
    per subspace) -> LUT (query x codebook dots, broadcast) -> ADC score
    (codes x LUT equi-join on (m, code), fold over m) -> shortlist ->
    exact cosine re-rank of the shortlist only.
    """
    from responsive_pub_spark.functions.vectors import dot_unrolled

    cb = pq_codebook(emb, "vec_id", "embedding", m_sub, subdim, n_codes)
    # encode: argmin ||sv - cbv||^2 per (vector, subspace); ties -> low j.
    # L2 via unrolled dots (codegen; fold forms are ~20x slower on joins).
    codes = pq_encode(emb, cb, m_sub, subdim)
    # LUT: query-subvector x codebook dot products (tiny: nq * m * K rows)
    qsub = _pq_subs(
        emb.filter(F.col("vec_id") < n_queries),
        "vec_id", "embedding", "qid", "qsv", m_sub, subdim,
    )
    lut = (
        qsub.join(F.broadcast(cb), "m")
        .withColumn(
            "val", pround(F.expr(dot_unrolled("qsv", "cbv", subdim, "spark")), 6)
        )
        .select(F.col("qid").alias("query_id"), "qid_n2", "m", F.col("j").alias("code"), "val")
    )
    # ADC: approx cosine = (m-ordered sum of LUT vals) / (|q| * |x|).
    # One fixed-width slot per subspace (every (query, vid) group has
    # exactly one LUT row per m), summed in ascending-m order as a plain
    # expression — the same left-associated addition the old
    # collect_list + array_sort + fold produced, but partial-aggregable
    # map-side (max per slot) with no per-group list buffer or sort:
    # r14, interleaved A/B on sim_search_pq.
    slot_sum = F.lit(0.0)
    for _i in range(m_sub):
        slot_sum = slot_sum + F.col(f"_v{_i}")
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", "qid_n2", F.col("vid").alias("neighbor_id"), "vid_n2")
        .agg(
            *[
                F.max(F.when(F.col("m") == _i, F.col("val"))).alias(f"_v{_i}")
                for _i in range(m_sub)
            ]
        )
        .withColumn("adc_dot", slot_sum)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "adc_cos",
            pround(F.col("adc_dot") / F.sqrt(F.col("qid_n2") * F.col("vid_n2")), 6),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("adc_cos"), F.asc("neighbor_id"))
    short = (
        adc.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "neighbor_id", "adc_cos")
    )
    # exact re-rank of the shortlist only (raw vectors touched just here)
    qv = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cosine", pround(F.expr(cosine_sql("qv", "nv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine", "adc_cos")
    )


def pq_topk_oracle(
    k: int = PQ_TOPK,
    n_queries: int = PQ_QUERY_VECS,
    rerank: int = PQ_RERANK,
    m_sub: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    n_codes: int = PQ_K,
) -> str:
    from responsive_pub_spark.functions.vectors import dot_duck, dot_unrolled

    sub = f"list_slice(embedding, m * {subdim} + 1, m * {subdim} + {subdim})"
    d2 = (
        f"({dot_unrolled('c.sv', 'c.sv', subdim, 'duck')}) "
        f"- 2 * ({dot_unrolled('c.sv', 'b.cbv', subdim, 'duck')}) "
        f"+ ({dot_unrolled('b.cbv', 'b.cbv', subdim, 'duck')})"
    )
    lut_dot = dot_unrolled("q.qsv", "b.cbv", subdim, "duck")
    fold = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(val ORDER BY m)), "
        "(acc, v) -> acc + v)"
    )
    cos = cosine_duck("qv.embedding", "nv.embedding")
    return f"""
        WITH ms AS (SELECT unnest(range(0, {m_sub})) AS m),
        cb AS (
            SELECT vec_id AS j, m, {sub} AS cbv
            FROM embeddings, ms WHERE vec_id < {n_codes}
        ),
        corpus AS (
            SELECT vec_id AS vid, {dot_duck('embedding', 'embedding')} AS vid_n2,
                   m, {sub} AS sv
            FROM embeddings, ms
        ),
        enc AS (
            SELECT c.vid, c.vid_n2, c.m, b.j,
                   (floor(({d2}) * 1000000 + 0.5) / 1000000) AS d2
            FROM corpus c JOIN cb b USING (m)
        ),
        codes AS (
            SELECT vid, vid_n2, m, j AS code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vid, m ORDER BY d2 ASC, j ASC) AS rn
                FROM enc
            ) WHERE rn = 1
        ),
        qsub AS (
            SELECT vec_id AS qid, {dot_duck('embedding', 'embedding')} AS qid_n2,
                   m, {sub} AS qsv
            FROM embeddings, ms WHERE vec_id < {n_queries}
        ),
        lut AS (
            SELECT q.qid AS query_id, q.qid_n2, q.m, b.j AS code,
                   (floor(({lut_dot}) * 1000000 + 0.5) / 1000000) AS val
            FROM qsub q JOIN cb b USING (m)
        ),
        adc AS (
            SELECT query_id, qid_n2, vid AS neighbor_id, vid_n2, {fold} AS adc_dot
            FROM codes JOIN lut USING (m, code)
            GROUP BY query_id, qid_n2, vid, vid_n2
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   floor(adc_dot / sqrt(qid_n2 * vid_n2) * 1000000 + 0.5)
                       / 1000000 AS adc_cos
            FROM adc WHERE query_id <> neighbor_id
        ),
        short AS (
            SELECT query_id, neighbor_id, adc_cos FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY adc_cos DESC, neighbor_id ASC) AS arank
                FROM scored
            ) WHERE arank <= {rerank}
        ),
        rer AS (
            SELECT s.query_id, s.neighbor_id, s.adc_cos,
                   (floor(({cos}) * 1000000 + 0.5) / 1000000) AS cosine
            FROM short s
            JOIN embeddings qv ON qv.vec_id = s.query_id
            JOIN embeddings nv ON nv.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, rank, cosine, adc_cos FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
                AS BIGINT) AS rank
            FROM rer
        ) WHERE rank <= {k}
    """


# -- hybrid retrieval: lexical candidates -> vector re-rank -------------------
HYBRID_CANDIDATES = 20
HYBRID_K = 5


def hybrid_rerank(
    docs: "DataFrame | None",
    emb: DataFrame,
    n_queries: "int | None" = None,
    n_cand: int = HYBRID_CANDIDATES,
    k: int = HYBRID_K,
    cands: "DataFrame | None" = None,
) -> DataFrame:
    """Two-stage retrieval — the standard production stack: a cheap
    LEXICAL pass (BM25) nominates ``n_cand`` candidates per query term,
    then a VECTOR pass re-ranks them by embedding cosine. The query
    vector is the rank-1 BM25 doc's embedding (pseudo-relevance
    feedback: the best lexical match anchors the semantic neighborhood),
    so the composition needs no external query embeddings — it runs on
    the corpus's own (documents, embeddings) pair, joined doc_id=vec_id.

    Scale shape: stage 1 is ``textops.bm25_topk``'s plan (corpus explodes
    once; query terms broadcast; WindowGroupLimit top-n_cand); stage 2
    touches ONLY the candidate rows — n_queries * n_cand of them — so the
    embedding table is probed by an equi-join on doc_id and the per-term
    anchor table (n_queries rows) broadcasts; the corpus-sized sides
    never shuffle for the re-rank. A rank-1 doc without an embedding row
    drops its term (inner join — the anchor is undefined).

    Output: (term, rk, doc_id, cosine) — re-ranked candidates 2..n_cand,
    top ``k`` per term by (rounded cosine DESC, doc_id ASC).

    ``cands=`` is the stage-1 INJECTION point (r11 VERDICT task 2): pass
    a precomputed (term, rk, doc_id) candidate frame — e.g.
    ``Bm25Streaming.topk`` served from incrementally-maintained
    statistics — and stage 1's corpus-wide df/dl aggregation is skipped
    entirely; ``docs`` is then unused (may be None). Stage 2 is
    identical either way, so parity with the recompute form follows
    from stage-1 parity."""
    from responsive_pub_spark.operators.textops import BM25_N_QUERIES, bm25_topk

    nq = int(n_queries if n_queries is not None else BM25_N_QUERIES)
    if cands is None:
        cands = bm25_topk(docs, n_queries=nq, top=int(n_cand))
    cands = cands.select("term", "rk", "doc_id")
    # withv feeds the anchor derivation AND the rescoring leg; unpersisted,
    # each consumer re-ran the whole stage-1 BM25 chain (per-branch pruning
    # defeats ReuseExchange — the bm25/rollup lesson). The table is
    # n_queries * n_cand rows — control-plane sized at any corpus scale —
    # so pooling it is free (cache.scoped_persist).
    from responsive_pub_spark.cache import scoped_persist

    withv = scoped_persist(
        cands.join(
            emb.select(
                F.col("vec_id").alias("doc_id"), F.col("embedding").alias("cv")
            ),
            "doc_id",
        )
    )
    anchors = withv.filter(F.col("rk") == 1).select(
        F.col("term").alias("a_term"), F.col("cv").alias("qv")
    )
    rescored = (
        withv.filter(F.col("rk") > 1)
        .join(F.broadcast(anchors), F.col("term") == F.col("a_term"))
        .withColumn("cosine", pround(F.expr(cosine_sql("qv", "cv")), 6))
        .select("term", "doc_id", "cosine")
    )
    w = Window.partitionBy("term").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= int(k))
        .select("term", "rk", "doc_id", "cosine")
    )


def hybrid_rerank_oracle(
    n_queries: "int | None" = None,
    n_cand: int = HYBRID_CANDIDATES,
    k: int = HYBRID_K,
) -> str:
    from responsive_pub_spark.operators.textops import (
        BM25_N_QUERIES,
        bm25_topk_oracle,
    )

    nq = int(n_queries if n_queries is not None else BM25_N_QUERIES)
    cos = dround(cosine_duck("a.qv", "c.cv"), 6)
    return f"""
        WITH cands AS (
            SELECT term, rk, doc_id
            FROM ({bm25_topk_oracle(nq, int(n_cand))})
        ),
        withv AS (
            SELECT c.term, c.rk, c.doc_id, e.embedding AS cv
            FROM cands c JOIN embeddings e ON c.doc_id = e.vec_id
        ),
        anchors AS (
            SELECT term AS a_term, cv AS qv FROM withv WHERE rk = 1
        ),
        rescored AS (
            SELECT c.term, c.doc_id, {cos} AS cosine
            FROM withv c JOIN anchors a ON c.term = a.a_term
            WHERE c.rk > 1
        ),
        ranked AS (
            SELECT term, doc_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY term
                       ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rk
            FROM rescored
        )
        SELECT term, rk, doc_id, cosine FROM ranked WHERE rk <= {int(k)}
    """


# -- kNN label agreement (embedding-quality probe) ----------------------------
PURITY_K = 10       # neighbors scored per probe
PURITY_QMOD = 10    # probe set = vec_id % QMOD == 0 (deterministic sample)


def knn_label_purity(
    emb: DataFrame, k: int = PURITY_K, qmod: int = PURITY_QMOD
) -> DataFrame:
    """kNN LABEL-AGREEMENT report — the standard embedding-quality probe
    of a training pipeline (SemDeDup/DataComp-style audits, kNN-probe
    evals): for a deterministic sample of query vectors, how many of the
    ``k`` exact-cosine nearest neighbors carry the query's own ``label``?
    High agreement = the embedding space clusters the labels; a collapsed
    or shuffled space scores at the label base rate.

    Probe set: ``vec_id % qmod == 0`` — deterministic (retry/replay-safe,
    no RNG) and tunable so the probe side stays broadcast-small at any
    corpus size (at 100 TB pick qmod so corpus/qmod is a few thousand
    probes; the probe set is the BROADCAST side, the corpus is scanned
    ONCE and never shuffled — the brute_force_topk posture). Ranking is
    the family's deterministic (rounded cosine DESC, neighbor id ASC);
    ties and rounding are identical to the DuckDB twin by construction.

    Output: (query_id, label, n_match, purity_bp), purity_bp =
    integer basis points of label-agreeing neighbors among exactly k.
    """
    q = emb.filter(F.col("vec_id") % int(qmod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
        F.expr(norm_sql("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("clabel"),
        F.expr(norm_sql("embedding")).alias("cn"),
    )
    # row norms precomputed (_cos_norms): the fold cosine ran 3 ~dim-step
    # interpreted folds per (probe, corpus) pair — measured 2.7x here
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cos_norms("qv", "cv", "qn", "cn"))
        .select("query_id", "qlabel", "neighbor_id", "clabel", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= int(k)
    )
    return (
        topk.groupBy("query_id", "qlabel")
        .agg(
            F.sum(
                F.when(F.col("clabel") == F.col("qlabel"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_match")
        )
        .select(
            "query_id",
            F.col("qlabel").cast("bigint").alias("label"),
            "n_match",
            F.expr(f"(10000 * n_match) DIV {int(k)}").alias("purity_bp"),
        )
    )


def knn_label_purity_oracle(
    k: int = PURITY_K, qmod: int = PURITY_QMOD
) -> str:
    cos = cosine_duck("q.embedding", "c.embedding")
    return f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, q.label AS qlabel,
                   c.vec_id AS neighbor_id, c.label AS clabel,
                   (floor(({cos}) * 1000000 + 0.5) / 1000000) AS cosine
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id % {int(qmod)} = 0
        ), ranked AS (
            SELECT query_id, qlabel, clabel,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        ), agg AS (
            SELECT query_id, qlabel,
                   CAST(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_match
            FROM ranked WHERE rank <= {int(k)}
            GROUP BY query_id, qlabel
        )
        SELECT query_id, CAST(qlabel AS BIGINT) AS label, n_match,
               (10000 * n_match) // {int(k)} AS purity_bp
        FROM agg
    """


#: IVF probes for the index-backed purity audit — one more than the
#: search default: the audit queries EVERY probe-set vector, so the
#: recall bar (referee >= 0.95) wants the extra cell
PURITY_IVF_PROBES = 3


def knn_label_purity_ivf(
    emb: DataFrame,
    k: int = PURITY_K,
    qmod: int = PURITY_QMOD,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = PURITY_IVF_PROBES,
) -> DataFrame:
    """IVF-probed kNN label-agreement — :func:`knn_label_purity` run on
    the INDEX instead of the corpus (the r11 VERDICT stretch): the audit
    is the highest-query-volume consumer of the embedding table (every
    qmod-th vector is a query), so at 100 TB it must probe inverted
    lists like every other ANN surface, not broadcast-scan the corpus
    per probe. Same index shape as ``ivf_topk``: pinned centroids, one
    broadcast assignment pass over the corpus, probes restricted to
    their ``n_probes`` nearest cells — each probe scores
    ~corpus/n_centroids*n_probes candidates instead of the corpus.

    Approximation contract: neighbors outside the probed cells are
    MISSED; ``purity_bp`` keeps the exact form's denominator ``k``, so a
    probe with fewer than ``k`` recalled neighbors reads as lower
    agreement (never inflated). The referee test
    (tests/test_embedding_recall.py) holds mean top-k recall vs the
    exact audit >= 0.95 on the fixture — the same accuracy-guardrail
    scheme as ``sim_search_ivf``.

    Output: (query_id, label, n_match, purity_bp) — the exact op's
    schema, computed from the probed candidate set."""
    cent = emb.filter(F.col("vec_id") < int(n_centroids)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centv")
    )
    # row norms precomputed for both pair-scoring joins — see _cos_norms
    scored_c = (
        emb.withColumn("en", F.expr(norm_sql("embedding")))
        .join(F.broadcast(cent.withColumn("cn", F.expr(norm_sql("centv")))))
        .withColumn("ccos", _cos_norms("embedding", "centv", "en", "cn"))
    )
    assign = scored_c.groupBy("vec_id", "embedding", "label").agg(
        F.max_by(
            F.col("cid"), F.struct(F.col("ccos"), -F.col("cid"))
        ).alias("cid"),
        F.max("en").alias("en"),
    )
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        scored_c.filter(F.col("vec_id") % int(qmod) == 0)
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= int(n_probes))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("qlabel"),
            F.col("en").alias("qn"),
            "cid",
        )
    )
    cand = assign.join(F.broadcast(probes), "cid").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.withColumn(
        "cosine", _cos_norms("qv", "embedding", "qn", "en")
    ).select(
        "query_id",
        "qlabel",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        "cosine",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= int(k)
    )
    return (
        topk.groupBy("query_id", "qlabel")
        .agg(
            F.sum(
                F.when(F.col("clabel") == F.col("qlabel"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_match")
        )
        .select(
            "query_id",
            F.col("qlabel").cast("bigint").alias("label"),
            "n_match",
            F.expr(f"(10000 * n_match) DIV {int(k)}").alias("purity_bp"),
        )
    )


def knn_label_purity_ivf_oracle(
    k: int = PURITY_K,
    qmod: int = PURITY_QMOD,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = PURITY_IVF_PROBES,
) -> str:
    ccos = cosine_duck("e.embedding", "c.embedding")
    qcos = cosine_duck("p.qv", "a.embedding")
    return f"""
        WITH scored_c AS (
            SELECT e.vec_id, e.embedding, e.label, c.vec_id AS cid,
                   (floor(({ccos}) * 1000000 + 0.5) / 1000000) AS ccos
            FROM embeddings e JOIN embeddings c ON c.vec_id < {int(n_centroids)}
        ), assign AS (
            SELECT vec_id, embedding, label, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM scored_c
            ) WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, embedding AS qv, label AS qlabel, cid
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS prank
                FROM scored_c WHERE vec_id % {int(qmod)} = 0
            ) WHERE prank <= {int(n_probes)}
        ), scored AS (
            SELECT p.query_id, p.qlabel, a.vec_id AS neighbor_id,
                   a.label AS clabel,
                   (floor(({qcos}) * 1000000 + 0.5) / 1000000) AS cosine
            FROM assign a JOIN probes p USING (cid)
            WHERE p.query_id <> a.vec_id
        ), ranked AS (
            SELECT query_id, qlabel, clabel,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        ), agg AS (
            SELECT query_id, qlabel,
                   CAST(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_match
            FROM ranked WHERE rank <= {int(k)}
            GROUP BY query_id, qlabel
        )
        SELECT query_id, CAST(qlabel AS BIGINT) AS label, n_match,
               (10000 * n_match) // {int(k)} AS purity_bp
        FROM agg
    """
