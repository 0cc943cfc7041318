"""r15 A/B variants (VERDICT r14 item 3): the exact r13 forms of the two
touched-path bench rows the driver flagged as regressed, plus the current
forms, for interleaved adjudication via scripts/ab2.py.

Usage:
  python scripts/ab2.py scripts.ab_r15_variants:brute_old \
                        scripts.ab_r15_variants:brute_new --runs=7
  python scripts/ab2.py scripts.ab_r15_variants:gapfill_old \
                        scripts.ab_r15_variants:gapfill_new --runs=7
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from responsive_pub_spark.cache import scoped_persist
from responsive_pub_spark.functions.portable import pround
from responsive_pub_spark.functions.vectors import cosine_sql
from responsive_pub_spark.operators import similarity, timeseries
from responsive_pub_spark.sources.readers import read_table


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def _ev(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


# --- sim_search_bruteforce -------------------------------------------------

def brute_old(spark, sf_dir) -> DataFrame:
    """EXACT r13 (dd9f9ec) brute_force_topk: 3-fold cosine per pair."""
    emb = _emb(spark, sf_dir)
    k, n_queries = similarity.DEFAULT_K, similarity.N_QUERY_VECS
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", pround(F.expr(cosine_sql("qv", "cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def brute_new(spark, sf_dir) -> DataFrame:
    """Current form (r14 _cos_norms)."""
    return similarity.brute_force_topk(_emb(spark, sf_dir))


# --- timeseries_rollup_gapfill --------------------------------------------

def gapfill_old(spark, sf_dir) -> DataFrame:
    """EXACT r13 (dd9f9ec) rollup_gapfill: rolled NOT pooled (two
    independent aggregations of the raw events under per-branch pruning)."""
    events = _ev(spark, sf_dir)
    key, ts_col, value_col = "user_id", "ts", "value"
    bucket_s = timeseries.BUCKET_S
    bucket = (
        F.floor(
            F.unix_timestamp(F.col(ts_col)).cast("bigint") / bucket_s
        ).cast("bigint")
        * bucket_s
    ).alias("bucket_start")
    rolled = (
        events.select(F.col(key), bucket, F.col(value_col).alias("v"))
        .groupBy(key, "bucket_start")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            pround(F.avg("v"), 6).alias("avg_value"),
            pround(F.max("v"), 6).alias("max_value"),
        )
    )
    spans = rolled.groupBy(key).agg(
        F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1")
    )
    dense = spans.select(
        key,
        F.explode(
            F.sequence("b0", "b1", F.lit(int(bucket_s)))
        ).alias("bucket_start"),
    )
    return dense.join(rolled, [key, "bucket_start"], "left").select(
        key,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        "avg_value",
        "max_value",
    )


def gapfill_new(spark, sf_dir) -> DataFrame:
    """Current form (r14 pooled rolled)."""
    return timeseries.rollup_gapfill(_ev(spark, sf_dir))


def gapfill_onepass(spark, sf_dir) -> DataFrame:
    """ONE corpus aggregation, no persist, no self-join: each bucket row
    emits itself plus its trailing gap rows (lead() over the bucket
    table + explode). Dense coverage is identical: the first present
    bucket is b0, the last is b1, and every inter-bucket gap is emitted
    exactly once by its predecessor."""
    events = _ev(spark, sf_dir)
    key, ts_col, value_col = "user_id", "ts", "value"
    bucket_s = timeseries.BUCKET_S
    bucket = (
        F.floor(
            F.unix_timestamp(F.col(ts_col)).cast("bigint") / bucket_s
        ).cast("bigint")
        * bucket_s
    ).alias("bucket_start")
    rolled = (
        events.select(F.col(key), bucket, F.col(value_col).alias("v"))
        .groupBy(key, "bucket_start")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            pround(F.avg("v"), 6).alias("avg_value"),
            pround(F.max("v"), 6).alias("max_value"),
        )
    )
    w = Window.partitionBy(key).orderBy("bucket_start")
    ranked = rolled.withColumn("nxt", F.lead("bucket_start").over(w))
    step = int(bucket_s)
    rows = ranked.select(
        F.col(key),
        F.explode(
            F.expr(
                f"concat(array(struct(bucket_start AS bucket_start, "
                f"n_events AS n_events, avg_value AS avg_value, "
                f"max_value AS max_value)), "
                f"IF(nxt IS NOT NULL AND nxt - bucket_start > {step}, "
                f"transform(sequence(bucket_start + {step}, nxt - {step}, "
                f"{step}), b -> struct(b AS bucket_start, "
                f"CAST(0 AS BIGINT) AS n_events, "
                f"CAST(NULL AS DOUBLE) AS avg_value, "
                f"CAST(NULL AS DOUBLE) AS max_value)), "
                f"array()))"
            )
        ).alias("r"),
    )
    return rows.select(
        key,
        F.col("r.bucket_start").alias("bucket_start"),
        F.col("r.n_events").alias("n_events"),
        F.col("r.avg_value").alias("avg_value"),
        F.col("r.max_value").alias("max_value"),
    )


# --- graph_pagerank: fused edges-with-degree variant ----------------------

def pagerank_cur(spark, sf_dir) -> DataFrame:
    from responsive_pub_spark.operators import graph

    return graph.pagerank(read_table(spark, sf_dir, "lineitem"))


def pagerank_fused(spark, sf_dir) -> DataFrame:
    """Per-round contrib computed edge-side off ONE pre-joined
    edges-with-outdeg table (ReuseExchange dedups it across rounds):
    one edge-sized join per round instead of a node-sized join plus an
    edge-sized join. Integer arithmetic -> bit-identical ranks."""
    from responsive_pub_spark.operators.graph import (
        PR_DAMP_PCT,
        PR_ITERS,
        PR_SCALE,
        _bipartite_edges,
    )

    lineitem = read_table(spark, sf_dir, "lineitem")
    edges = _bipartite_edges(lineitem).repartition("src")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_deg = edges.join(deg, "src")
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE).cast("bigint").alias("rank"),
    )
    base = (15 * PR_SCALE) // 100
    for _ in range(int(PR_ITERS)):
        ranks = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(
                (
                    F.lit(base)
                    + F.expr(
                        f"{PR_DAMP_PCT} * sum(rank DIV outdeg) DIV 100"
                    )
                )
                .cast("bigint")
                .alias("rank")
            )
            .select(F.col("node2").alias("node"), "rank")
        )
    return ranks.join(deg, ranks.node == deg.src).select(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("node_key"),
        F.col("rank").alias("rank_fp"),
        F.col("outdeg").cast("bigint").alias("outdeg"),
    )


def pack_ids_preshuffle(spark, sf_dir) -> DataFrame:
    """Isolate the no-thread half of the overlap win: shuffle the WORD
    stream by doc_id BEFORE the vocab broadcast joins (narrower rows
    cross the exchange than the post-explode sub-token stream; the rank
    window then reuses the partitioning). No threads, no extra persist,
    scale-shape neutral."""
    from pyspark.sql import Window

    from responsive_pub_spark.cache import scoped_persist
    from responsive_pub_spark.operators.bpe import (
        BPE_MERGES,
        _apply_merges,
        _spaced,
        word_freqs,
    )
    from responsive_pub_spark.operators.pipeline_ops import (
        PACK_BUDGET_TOKENS,
        bucketed_running_sum,
    )

    docs = read_table(spark, sf_dir, "documents")
    b = int(PACK_BUDGET_TOKENS)
    words = word_freqs(docs).select(
        "word", F.expr(_spaced("word")).alias("s"), "freq"
    )
    seg = _apply_merges(words, BPE_MERGES, carry=("word",)).select(
        "word", F.expr("split(trim(s), ' ')").alias("toks")
    )
    vocab_ids = (
        seg.select(F.explode("toks").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            (F.row_number().over(Window.orderBy("token")) - 1).cast(
                "bigint"
            ),
        )
    )
    corpus = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word_idx", "word"),
    ).repartition("doc_id")
    ids = (
        corpus.join(F.broadcast(seg), "word")
        .select(
            "doc_id",
            "word_idx",
            F.posexplode("toks").alias("sub_idx", "token"),
        )
        .join(F.broadcast(vocab_ids), "token")
        .select(
            "doc_id",
            F.col("word_idx").cast("bigint").alias("word_idx"),
            "sub_idx",
            F.col("token_id"),
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy("word_idx", "sub_idx")
    ranked = scoped_persist(
        ids.select(
            "doc_id",
            "token_id",
            (F.row_number().over(rank_w) - 1).cast("bigint").alias(
                "tok_rank"
            ),
            F.count("*")
            .over(Window.partitionBy("doc_id"))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    per_doc = (
        ranked.select("doc_id", "n_tokens")
        .distinct()
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    packed = bucketed_running_sum(
        per_doc, ["lang"], "doc_id", "n_tokens", "cum_tokens"
    ).select(
        "doc_id",
        "lang",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("doc_start"),
    )
    return ranked.join(packed, "doc_id").select(
        "lang",
        F.expr(f"(doc_start + tok_rank) DIV {b}").alias("seq_id"),
        ((F.col("doc_start") + F.col("tok_rank")) % b)
        .cast("bigint")
        .alias("pos"),
        "token_id",
    )


# --- pack_token_ids: fit/explode overlap (VERDICT r14 item 5) -------------

def pack_ids_cur(spark, sf_dir) -> DataFrame:
    from responsive_pub_spark.operators import bpe

    return bpe.pack_token_ids(read_table(spark, sf_dir, "documents"))


def pack_ids_overlap(spark, sf_dir) -> DataFrame:
    """Overlap the merge-loop fit (driver-round-trip bound, cluster
    mostly idle) with the corpus word explode+pre-shuffle (cluster
    bound, independent of the fit) via two driver threads (guide §2.6).
    The explode is persisted pre-shuffled by doc_id so the rank window
    reuses the partitioning. NOTE the scale trade-off measured in
    OPTIMIZATION_r15.md: this materializes the exploded corpus, which
    the committed single-tokenization form deliberately avoids."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target
    from pyspark.sql import Window

    from responsive_pub_spark.cache import scoped_persist
    from responsive_pub_spark.operators import bpe
    from responsive_pub_spark.operators.bpe import (
        BPE_MERGES,
        _apply_merges,
        _spaced,
        word_freqs,
    )
    from responsive_pub_spark.operators.pipeline_ops import (
        PACK_BUDGET_TOKENS,
        bucketed_running_sum,
    )

    docs = read_table(spark, sf_dir, "documents")
    b = int(PACK_BUDGET_TOKENS)
    corpus_plan = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word_idx", "word"),
    ).repartition("doc_id")

    def fit():
        words = word_freqs(docs).select(
            "word", F.expr(_spaced("word")).alias("s"), "freq"
        )
        seg = _apply_merges(words, BPE_MERGES, carry=("word",)).select(
            "word", F.expr("split(trim(s), ' ')").alias("toks")
        )
        vocab_ids = (
            seg.select(F.explode("toks").alias("token"))
            .distinct()
            .withColumn(
                "token_id",
                (F.row_number().over(Window.orderBy("token")) - 1).cast(
                    "bigint"
                ),
            )
        )
        return seg, vocab_ids

    def explode():
        c = scoped_persist(corpus_plan)
        c.write.format("noop").mode("overwrite").save()
        return c

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_fit = pool.submit(inheritable_thread_target(fit))
        f_exp = pool.submit(inheritable_thread_target(explode))
        seg, vocab_ids = f_fit.result()
        corpus = f_exp.result()

    ids = (
        corpus.join(F.broadcast(seg), "word")
        .select(
            "doc_id",
            "word_idx",
            F.posexplode("toks").alias("sub_idx", "token"),
        )
        .join(F.broadcast(vocab_ids), "token")
        .select(
            "doc_id",
            F.col("word_idx").cast("bigint").alias("word_idx"),
            F.col("sub_idx").cast("bigint").alias("sub_idx"),
            "token",
            "token_id",
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy("word_idx", "sub_idx")
    ranked = scoped_persist(
        ids.select(
            "doc_id",
            "token_id",
            (F.row_number().over(rank_w) - 1).cast("bigint").alias(
                "tok_rank"
            ),
            F.count("*")
            .over(Window.partitionBy("doc_id"))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    per_doc = (
        ranked.select("doc_id", "n_tokens")
        .distinct()
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    packed = bucketed_running_sum(
        per_doc, ["lang"], "doc_id", "n_tokens", "cum_tokens"
    ).select(
        "doc_id",
        "lang",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("doc_start"),
    )
    return ranked.join(packed, "doc_id").select(
        "lang",
        F.expr(f"(doc_start + tok_rank) DIV {b}").alias("seq_id"),
        ((F.col("doc_start") + F.col("tok_rank")) % b)
        .cast("bigint")
        .alias("pos"),
        "token_id",
    )
