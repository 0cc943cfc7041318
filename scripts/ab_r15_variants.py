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
