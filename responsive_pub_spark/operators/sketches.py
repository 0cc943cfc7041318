"""Deterministic streaming sketches: Count-Min frequency estimation and
linear-probabilistic distinct counting.

The reference exposes ``approximateNumEntries`` as its one approximate
surface (KeyValueStore, SURVEY §2.6); real pipelines also want frequency
and cardinality sketches over unbounded keys. These are built as PURE
integer/float arithmetic from the portable hash family
(functions/hashing.py) — no engine-native approx functions (Spark's HLL++
and DuckDB's approx_count_distinct disagree by construction), so every
estimate has an exact DuckDB oracle and a hash-stable gate row.

Scale shape: a sketch IS the aggregation — the corpus collapses to a
fixed-size table (D x W counters / M-bucket bitmap) with map-side partial
aggregation; probes join against the tiny sketch. At 100 TB the sketch
table is KBs regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from responsive_pub_spark.functions.hashing import P, poly_hash_duck, poly_hash_sql
from responsive_pub_spark.functions.portable import pround

#: Count-Min geometry: D independent rows of W counters.
CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_A = [6 * d * d + 5 * d + 131 for d in range(CMS_DEPTH)]
CMS_B = [3 * d * d + 13 * d + 29 for d in range(CMS_DEPTH)]

#: Linear counting bitmap size (distinct estimates good for n << M ln M).
LC_M = 1024
LC_A = 48611
LC_B = 3571


def _cms_buckets(h_expr: str, dialect: str) -> str:
    parts = [
        f"((({h_expr}) * {CMS_A[d]} + {CMS_B[d]}) % {P}) % {CMS_WIDTH}"
        for d in range(CMS_DEPTH)
    ]
    if dialect == "spark":
        return "array(" + ", ".join(parts) + ")"
    return "[" + ", ".join(parts) + "]"


def cms_frequencies(events: DataFrame, item_col: str = "event_type") -> DataFrame:
    """Count-Min estimate vs exact count for every distinct item.

    Build: each record increments one counter per depth row — explode D
    (row, bucket) pairs, keyed count (partials collapse to <= D*W rows per
    partition before the shuffle). Probe: each distinct item reads its D
    counters from the sketch and takes the min. CMS guarantees
    est >= exact (one-sided error); the gate row carries both columns so
    the bound is part of the hashed contract."""
    h = poly_hash_sql(item_col)
    sketch = (
        events.select(
            F.posexplode(F.expr(_cms_buckets(h, "spark"))).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = events.groupBy(item_col).agg(F.count("*").alias("exact_count"))
    probes = exact.select(
        item_col,
        "exact_count",
        F.posexplode(F.expr(_cms_buckets(h, "spark"))).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(item_col, "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            item_col,
            F.col("exact_count").cast("bigint").alias("exact_count"),
            "cms_est",
        )
    )


def cms_frequencies_oracle(item_col: str = "event_type") -> str:
    h = poly_hash_duck(item_col)
    buckets = _cms_buckets(h, "duck")
    return f"""
        WITH sketch AS (
            SELECT d, bucket, count(*) AS cnt FROM (
                SELECT unnest({buckets}) AS bucket,
                       generate_subscripts({buckets}, 1) - 1 AS d
                FROM events
            ) GROUP BY d, bucket
        ), exact AS (
            SELECT {item_col}, count(*) AS exact_count FROM events
            GROUP BY {item_col}
        ), probes AS (
            SELECT {item_col}, exact_count,
                   unnest({buckets}) AS bucket,
                   generate_subscripts({buckets}, 1) - 1 AS d
            FROM exact
        )
        SELECT p.{item_col},
               CAST(p.exact_count AS BIGINT) AS exact_count,
               CAST(min(s.cnt) AS BIGINT) AS cms_est
        FROM probes p JOIN sketch s USING (d, bucket)
        GROUP BY p.{item_col}, p.exact_count
    """


def lc_distinct(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Linear-probabilistic distinct count per group: hash ids into an
    M-bucket bitmap, estimate n = -M ln(1 - b/M) from the b occupied
    buckets. Exact-oracle-able (unlike HLL++), and the real technique for
    moderate cardinalities. The per-group state is <= M buckets regardless
    of input size; the estimate column and the exact distinct count are
    both part of the hashed contract."""
    bucket = f"((({id_col} % {P}) * {LC_A} + {LC_B}) % {P}) % {LC_M}"
    return (
        events.select(group_col, id_col, F.expr(bucket).alias("bucket"))
        .groupBy(group_col)
        .agg(
            F.countDistinct(id_col).cast("bigint").alias("exact_distinct"),
            F.countDistinct("bucket").cast("bigint").alias("buckets_hit"),
        )
        .withColumn(
            "lc_est",
            pround(
                -F.lit(float(LC_M))
                * F.log(
                    F.lit(1.0)
                    - F.col("buckets_hit").cast("double") / F.lit(float(LC_M))
                ),
                4,
            ),
        )
    )


def lc_distinct_oracle(
    group_col: str = "event_type", id_col: str = "user_id"
) -> str:
    bucket = f"((({id_col} % {P}) * {LC_A} + {LC_B}) % {P}) % {LC_M}"
    return f"""
        WITH b AS (
            SELECT {group_col}, {id_col}, {bucket} AS bucket FROM events
        )
        SELECT {group_col},
               CAST(count(DISTINCT {id_col}) AS BIGINT) AS exact_distinct,
               CAST(count(DISTINCT bucket) AS BIGINT) AS buckets_hit,
               (floor((-CAST({LC_M} AS DOUBLE) *
                   ln(1.0 - CAST(count(DISTINCT bucket) AS DOUBLE)
                      / CAST({LC_M} AS DOUBLE))) * 10000 + 0.5) / 10000)
                   AS lc_est
        FROM b GROUP BY {group_col}
    """
