"""Bloom-filter semi-join reduction: prune a big fact scan against a
filtered dimension BEFORE the shuffle.

The classic big-join optimization: when a join's right side is selective,
ship a Bloom filter of its keys to the fact side and drop non-matching
rows at the scan — the shuffle then moves only (matches + false
positives) instead of the whole fact table. Spark's AQE injects runtime
bloom filters for some plans (spark.sql.optimizer.runtime.bloomFilter.*);
this operator makes the technique explicit, deterministic, and
engine-portable so its behavior is gate-checkable: K affine hashes over
the portable prime field into an M-bit position set, membership =
ALL K positions present.

Guarantees (and the gate row's hashed contract):
- NO false negatives: every true semi-join row passes the filter.
- Bounded false positives: non-members pass only if all K positions
  collide; the gate row carries (bloom_pass, true_match) per group so the
  FP overhead is visible data, not a hidden constant.

Scale shape: the position set is ~K x |dim| rows (tiny), built with one
keyed distinct and BROADCAST; the fact side never shuffles for the
membership test (explode K probe positions per row -> broadcast join ->
count==K). At 100 TB the win is the pruned shuffle, identical to the
reference runtime's motivation for key-range pruning on restore
(CommitBuffer scans only covering segments).
"""

from __future__ import annotations

from responsive_pub_spark.cache import scoped_persist

from pyspark.sql import DataFrame, functions as F

from responsive_pub_spark.functions.hashing import P

#: filter geometry: K hash functions into M positions. Size M for the dim
#: cardinality you expect — K*n/M is the occupancy and FP ~ occupancy^K
#: (a saturated filter passes everything and prunes nothing).
BLOOM_K = 3
BLOOM_M = 65536
BLOOM_A = [40503 + 101 * k for k in range(BLOOM_K)]
BLOOM_B = [9176 + 53 * k for k in range(BLOOM_K)]


def _positions(key_expr: str, dialect: str) -> str:
    parts = [
        f"((({key_expr} % {P}) * {BLOOM_A[k]} + {BLOOM_B[k]}) % {P}) % {BLOOM_M}"
        for k in range(BLOOM_K)
    ]
    if dialect == "spark":
        return "array(" + ", ".join(parts) + ")"
    return "[" + ", ".join(parts) + "]"


def bloom_build(dim: DataFrame, key_col: str) -> DataFrame:
    """The filter as a DataFrame: distinct occupied positions (<= M rows)."""
    return (
        dim.select(F.explode(F.expr(_positions(key_col, "spark"))).alias("pos"))
        .distinct()
    )


def bloom_prefilter(fact: DataFrame, dim: DataFrame, key_col: str) -> DataFrame:
    """Rows of ``fact`` whose key passes the Bloom filter of ``dim``'s
    keys — a superset of the true semi-join (no false negatives).

    Membership = K chained BROADCAST LEFT-SEMI joins (one per hash
    function) against the occupied-position set: the fact side is never
    shuffled or exploded — each semi join is a map-side hash probe, so
    the prefilter costs one pruned pass over the fact scan. (An
    explode-K-probes + groupBy formulation would shuffle Kx the fact
    table and defeat the operator's entire purpose.)"""
    # scoped_persist: the K broadcast probes reuse the one (tiny)
    # position set (see cache.py)
    positions = scoped_persist(bloom_build(dim, key_col))
    out = fact
    for k in range(BLOOM_K):
        pos_k = (
            f"((({key_col} % {P}) * {BLOOM_A[k]} + {BLOOM_B[k]}) % {P})"
            f" % {BLOOM_M}"
        )
        out = out.join(
            F.broadcast(positions),
            F.expr(pos_k) == positions["pos"],
            "left_semi",
        )
    return out


def bloom_semi_report(
    orders: DataFrame, customer: DataFrame, segment: str = "BUILDING"
) -> DataFrame:
    """Gate query: prune orders against the Bloom filter of one market
    segment's customers; report per order-priority how many rows passed
    the filter vs truly join — the (pass >= match) gap IS the false
    positives, part of the hashed contract."""
    dim = customer.filter(F.col("c_mktsegment") == segment).select(
        F.col("c_custkey").alias("o_custkey")
    )
    passed = bloom_prefilter(
        orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
        dim,
        "o_custkey",
    )
    true_keys = dim.distinct()
    flagged = passed.join(
        F.broadcast(true_keys.withColumn("__true", F.lit(1))), "o_custkey", "left"
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("bloom_pass"),
        F.sum(F.when(F.col("__true").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("true_match"),
    )


def bloom_semi_report_oracle(segment: str = "BUILDING") -> str:
    pos = _positions("o_custkey", "duck")
    dim_pos = _positions("c_custkey", "duck")
    return f"""
        WITH dim AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = '{segment}'
        ), positions AS (
            SELECT DISTINCT unnest({dim_pos}) AS pos FROM dim
        ), probes AS (
            SELECT o_orderkey, o_custkey, o_orderpriority,
                   unnest({pos}) AS p
            FROM orders
        ), passed AS (
            SELECT o_orderkey, o_custkey, o_orderpriority
            FROM probes JOIN positions ON probes.p = positions.pos
            GROUP BY o_orderkey, o_custkey, o_orderpriority
            HAVING count(*) = {BLOOM_K}
        )
        SELECT o_orderpriority,
               count(*) AS bloom_pass,
               CAST(sum(CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS true_match
        FROM passed
        LEFT JOIN (SELECT DISTINCT c_custkey FROM dim) d
          ON passed.o_custkey = d.c_custkey
        GROUP BY o_orderpriority
    """
