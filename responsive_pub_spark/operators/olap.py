"""Multi-dimensional OLAP aggregation (CUBE / ROLLUP / GROUPING SETS).

The reporting surface a batch analytics engine owes its users: all
2^d marginal aggregates of a fact table in ONE pass. Spark compiles
``cube()`` to a single Expand + hash-aggregate — each input row is
replicated once per grouping set MAP-SIDE and partially aggregated before
the one shuffle, so the network cost is bounded by the (tiny) number of
output groups, not 2^d scans of the fact table. That plan shape is exactly
what survives 100 TB; the naive alternative (d+1 separate groupBys) scans
the fact table d+1 times.

Determinism: metrics are integer cents (floor(price*100+0.5)) — integer
sums are shuffle-order-independent, so the oracle matches bit-for-bit.
``grouping_id`` distinguishes a subtotal NULL from a data NULL (Spark's
``grouping_id()`` and DuckDB's ``GROUPING()`` use the same MSB-first bit
order over the listed columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: integer-cents expression (engine-portable)
_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


def cube_pricing(orders: DataFrame) -> DataFrame:
    """All marginal pricing aggregates over (priority, status) in one pass:
    the 2x2 grouping-set lattice — detail, by-priority, by-status, grand
    total — each with row count and integer-cent sum/min/max."""
    return (
        orders.withColumn("cents", F.expr(_CENTS))
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "gid", "n",
            "sum_cents", "min_cents", "max_cents",
        )
    )


def cube_pricing_oracle() -> str:
    return f"""
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_CENTS}) AS BIGINT) AS sum_cents,
               CAST(min({_CENTS}) AS BIGINT) AS min_cents,
               CAST(max({_CENTS}) AS BIGINT) AS max_cents
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """
