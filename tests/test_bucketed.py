"""Bucketed co-located join: the write-once-shuffle-never table layout.

Asserts the scale-critical plan property directly: joining two tables
bucketed on the join key produces ZERO Exchange nodes — the 100 TB fact
table is never re-shuffled at query time (SubPartitioner analog, see
sources/bucketed.py).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from responsive_pub_spark.plans import audit
from responsive_pub_spark.sources.bucketed import colocated_join, write_bucketed
from responsive_pub_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # at fixture SF everything fits the broadcast threshold, which would
    # sidestep the bucketed SMJ this test exists to prove — pin it off
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(
        read_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8
    )
    # bucket pruning/reuse keys on the column NAME: re-key the fact side to
    # the dim's key name at write time so the join needs no rename
    write_bucketed(
        read_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_zero_exchanges(spark, bucketed_tables):
    joined = colocated_join(spark, "b_lineitem", "b_orders", on="o_orderkey").select(
        "o_orderkey", "l_extendedprice", "o_orderdate"
    )
    assert audit.count_exchanges(joined) == 0, audit.plan_str(joined, "simple")
    assert joined.count() > 0


def test_agg_on_bucket_key_has_zero_exchanges(spark, bucketed_tables):
    # groupBy on the bucket column reuses the bucketing: no shuffle either
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    assert audit.count_exchanges(agg) == 0, audit.plan_str(agg, "simple")
    assert agg.count() > 0


def test_matches_unbucketed_results(spark, sf_dir, bucketed_tables):
    plain = (
        read_table(spark, sf_dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(read_table(spark, sf_dir, "orders"), on="o_orderkey")
        .count()
    )
    assert colocated_join(spark, "b_lineitem", "b_orders", on="o_orderkey").count() == plain
