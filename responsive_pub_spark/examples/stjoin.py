"""STJoinExample analog (kafka-client-examples/e2e-test/.../regression/
STJoinExample.java:58-98): orders stream joined to the customers table,
then a grace-period tumbling window reduce — the reference's A/B
regression flagship topology, here on the fluent API. The registry's
``flagship_stjoin_window`` query is this topology; this module is the
readable standalone form."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.api import Pipeline
from responsive_pub_spark.functions.portable import pround
from responsive_pub_spark.windows import TimeWindows

DAY = 86400


def build(spark: SparkSession, orders: DataFrame, customers: DataFrame) -> DataFrame:
    p = Pipeline(spark)
    orders_s = p.stream(orders, key="o_custkey", ts_col="o_orderdate")
    customers_t = p.table(customers, key="c_custkey")
    return (
        orders_s.join(customers_t)
        .group_by("c_mktsegment")
        .windowed_by(TimeWindows.of_size_with_no_grace(30 * DAY))
        .agg(
            F.count("*").alias("cnt"),
            pround(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
