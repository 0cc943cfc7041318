"""AQE skew-join splitting: the runtime half of the skew story.

operators/skew.py handles skewed AGGREGATIONS declaratively (salting); for
skewed JOINS the engine leans on AQE's skew-join splitting — this test pins
that the plan actually splits a hot key's partition at runtime (the final
adaptive plan marks the join ``skew=true``), so the posture claimed in
PLANS.md ("AQE handles skew") is checked, not assumed.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = [
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    prev = {}
    for k, v in keys:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 200k rows, ~95% on one hot key; right side small but above broadcast(-1)
    left = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), F.col("id").alias("rv")
    )
    joined = left.join(right, "k")
    # execute THIS DataFrame (count() builds a different query execution, so
    # the joined plan would never reach its final adaptive form)
    assert len(joined.collect()) == 200_000
    from responsive_pub_spark.plans.audit import plan_str

    final_plan = plan_str(joined, "simple")
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:2000]
    assert "AQEShuffleRead coalesced and skewed" in final_plan
