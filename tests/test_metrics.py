"""Observation-based pipeline metrics (plans/metrics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.plans.metrics import observed, stream_progress
from responsive_pub_spark.sources.readers import read_table
from responsive_pub_spark.streaming.runtime import TopologyTestDriver


def test_observed_counts_inside_the_job(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    df, obs = observed(
        li.filter(F.col("l_quantity") > 10),
        records=F.count(F.lit(1)),
        sum_qty=F.sum("l_quantity"),
    )
    n = df.count()  # single action computes data AND metrics
    got = obs.get
    assert got["records"] == n > 0
    assert got["sum_qty"] > 0


def test_observed_defaults_track_stream_time(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").limit(100)
    df, obs = observed(ev)
    df.count()
    assert obs.get["records"] == 100
    assert obs.get["max_event_ts"] is not None


def test_stream_progress_exposes_state_metrics(spark, tmp_path):
    drv = TopologyTestDriver(
        spark,
        "k STRING, ts DOUBLE",
        lambda sdf: sdf.groupBy("k").agg(F.count("*").alias("cnt")),
        str(tmp_path / "drv"),
        output_mode="update",
    )
    drv.pipe([{"k": "a", "ts": 1.0}, {"k": "b", "ts": 2.0}])
    drv.advance()
    # run the same input through a raw query so lastProgress is reachable
    sdf = spark.readStream.schema("k STRING, ts DOUBLE").parquet(drv.input_dir)
    out = sdf.groupBy("k").agg(F.count("*").alias("cnt"))
    q = (
        out.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    groups = stream_progress(q)
    drv.close()
    assert groups["application-metrics"]["batch-id"] is not None
    assert groups["store-metrics"]["state-rows-total"] == 2
