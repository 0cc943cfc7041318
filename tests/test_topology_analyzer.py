"""Topology analyzer (StreamsBytecodeAnalyzer analog): surface reports for
batch and streaming topologies, red-flag gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from responsive_pub_spark import registry
from responsive_pub_spark.plans import topology
from responsive_pub_spark.sources.readers import read_table


def test_flagship_surface_report(spark, sf_dir):
    df = registry.REGISTRY["flagship_stjoin_window"].fn(spark, sf_dir)
    rep = topology.analyze(df)
    assert rep["scan_parquet"] >= 1
    assert rep.get("broadcast_join", 0) >= 1  # dim side broadcast
    assert rep.get("hash_aggregate", 0) >= 1
    assert "cartesian" not in rep
    assert rep["streaming"] is False
    # the pretty report names every surface it counted
    text = topology.describe(rep)
    assert "broadcast_join" in text and "streaming: False" in text
    topology.assert_scale_clean(rep)  # no red flags on the flagship


def test_streaming_topology_report(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    sdf = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    rep = topology.analyze(out)
    assert rep["streaming"] is True
    assert rep.get("watermark", 0) >= 1
    assert rep.get("event_time_window", 0) >= 1


def test_red_flag_gate_fires_on_cartesian(spark):
    a = spark.range(3)
    b = spark.range(3)
    rep = topology.analyze(a.crossJoin(b))
    assert rep.get("cartesian", 0) >= 1
    with pytest.raises(AssertionError, match="red-flag"):
        topology.assert_scale_clean(rep)
