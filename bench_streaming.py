#!/usr/bin/env python
"""Streaming-lane throughput: records/s through Structured Streaming with a
real checkpoint, availableNow over the sf0.1 events fixture.

Three topologies, one per engine lane:
- jvm_window:   watermark + tumbling count (pure JVM stateful streaming —
                the engine's fast lane; the flagship STJoin shape minus the
                broadcast join, which adds no per-record state cost)
- jvm_stjoin:   stream-table join against the broadcast dim + windowed agg
                (the full flagship topology, streaming)
- papi_python:  running count through the applyInPandasWithState PAPI lane
                (the deliberate Python lane, for an honest ceiling number)

Each run is a cold start (fresh checkpoint), one availableNow drain of the
whole fixture; throughput = rows_in / wall_seconds. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from responsive_pub_spark.session import build_spark
    from responsive_pub_spark.sources.readers import read_table
    from responsive_pub_spark.streaming import state

    spark = build_spark(
        app_name="responsive-pub-spark-bench-streaming",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # stage the fixture as a file stream source (the topic analog) with a
    # typed schema; events ts arrives as TIMESTAMP after read_table's
    # nanos handling, so round-trip it through parquet once
    work = tempfile.mkdtemp(prefix="bench-streaming-")
    src = os.path.join(work, "events")
    ev = read_table(spark, SF_DIR, "events")
    ev.write.mode("overwrite").parquet(src)
    n_rows = spark.read.parquet(src).count()
    schema = spark.read.parquet(src).schema

    dim = (
        ev.groupBy("event_type").agg(F.count("*").alias("type_n"))
    ).cache()
    dim.count()

    def run(name, build, output_mode="append"):
        ck = os.path.join(work, f"ck-{name}")
        out = os.path.join(work, f"out-{name}")
        sdf = spark.readStream.schema(schema).parquet(src)
        t0 = time.perf_counter()
        q = (
            build(sdf)
            .writeStream.format("parquet")
            .outputMode(output_mode)
            .option("checkpointLocation", ck)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        return {
            "wall_sec": round(wall, 3),
            "rows_in": n_rows,
            "rec_per_sec": int(n_rows / wall),
        }

    def jvm_window(sdf):
        return (
            sdf.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "user_id")
            .agg(F.count("*").alias("cnt"))
            .select("user_id", F.unix_timestamp("window.start").alias("ws"), "cnt")
        )

    def jvm_stjoin(sdf):
        joined = sdf.join(F.broadcast(dim), "event_type")
        return (
            joined.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("cnt"), F.max("type_n").alias("type_n"))
            .select("event_type", F.unix_timestamp("window.start").alias("ws"), "cnt", "type_n")
        )

    class RunningCount(state.Processor):
        def process(self, ctx, rec):
            n = (ctx.store.get("n") or 0) + 1
            ctx.store.put("n", n)
            ctx.forward(user_id=rec["user_id"], n=n)

    def papi(sdf):
        return state.process_streaming(
            sdf.select("user_id", F.col("ts").cast("double").alias("ts"), "event_id"),
            key=["user_id"],
            processor_factory=RunningCount,
            output_schema="user_id LONG, n LONG",
            ts_col="ts",
            order_by=("event_id",),
        )

    results = {
        "jvm_window": run("jvm_window", jvm_window),
        "jvm_stjoin": run("jvm_stjoin", jvm_stjoin),
        "papi_python": run("papi_python", papi),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming_throughput",
                "unit": "records_per_sec",
                "rows_in": n_rows,
                "lanes": results,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
