#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query is timed end-to-end (plan build + execution) against the noop
sink, so the driver-side collect cost is excluded and the measured number is
the distributed compute path — the number that scales.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from responsive_pub_spark.session import build_spark
    from responsive_pub_spark.registry import bench_queries

    spark = build_spark(
        app_name="responsive-pub-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: "float | str" = float(sf)
    except ValueError:
        sf_val = sf

    timings: dict[str, float] = {}
    for name, fn in bench_queries().items():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm: JIT + file listing
        t0 = time.perf_counter()
        df2 = fn(spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        # drop per-query persisted signature tables between queries
        spark.catalog.clearCache()

    out = {
        "metric": "bench_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
