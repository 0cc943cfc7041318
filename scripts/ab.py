#!/usr/bin/env python
"""A/B one query function: N timed noop runs after a warm-up, one session.

Usage: python scripts/ab.py <module:callable> [runs]
The callable gets (spark, sf_dir) and returns a DataFrame.
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time


def main() -> None:
    target = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from responsive_pub_spark.session import build_spark

    spark = build_spark(
        app_name="ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    mod, fn_name = target.split(":")
    fn = getattr(importlib.import_module(mod), fn_name)

    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        runs.append((round(t1 - t0, 3), round(t2 - t1, 3), round(t2 - t0, 3)))
    med = statistics.median(r[2] for r in runs)
    print(f"{target}: median {med:.3f}s  (build, exec, total) per run: {runs}")


if __name__ == "__main__":
    main()
