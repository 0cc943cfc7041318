#!/usr/bin/env python
"""Interleaved A/B of several query callables in ONE session.

Usage: python scripts/ab2.py mod:fn1 mod:fn2 ... [--runs N]
Warm-up each, then N interleaved rounds; report per-variant medians.
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            n = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from responsive_pub_spark.session import build_spark

    spark = build_spark(
        app_name="ab2", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    fns = {}
    for t in args:
        mod, fn_name = t.split(":")
        fns[t] = getattr(importlib.import_module(mod), fn_name)

    for t, fn in fns.items():  # warm all (JIT, caches)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    results = {t: [] for t in fns}
    for _ in range(n):
        for t, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[t].append(time.perf_counter() - t0)
    for t, rs in results.items():
        print(
            f"{t}: median {statistics.median(rs):.3f}s  "
            f"min {min(rs):.3f}  runs {[round(x, 3) for x in rs]}"
        )


if __name__ == "__main__":
    main()
