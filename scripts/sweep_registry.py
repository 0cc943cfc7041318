#!/usr/bin/env python
"""Time EVERY registry query once (warm + 1 timed noop run) at
$SPARK_GRAFT_SF_DIR. Output: one line per query `name<TAB>warm<TAB>timed`
sorted by declaration order; slow entries are optimization candidates.

Analysis tool (guide §1) — bench.py remains the contract.
"""

from __future__ import annotations

import os
import sys
import time
import traceback


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    only = set(sys.argv[1:])

    from responsive_pub_spark.session import build_spark
    from responsive_pub_spark.registry import REGISTRY

    spark = build_spark(
        app_name="sweep", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timed = time.perf_counter() - t0
            print(f"{name}\t{warm:.3f}\t{timed:.3f}", flush=True)
        except Exception as e:
            print(f"{name}\tERR\t{type(e).__name__}: {e}", flush=True)
            traceback.print_exc(file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
