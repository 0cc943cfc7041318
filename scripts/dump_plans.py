#!/usr/bin/env python
"""Dump .explain('formatted') for bench queries to
plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt (round dir defaults to r15).

Usage: python scripts/dump_plans.py <tag> [query ...]
(tag is 'before' or 'after'; no queries = all bench queries)
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)

    from responsive_pub_spark.session import build_spark
    from responsive_pub_spark.registry import REGISTRY, bench_queries

    spark = build_spark(app_name="plan-dump", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    qs = bench_queries() if not names else {n: REGISTRY[n].fn for n in names}
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
