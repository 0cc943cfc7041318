#!/usr/bin/env python
"""Per-query empirical breakdown for the bench set (guide §1: measure first).

For each bench query (or the names given on argv):
  - t_build: Python DSL -> analyzed plan (driver-side)
  - t_exec: noop write wall time (median of N)
  - jobs/stages/tasks consumed per run (status tracker deltas)
  - top SQL-node metrics from the UI REST API (where the time actually goes)

Writes one JSON line per query to stdout; human notes to stderr.
This is an ANALYSIS tool, not the bench: numbers here guide optimization,
bench.py stays the contract.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request


def rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("ANALYZE_RUNS", "3"))

    from responsive_pub_spark.session import build_spark
    from responsive_pub_spark.registry import bench_queries

    spark = build_spark(
        app_name="bench-analyze",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    only = set(a for a in sys.argv[1:] if not a.startswith("--"))
    if "--registry" in sys.argv:
        from responsive_pub_spark.registry import REGISTRY

        qs = {k: v.fn for k, v in REGISTRY.items()}
    else:
        qs = bench_queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    st = spark.sparkContext.statusTracker()
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"analyze:{name}")
        # warm-up (file listing, JIT, persists)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        builds, execs = [], []
        jobs0 = len(st.getJobIdsForGroup() or [])
        n_sql_before = len(rest(f"{base}/sql?length=10000"))
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        jobs1 = len(st.getJobIdsForGroup() or [])

        # SQL node metrics for the LAST run's execution
        sqls = rest(f"{base}/sql?length=10000&details=true&planDescription=false")
        last = sqls[-1] if sqls else {}
        nodes = []
        for nd in last.get("nodes", []):
            mt = {m["name"]: m["value"] for m in nd.get("metrics", [])}
            keep = {}
            for k, v in mt.items():
                if any(s in k for s in ("time", "rows", "bytes", "spill", "duration")):
                    keep[k] = v
            if keep:
                nodes.append({"node": nd["nodeName"], "id": nd["nodeId"], "m": keep})
        out = {
            "query": name,
            "t_build_med": round(statistics.median(builds), 3),
            "t_exec_med": round(statistics.median(execs), 3),
            "runs_exec": [round(x, 3) for x in execs],
            "jobs_per_run": (jobs1 - jobs0) / max(n_runs, 1),
            "sql_execs_per_run": (len(sqls) - n_sql_before) / max(n_runs, 1),
            "n_plan_nodes": len(last.get("nodes", [])),
        }
        print(json.dumps(out))
        detail_path = f"/tmp/analyze_{name}.json"
        with open(detail_path, "w") as fh:
            json.dump({"summary": out, "nodes": nodes}, fh, indent=1)
        print(f"#   node detail -> {detail_path}", file=sys.stderr)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
