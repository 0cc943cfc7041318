"""Static topology analyzer — the Spark-first analog of the reference's
StreamsBytecodeAnalyzer (tools/src/main/java/dev/responsive/tools/
StreamsBytecodeAnalyzer.java:33-62, which scans an application JAR and
reports every Kafka Streams API surface it calls).

Here the "bytecode" is the query plan: ``analyze()`` walks a topology's
physical (or, for un-started streaming plans, optimized logical) plan and
reports every ENGINE surface it uses — scans and their pushed filters,
exchanges, join strategies, window/session aggregations, stateful
streaming operators, and Python-lane stages. The use cases match the
reference tool's: auditing what a user topology depends on before
migration, and catching scale anti-patterns (cartesian joins, row-at-a-
time Python, un-pushed filters) in CI before they reach a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: plan-node regexes -> engine surface labels
_SURFACES = {
    "scan_parquet": r"FileScan parquet|BatchScan.*parquet",
    "scan_stream": r"StreamingRelation|MicroBatchScan|StreamingExecutionRelation",
    "exchange_hash": r"Exchange hashpartitioning",
    "exchange_range": r"Exchange rangepartitioning",
    "exchange_single": r"Exchange SinglePartition",
    "broadcast_join": r"BroadcastHashJoin",
    "sortmerge_join": r"SortMergeJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "cartesian": r"CartesianProduct|BroadcastNestedLoopJoin",
    "hash_aggregate": r"HashAggregate",
    "object_hash_aggregate": r"ObjectHashAggregate",
    "sort_aggregate": r"SortAggregate",
    "window_function": r"\bWindow\b|RunningWindowFunction",
    "event_time_window": r"window#|TimeWindow",
    "session_window": r"SessionWindow|session_window",
    "watermark": r"EventTimeWatermark",
    "streaming_agg_state": r"StateStoreSave|StateStoreRestore",
    "streaming_dedup_state": r"StreamingDeduplicate",
    "streaming_join_state": r"StreamingSymmetricHashJoin",
    "papi_state": r"FlatMapGroupsInPandasWithState|TransformWithStateInPySpark",
    "python_grouped": r"FlatMapGroupsInPandas\b",
    "python_map": r"MapInPandas|ArrowEvalPython|BatchEvalPython",
    "generate_explode": r"Generate (posexplode|explode)",
    "window_group_limit": r"WindowGroupLimit",
    "union": r"\bUnion\b",
    "sort": r"\bSort\b",
}


def _plan_text(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    if df.isStreaming:
        # streaming plans refuse optimization/execution before
        # writeStream.start(); the ANALYZED logical plan still names the
        # event-time surfaces (watermarks, windows, stateful ops)
        return qe.analyzed().toString()
    return qe.executedPlan().toString()


def analyze(df: DataFrame) -> dict:
    """Surface-usage report for one topology (batch or un-started
    streaming DataFrame): {surface: occurrence count}, plus pushed filters
    and read schemas for scan-health checks."""
    text = _plan_text(df)
    report = {
        name: len(re.findall(pat, text)) for name, pat in _SURFACES.items()
    }
    report = {k: v for k, v in report.items() if v}
    report["pushed_filters"] = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    report["read_schemas"] = re.findall(r"ReadSchema: (struct<[^>]*>)", text)
    report["streaming"] = df.isStreaming
    return report


#: surfaces that should fail a scale review outright
RED_FLAGS = ("cartesian",)
#: surfaces that deserve a second look at 100 TB
YELLOW_FLAGS = ("python_map", "python_grouped", "exchange_single")


def describe(report: dict) -> str:
    """Human-readable report, the analog of FilterMethodCollector.describe():
    every used surface with its count, flags called out."""
    lines = ["topology surface usage:"]
    for k in sorted(report):
        if k in ("pushed_filters", "read_schemas", "streaming"):
            continue
        flag = ""
        if k in RED_FLAGS:
            flag = "  <-- RED: never ship this"
        elif k in YELLOW_FLAGS:
            flag = "  <-- yellow: Python/single-partition lane"
        lines.append(f"  {k:24s} x{report[k]}{flag}")
    lines.append(f"  streaming: {report.get('streaming')}")
    for pf in report.get("pushed_filters", []):
        lines.append(f"  pushed: [{pf}]")
    for rs in report.get("read_schemas", []):
        lines.append(f"  reads:  {rs}")
    return "\n".join(lines)


def assert_scale_clean(report: dict) -> None:
    """CI gate: raise if the topology uses a red-flag surface."""
    bad = [k for k in RED_FLAGS if report.get(k)]
    if bad:
        raise AssertionError(
            f"topology uses scale red-flag surfaces: {bad} — "
            "rewrite with equi-join blocking or broadcast"
        )
