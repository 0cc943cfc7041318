"""As-of join: enrich each event with the latest prior observation per key.

The reference has no as-of operator (its KS DSL joins are windowed/equi —
SURVEY.md §2.4 flags as-of as "available free in Spark"); it IS the
canonical time-series enrichment (trade->latest-quote), so the engine ships
it as a first-class extension.

Spark-first plan — the union trick, not a range join: tag both streams,
hash-shuffle once on the key, sort within partitions by event time, and a
``last(value, ignorenulls)`` running window carries the most recent right-
side row forward onto every left row. One shuffle + one sort, O(n log n)
per key and no candidate blow-up — a range join would produce
O(left x right) candidate pairs per key before filtering; at 100 TB the
union trick's single ordered pass is the difference between a join that
finishes and one that doesn't. Ties (right row at exactly the left row's
ts) count as "prior", matching DuckDB's ASOF ``>=`` (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_events(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """For every ``left_type`` event: ts + value of the same user's most
    recent ``right_type`` event at-or-before it (NULL if none yet)."""
    tagged = events.filter(
        F.col("event_type").isin(left_type, right_type)
    ).select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("ts_sec"),
        "value",
        (F.col("event_type") == left_type).alias("is_left"),
    )
    # right rows sort BEFORE left rows at equal ts: equal-ts right matches
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", F.col("is_left").cast("int"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct per right row so (asof_ts, asof_value) always come from the
    # SAME right-side row — two independent last(..., ignorenulls) columns
    # would skip a NULL value but not its ts, yielding an inconsistent pair
    carried = tagged.withColumn(
        "asof",
        F.last(
            F.when(~F.col("is_left"), F.struct("ts_sec", "value")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter("is_left").select(
        "event_id",
        "user_id",
        "ts_sec",
        F.col("asof.ts_sec").alias("asof_ts"),
        F.col("asof.value").alias("asof_value"),
    )


def asof_join_events_oracle(
    left_type: str = "purchase", right_type: str = "click"
) -> str:
    # DuckDB has native ASOF JOIN; right-side duplicates at one (user, ts)
    # are collapsed deterministically first (max event_id wins) because the
    # union-trick side carries the LAST right row in (ts, event_id) order.
    return f"""
        WITH ev AS (
            SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
        ), l AS (
            SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
            FROM ev WHERE event_type = '{left_type}'
        ), r AS (
            SELECT user_id, ts_sec, max_by(value, event_id) AS value
            FROM (
                SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                       event_id, value
                FROM ev WHERE event_type = '{right_type}'
            )
            GROUP BY user_id, ts_sec
        )
        SELECT l.event_id, l.user_id, l.ts_sec,
               r.ts_sec AS asof_ts, r.value AS asof_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts_sec >= r.ts_sec
    """


def scd2_history(
    changelog: DataFrame,
    key_cols=("user_id",),
    val_col: str = "value",
    ts_col: str = "ts_sec",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a changelog: each
    update becomes a versioned row with a [valid_from, valid_to) interval
    (NULL valid_to = current). The KTable-with-history surface the KS DSL
    lacks (Flink calls it a temporal table; the reference keeps only
    latest-per-key — bootstrap/ChangelogMigrationTool.java compacts away
    history): with it, `interval_join`/`asof_join` answer "what was the
    value WHEN the event happened" exactly.

    One shuffle (window over key ordered by time); ties at one timestamp
    are totally ordered by the version column so the history is
    deterministic."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col, val_col)
    return (
        changelog.select(*keys, ts_col, val_col)
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn(
            "version", F.row_number().over(w).cast("bigint")
        )
        .select(*keys, "version", val_col, "valid_from", "valid_to")
    )


def scd2_history_events_oracle() -> str:
    """Oracle for scd2_history over the events fixture's purchase stream
    (per-user price history)."""
    return """
        WITH ev AS (
            SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
        ), cl AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                   (floor(value * 100 + 0.5) / 100) AS value
            FROM ev WHERE event_type = 'purchase'
        )
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               value,
               ts_sec AS valid_from,
               lead(ts_sec) OVER w AS valid_to
        FROM cl
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, value)
    """
