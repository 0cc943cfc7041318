"""Interval (range) join: match point rows to interval rows they fall in.

The reference's KS DSL has no range join (its joins are equi/windowed —
SURVEY.md §2.4); Spark also lacks a first-class one: ``l.ts BETWEEN r.lo
AND r.hi`` with no equi-key compiles to BroadcastNestedLoopJoin/Cartesian,
which is O(|L|x|R|) and dies at scale. This module ships the two
scale-correct strategies as one operator:

- **keyed** (an equi-key exists, e.g. user_id): plain equi-join on the key
  with the range as a join-side predicate — Catalyst picks broadcast or
  sort-merge via AQE; per-key candidate sets are small, the filter runs
  inside the join. This is the plan you want whenever a key exists.
- **keyless** (no shared key): bucketize time. Intervals explode to the
  fixed-width buckets they cover (``sequence(lo DIV B, hi DIV B)``), points
  map to their single bucket (``ts DIV B``), and the join becomes an
  equi-join on bucket + exact range filter. Each (point, interval) pair
  meets in EXACTLY one bucket — the point's — so no post-join dedup is
  needed. Cost: |R| x (interval_span/B) exploded rows instead of |L| x |R|
  candidate pairs; pick B ~ median interval length. No cartesian anywhere
  (``plans/topology.assert_scale_clean`` gates this in CI).

At 100 TB: both paths are shuffle-on-equi-key joins with map-side pruned
scans; the keyless path's only amplification is the bounded interval/B
explode on the (usually much smaller) interval side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from responsive_pub_spark.functions.portable import pround


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    keys: Sequence[str] = (),
    bucket: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= ts <= hi`` (and equal ``keys``, if given). ``ts/lo/hi`` are
    numeric (epoch seconds); ``bucket`` (keyless path only) is the bucket
    width in the same unit."""
    cond = (F.col(f"p.{ts_col}") >= F.col(f"i.{lo_col}")) & (
        F.col(f"p.{ts_col}") <= F.col(f"i.{hi_col}")
    )
    if keys:
        for k in keys:
            cond = (F.col(f"p.{k}") == F.col(f"i.{k}")) & cond
        return points.alias("p").join(intervals.alias("i"), cond, how)
    if how != "inner":
        raise ValueError("keyless interval_join supports how='inner' only")
    b = int(bucket)
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.expr(
                f"sequence(CAST({lo_col} AS BIGINT) DIV {b},"
                f" CAST({hi_col} AS BIGINT) DIV {b})"
            )
        ),
    )
    bucketed = points.withColumn(
        "__bucket", F.expr(f"CAST({ts_col} AS BIGINT) DIV {b}")
    )
    return (
        bucketed.alias("p")
        .join(exploded.alias("i"), (F.col("p.__bucket") == F.col("i.__bucket")) & cond)
        .drop("__bucket")
    )


# ---------------------------------------------------------------------------
# registry query: error-attribution interval join over the events table
# ---------------------------------------------------------------------------

ATTRIB_WINDOW_S = 3600


def error_attribution(events: DataFrame, window_s: int = ATTRIB_WINDOW_S) -> DataFrame:
    """For every ``error`` event: how many of the same user's ``click``
    events landed in the hour after it, and their summed value — the
    ad-attribution / incident-correlation shape of a keyed interval join.
    LEFT join semantics: errors with zero following clicks still appear
    (n_clicks = 0, click_value NULL)."""
    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("ts_sec"),
        "value",
    )
    errors = base.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_sec").alias("lo"),
        (F.col("ts_sec") + int(window_s)).alias("hi"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        "user_id", "ts_sec", "value"
    )
    joined = interval_join(
        clicks, errors, "ts_sec", "lo", "hi", keys=["user_id"], how="right"
    )
    return joined.groupBy(
        F.col("i.error_id").alias("error_id"),
        F.col("i.user_id").alias("user_id"),
        F.col("i.lo").alias("ts_sec"),
    ).agg(
        F.count(F.col("p.ts_sec")).alias("n_clicks"),
        pround(F.sum(F.col("p.value")), 2).alias("click_value"),
    )


def error_attribution_oracle(window_s: int = ATTRIB_WINDOW_S) -> str:
    return f"""
        WITH ev AS (
            SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
        ), base AS (
            SELECT event_id, user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
            FROM ev
        ), errors AS (
            SELECT event_id AS error_id, user_id, ts_sec AS lo,
                   ts_sec + {int(window_s)} AS hi
            FROM base WHERE event_type = 'error'
        ), clicks AS (
            SELECT user_id, ts_sec, value FROM base WHERE event_type = 'click'
        )
        SELECT e.error_id, e.user_id, e.lo AS ts_sec,
               count(c.ts_sec) AS n_clicks,
               (floor((sum(c.value)) * 100 + 0.5) / 100) AS click_value
        FROM errors e LEFT JOIN clicks c
          ON c.user_id = e.user_id AND c.ts_sec >= e.lo AND c.ts_sec <= e.hi
        GROUP BY e.error_id, e.user_id, e.lo
    """
