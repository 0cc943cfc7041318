"""Time-series rollup + gap-fill over the events stream.

Time-series is one of the two use cases the reference names for its FACT
store (api/stores/ResponsiveStores.java:79-84 — write-once points, TTL
retention); the query side it leaves to the user. This module supplies the
hypertable-style operator a telemetry pipeline needs:

- fixed-interval downsampling (per-key count/avg/max per bucket) — one hash
  shuffle with map-side partials, exactly the windowed-agg shape;
- dense gap-fill: every bucket between a key's first and last point exists
  in the output, empty buckets flagged with n_events = 0 and NULL stats.

Scale: the rollup is one shuffle on (key, bucket). Gap-fill generates
buckets per KEY via ``sequence()`` + ``explode`` (JVM codegen, no Python),
so the fill cost is O(active span / bucket), independent of raw point
count; the final join is bucket-aligned (same key partitioning reused).
A key idle for years would explode its span — bound it with retention
(TTL) upstream, as the reference's FACT stores do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from responsive_pub_spark.functions.portable import pround

BUCKET_S = 3600


def rollup_gapfill(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = BUCKET_S,
) -> DataFrame:
    """(key, bucket_start, n_events, avg_value, max_value) — dense per key."""
    # floor(), not bigint-cast: cast truncates toward zero, diverging from
    # the oracle's floor-division for pre-1970 (negative-epoch) timestamps
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)).cast("bigint") / bucket_s).cast(
            "bigint"
        )
        * bucket_s
    ).alias("bucket_start")
    rolled = (
        events.select(F.col(key), bucket, F.col(value_col).alias("v"))
        .groupBy(key, "bucket_start")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            pround(F.avg("v"), 6).alias("avg_value"),
            pround(F.max("v"), 6).alias("max_value"),
        )
    )
    spans = rolled.groupBy(key).agg(
        F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1")
    )
    dense = spans.select(
        key,
        F.explode(F.sequence("b0", "b1", F.lit(int(bucket_s)))).alias("bucket_start"),
    )
    return (
        dense.join(rolled, [key, "bucket_start"], "left")
        .select(
            key,
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            "avg_value",
            "max_value",
        )
    )


def rollup_gapfill_oracle(
    key: str = "user_id",
    value_col: str = "value",
    bucket_s: int = BUCKET_S,
) -> str:
    return f"""
        WITH ev AS (
            SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
        ), rolled AS (
            SELECT {key},
                   (CAST(floor(epoch(ts)) AS BIGINT) // {bucket_s}) * {bucket_s} AS bucket_start,
                   CAST(count(*) AS BIGINT) AS n_events,
                   (floor((avg({value_col})) * 1000000 + 0.5) / 1000000) AS avg_value,
                   (floor((max({value_col})) * 1000000 + 0.5) / 1000000) AS max_value
            FROM ev
            GROUP BY 1, 2
        ), spans AS (
            SELECT {key}, min(bucket_start) AS b0, max(bucket_start) AS b1
            FROM rolled GROUP BY 1
        ), dense AS (
            SELECT {key},
                   CAST(unnest(range(b0, b1 + {bucket_s}, {bucket_s})) AS BIGINT)
                       AS bucket_start
            FROM spans
        )
        SELECT d.{key}, d.bucket_start,
               CAST(coalesce(r.n_events, 0) AS BIGINT) AS n_events,
               r.avg_value, r.max_value
        FROM dense d
        LEFT JOIN rolled r USING ({key}, bucket_start)
    """


# ---------------------------------------------------------------------------
# exponentially decayed trending scores
# ---------------------------------------------------------------------------

#: decay half-life in days (weights halve every HALF_LIFE_DAYS of age)
TREND_HALF_LIFE_DAYS = 4
#: fixed-point weight scale: weight(age) = (1 << 20) >> (age // half_life)
TREND_W_SCALE = 1 << 20
#: per-group top-k
TREND_TOP_K = 10


def trending_decay(
    events: DataFrame,
    group_col: str = "event_type",
    item_col: str = "props",
    half_life_days: int = TREND_HALF_LIFE_DAYS,
    top: int = TREND_TOP_K,
) -> DataFrame:
    """Top-k TRENDING items per group under exponential time decay —
    recency-weighted popularity (the feed/leaderboard primitive), with the
    decay computed in ALL-INTEGER arithmetic: day-age buckets shift a
    fixed-point weight right once per half-life, so both engines produce
    the identical score (a float exp(-age/tau) would drift in the last
    ULP and flip top-k boundaries).

    Plan: one (group, item, day) keyed count with map-side partials [the
    only corpus-sized shuffle]; the global anchor day is a 1-row
    broadcast; scoring and the per-group rank<=k (WindowGroupLimit) run
    over the item-cardinality table. step-wise decay note: ages within
    the same half-life window share a weight — the documented
    deterministic contract, not a bug."""
    day = "unix_micros(ts) DIV 86400000000"
    counts = (
        events.select(
            group_col, item_col, F.expr(day).alias("day")
        )
        .groupBy(group_col, item_col, "day")
        .agg(F.count("*").alias("cnt"))
    )
    anchor = counts.agg(F.max("day").alias("anchor_day"))
    hl = int(half_life_days)
    weight = f"shiftright({TREND_W_SCALE}, CAST((anchor_day - day) DIV {hl} AS INT))"
    scored = (
        counts.crossJoin(F.broadcast(anchor))
        .groupBy(group_col, item_col)
        .agg(
            F.sum(F.expr(f"cnt * {weight}")).cast("bigint").alias("score_fp"),
            F.sum("cnt").cast("bigint").alias("total_cnt"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc("score_fp"), F.asc(item_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(top))
        .select(
            group_col,
            F.col("rk").cast("bigint").alias("rk"),
            item_col,
            "score_fp",
            "total_cnt",
        )
    )


def trending_decay_oracle(
    group_col: str = "event_type",
    item_col: str = "props",
    half_life_days: int = TREND_HALF_LIFE_DAYS,
    top: int = TREND_TOP_K,
) -> str:
    hl = int(half_life_days)
    return f"""
        WITH counts AS (
            SELECT {group_col}, {item_col},
                   epoch_us(date_trunc('microseconds', ts)) // 86400000000
                       AS day,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2, 3
        ), anchor AS (SELECT max(day) AS anchor_day FROM counts),
        scored AS (
            SELECT {group_col}, {item_col},
                   CAST(sum(cnt * ({TREND_W_SCALE} >>
                        CAST((anchor_day - day) // {hl} AS INT))) AS BIGINT)
                       AS score_fp,
                   CAST(sum(cnt) AS BIGINT) AS total_cnt
            FROM counts, anchor
            GROUP BY 1, 2
        ), ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY {group_col}
                       ORDER BY score_fp DESC, {item_col} ASC) AS rk
            FROM scored
        )
        SELECT {group_col}, CAST(rk AS BIGINT) AS rk, {item_col},
               score_fp, total_cnt
        FROM ranked WHERE rk <= {int(top)}
    """


# ---------------------------------------------------------------------------
# per-key OLS trend
# ---------------------------------------------------------------------------

#: OLS fixed-point output scale (slope in milli-units/hour * 1e4)
OLS_SCALE = 10_000


def trend_ols(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key ordinary-least-squares trend of ``value`` over time — the
    metric-drift / per-entity-trend primitive (is this user's spend
    rising?).

    Closed-form OLS from four keyed INTEGER sums (n, Sx, Sy, Sxy, Sxx):
    x = whole hours since the key's first event, y = integer milli-units.
    Integer sums are shuffle-order-free, and the slope is ONE integer
    division at the end:

        slope_fp = (n*Sxy - Sx*Sy) * SCALE DIV (n*Sxx - Sx*Sx)

    so both engines agree bit-for-bit. Keys whose events all fall in one
    hour have zero x-variance -> slope NULL.

    Overflow envelope: |n*Sxy*SCALE| must stay < 2^63 — holds to ~10^4
    events/key at hour resolution and milli values (the gate scales);
    beyond that, pre-aggregate y per (key, hour) first (same plan shape,
    one extra keyed agg) — documented knob, not a silent cap.

    Plan: two keyed aggs over the same key partitioning (min-x pass,
    then sums — Catalyst reuses the exchange), output is key-cardinality.
    """
    ev = events.select(
        F.col(key_col).alias("k"),
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("y"),
    )
    base = ev.groupBy("k").agg(F.min("us").alias("us0"))
    sums = (
        ev.join(base, "k")
        .select(
            "k", F.expr("(us - us0) DIV 3600000000").alias("x"), "y"
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
            F.sum(F.expr("x * x")).alias("sxx"),
        )
    )
    den = "(n * sxx - sx * sx)"
    num = "(n * sxy - sx * sy)"
    return sums.select(
        F.col("k").alias(key_col),
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"CASE WHEN {den} = 0 THEN NULL "
               f"ELSE {num} * {OLS_SCALE} DIV {den} END")
        .cast("bigint")
        .alias("slope_fp"),
        F.expr(f"sy * {OLS_SCALE} DIV n").cast("bigint").alias("mean_y_fp"),
    )


def trend_ols_oracle(key_col: str = "user_id") -> str:
    den = "(n * sxx - sx * sx)"
    num = "(n * sxy - sx * sy)"
    return f"""
        WITH ev AS (
            SELECT {key_col} AS k,
                   epoch_us(date_trunc('microseconds', ts)) AS us,
                   CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y
            FROM events
        ), base AS (SELECT k, min(us) AS us0 FROM ev GROUP BY k),
        xy AS (
            SELECT ev.k, (us - us0) // 3600000000 AS x, y
            FROM ev JOIN base USING (k)
        ), sums AS (
            SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM xy GROUP BY k
        )
        SELECT k AS {key_col}, CAST(n AS BIGINT) AS n,
               CAST(CASE WHEN {den} = 0 THEN NULL
                    ELSE {num} * {OLS_SCALE} // {den} END AS BIGINT)
                   AS slope_fp,
               CAST(sy * {OLS_SCALE} // n AS BIGINT) AS mean_y_fp
        FROM sums
    """
