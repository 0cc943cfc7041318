"""Replays of the reference's integration-test vectors — inputs and
expected outputs transcribed from
integration/ResponsiveWindowStoreIntegrationTest.java (tumbling :140-167,
hopping :276-307) and ResponsiveSessionStoreIntegrationTest.java
(:113-145) — through OUR engine's PAPI window/session processors in
arrival order. Timestamps are the reference's milliseconds."""

from __future__ import annotations

from responsive_pub_spark.operators.windows_papi import (
    SessionAggregateProcessor,
    WindowAggregateProcessor,
)
from responsive_pub_spark.streaming import state

WIN_SCHEMA = "key STRING, seq BIGINT, window_start DOUBLE, window_end DOUBLE, agg STRING"
SESS_SCHEMA = (
    "key STRING, seq BIGINT, session_start DOUBLE, session_end DOUBLE, agg STRING"
)


def _run(spark, rows, factory, schema):
    df = spark.createDataFrame(
        [(k, v, float(ts), i) for i, (k, v, ts) in enumerate(rows)],
        "k STRING, v STRING, ts DOUBLE, seq LONG",
    )
    return state.process(
        df, ["k"], factory, schema, ts_col="ts", arrival_col="seq"
    ).collect()


def test_tumbling_window_vectors(spark):
    """shouldComputeTumblingWindowAggregate: 5s windows, no grace; the
    record at t=10 arrives after its window expired and is ignored."""
    rows = [
        ("k1", "a", 0), ("k2", "a", 1), ("k1", "b", 2), ("k2", "b", 3),
        ("k1", "c", 10_000), ("k2", "c", 10_001),
        ("k1", "d", 10_002), ("k2", "d", 10_003),
        ("k1", "d", 10),          # expired window -> ignored
        ("STOP", "", 50_000),
    ]
    out = _run(
        spark, rows,
        lambda: WindowAggregateProcessor(size=5_000, grace=0.0),
        WIN_SCHEMA,
    )
    final = {}
    for r in sorted(out, key=lambda r: (r.key, r.seq)):
        final[(r.key, r.window_start)] = r.agg
    assert final == {
        ("k1", 0.0): "ab",
        ("k2", 0.0): "ab",
        ("k1", 10_000.0): "cd",
        ("k2", 10_000.0): "cd",
        ("STOP", 50_000.0): "",
    }


def test_hopping_window_grace_vectors(spark):
    """shouldComputeHoppingWindowAggregate: 10s windows advancing by 5s,
    5s grace. 'e'@8000 lands within grace for [5s,15s] but not [0,10s];
    'f'@0 is beyond grace for every window; 'h'@5000 within grace for
    [5s,15s] only."""
    rows = [
        ("key", "a", 0), ("key", "b", 6_000), ("key", "c", 8_000),
        ("key", "d", 16_000),   # closes [0,10s]
        ("key", "e", 8_000),    # within grace for [5s,15s]
        ("key", "f", 0),        # beyond grace everywhere -> dropped
        ("key", "g", 11_000),
        ("key", "h", 5_000),    # within grace for [5s,15s]
        ("STOP", "", 45_000),
    ]
    out = _run(
        spark, rows,
        lambda: WindowAggregateProcessor(size=10_000, advance=5_000, grace=5_000),
        WIN_SCHEMA,
    )
    final = {}
    for r in sorted(out, key=lambda r: (r.key, r.seq)):
        final[(r.key, r.window_start)] = r.agg
    key_windows = {ws: agg for (k, ws), agg in final.items() if k == "key"}
    assert key_windows == {
        0.0: "abc",          # [0, 10s]
        5_000.0: "bcegh",    # [5s, 15s]
        10_000.0: "dg",      # [10s, 20s]
        15_000.0: "d",       # [15s, 25s]
    }
    assert len(final) == 6  # + STOP's two hopping windows


def test_session_aggregate_vectors(spark):
    """shouldComputeSessionAggregate: 5s gap, 2s grace. Exact emission
    sequence including merge tombstones; 'd'@8000 does NOT merge with
    'f'@12000 (expired by retention when stream time hit 16000); 'h'@1500
    is beyond grace and emits nothing."""
    rows = [
        ("key", "a", 0), ("key", "c", 4_000), ("key", "b", 3_000),
        ("key1", "d", 8_000), ("key1", "e", 16_000), ("key1", "f", 12_000),
        ("key1", "g", 9_500), ("key1", "h", 1_500),
    ]
    out = _run(
        spark, rows,
        lambda: SessionAggregateProcessor(gap=5_000, grace=2_000),
        SESS_SCHEMA,
    )
    seq = [
        (r.key, r.session_start, r.session_end, r.agg)
        for r in sorted(out, key=lambda r: (r.key, r.seq))
    ]
    assert seq == [
        ("key", 0.0, 0.0, "a"),
        ("key", 0.0, 0.0, None),
        ("key", 0.0, 4_000.0, "ac"),
        ("key", 0.0, 4_000.0, None),
        ("key", 0.0, 4_000.0, "acb"),
        ("key1", 8_000.0, 8_000.0, "d"),
        ("key1", 16_000.0, 16_000.0, "e"),
        ("key1", 16_000.0, 16_000.0, None),
        ("key1", 12_000.0, 16_000.0, "ef"),
        ("key1", 12_000.0, 16_000.0, None),
        ("key1", 9_500.0, 16_000.0, "efg"),
    ]


def test_stream_stream_join_vectors(spark):
    """shouldDoStreamStreamJoin (ResponsiveWindowStoreIntegrationTest.java:
    309-362): +/-2.5s join window; duplicate left-side records each join
    (STREAM-store duplicate retention); B joins both right versions. The
    reference asserts its first 5 output records; by the +/-2.5s window
    arithmetic 'no_match'@2000 also pairs with R:a@30 (|2000-30| <= 2500 —
    its readOutput stops at 5 records before reaching that emission)."""
    from responsive_pub_spark.api import KStream
    from responsive_pub_spark.windows import JoinWindows
    from pyspark.sql import functions as F

    left = KStream(
        spark.createDataFrame(
            [
                ("A", "L:a", 0.0), ("A", "L:a2", 0.0), ("A", "L:a3", 0.0),
                ("B", "L:b", 300.0), ("A", "no_match", 2_000.0),
            ],
            "k STRING, v STRING, ts DOUBLE",
        ),
        key=["k"], ts_col="ts",
    )
    right = KStream(
        spark.createDataFrame(
            [("A", "R:a", 30.0), ("B", "R:b", 200.0), ("B", "R:b2", 500.0)],
            "k STRING, v STRING, ts DOUBLE",
        ),
        key=["k"], ts_col="ts",
    )
    out = left.join_windowed(right, JoinWindows(before=2_500))
    pairs = sorted(
        (r["lk"], r["joined"])
        for r in out.select(
            F.col("l.k").alias("lk"),
            F.concat_ws("-", F.col("l.v"), F.col("r.v")).alias("joined"),
        ).collect()
    )
    assert pairs == sorted(
        [
            ("A", "L:a-R:a"), ("A", "L:a2-R:a"), ("A", "L:a3-R:a"),
            ("B", "L:b-R:b"), ("B", "L:b-R:b2"),
            ("A", "no_match-R:a"),  # see docstring
        ]
    )
