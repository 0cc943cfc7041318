"""Null-semantics edge vectors from the round-1 advisor: branch() must
place every record in exactly one branch even when predicates evaluate to
NULL (KS split() contract), and the as-of join must keep (asof_ts,
asof_value) consistent when a right-side value is NULL."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.api import KStream
from responsive_pub_spark.operators.asof import asof_join_events


def test_branch_null_predicate_goes_to_default(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 10)], "k STRING, v INT"
    )
    s = KStream(df, ["k"], "v")
    b1, b2, default = s.branch(F.col("v") < 5, F.col("v") >= 5)
    assert [r.k for r in b1.df.collect()] == ["a"]
    assert [r.k for r in b2.df.collect()] == ["c"]
    # NULL predicate row lands in the default branch, not nowhere
    assert [r.k for r in default.df.collect()] == ["b"]
    # total partition: every row in exactly one branch
    total = b1.df.count() + b2.df.count() + default.df.count()
    assert total == df.count()


def test_branch_no_predicates_returns_self(spark):
    df = spark.createDataFrame([("a", 1)], "k STRING, v INT")
    s = KStream(df, ["k"], "v")
    out = s.branch()
    assert len(out) == 1 and out[0].df.count() == 1


def test_timestamp_typed_ts_col_through_api(spark, sf_dir):
    """A user handing the API raw TIMESTAMP/TIMESTAMP_NTZ event time (what
    parquet TIMESTAMP(NANOS) scans surface on Spark 4.1+) must not crash
    on the internal double casts — grace filtering, windowed join, and
    TTL all route through portable.ts_to_double."""
    from responsive_pub_spark.operators.ttl import ttl_filter
    from responsive_pub_spark.sources.readers import read_table
    from responsive_pub_spark.windows import JoinWindows, TimeWindows

    ev = read_table(spark, sf_dir, "events").limit(200)
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    s = KStream(ev, ["user_id"], "ts")

    # grace filter (batch watermark analog) over raw timestamps
    wagg = (
        s.group_by_key()
        .windowed_by(TimeWindows(3600, grace=86400))
        .agg(F.count("*").alias("n"))
    )
    assert wagg.count() > 0

    # stream-stream windowed join over raw timestamps on both sides
    joined = s.join_windowed(
        KStream(ev.limit(50), ["user_id"], "ts"), JoinWindows(60.0, 60.0)
    )
    assert joined.count() >= 50  # every row self-matches within the band

    # ttl filter over raw timestamps
    kept = ttl_filter(ev, ttl_seconds=86400.0 * 10000, ts_col="ts")
    assert kept.count() == ev.count()


def test_asof_null_right_value_pair_consistent(spark):
    """A right event with NULL value is still the as-of match: asof_ts must
    come from that row and asof_value must be its NULL — not a (newer ts,
    older value) mixture."""
    rows = [
        ("e1", "u1", "2024-01-01 00:00:00", 1.0, "click"),
        ("e2", "u1", "2024-01-01 00:10:00", None, "click"),  # NULL value
        ("e3", "u1", "2024-01-01 00:20:00", 9.0, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id STRING, user_id STRING, ts STRING, value DOUBLE, event_type STRING"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join_events(events).collect()
    assert len(out) == 1
    r = out[0]
    # the NULL-valued e2 is the latest prior right row: both fields from it
    import datetime

    e2_ts = int(
        datetime.datetime(2024, 1, 1, 0, 10, tzinfo=datetime.timezone.utc).timestamp()
    )
    assert r.asof_ts == e2_ts
    assert r.asof_value is None


def test_select_key_rekeys_next_aggregation(spark):
    """selectKey marks the stream for repartitioning: the NEXT keyed op
    groups by the new key (STJoinExample.java:94 re-keys before join)."""
    from responsive_pub_spark.api import KStream

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("b", "x", 2.0), ("c", "y", 3.0)],
        "k STRING, cat STRING, ts DOUBLE",
    )
    s = KStream(df, ["k"], "ts").select_key("cat")
    assert s.key == ["cat"]
    counts = {
        r.cat: r.n
        for r in s.df.groupBy(*s.key).agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"x": 2, "y": 1}


def test_peek_observes_without_mutating(spark):
    from responsive_pub_spark.api import KStream

    df = spark.createDataFrame([("a", 1.0)], "k STRING, ts DOUBLE")
    seen = []
    s = KStream(df, ["k"], "ts")
    out = s.peek(lambda d: seen.append(d.count()))
    assert seen == [1]
    assert out is s  # pass-through, stream unchanged


def test_repartition_inserts_single_key_exchange(spark):
    """.repartition(Repartitioned) analog: the plan carries exactly one
    explicit hash exchange on the key, and a following groupBy reuses that
    partitioning instead of adding a second exchange."""
    from responsive_pub_spark.api import KStream

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0)], "k STRING, ts DOUBLE"
    )
    s = KStream(df, ["k"], "ts").repartition(8)
    agg = s.df.groupBy("k").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert {(r.k, r.n) for r in agg.collect()} == {("a", 2), ("b", 1)}


def test_repetition_stats_total_over_degenerate_docs(spark):
    """Docs with empty text or a single token must appear in the output
    with zeroed metrics (not silently vanish through inner joins), and the
    Spark path must still hash-match the DuckDB oracle on such inputs."""
    import duckdb
    import pandas as pd

    from responsive_pub_spark.operators import pipeline_ops
    from oracle_util import compare

    rows = [
        (1, "", "en", "s", 0),                     # empty text
        (2, "word", "en", "s", 4),                 # single token: no bigrams
        (3, "a a a b", "en", "s", 7),              # runs + dups
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    out = {r.doc_id: r for r in pipeline_ops.repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 3}  # total: nobody dropped
    assert out[1].n_tokens == 0 and out[1].max_run == 0
    assert out[2].top_bigram_frac == 0.0
    assert out[3].max_run == 3  # "a a a"

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ),
    )
    ok, msg = compare(
        pipeline_ops.repetition_stats(docs),
        con,
        pipeline_ops.repetition_stats_oracle(),
    )
    assert ok, msg
