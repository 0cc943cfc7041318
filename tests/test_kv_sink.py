"""KeyValueTableSink: exactly-once keyed materialization.

Mirrors the reference's commit-aligned flush + offset-fencing semantics
(SURVEY.md §3.2): redelivered write batches must be no-ops, tombstones
delete, compaction preserves both contents and idempotence.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from responsive_pub_spark.streaming.kv_sink import KeyValueTableSink
from responsive_pub_spark.streaming.runtime import TopologyTestDriver

SCHEMA = "k STRING, v BIGINT, ts DOUBLE"


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_upsert_latest_per_key_and_tombstone(spark, tmp_path):
    sink = KeyValueTableSink(str(tmp_path / "t"), ["k"], ["v"], ts_col="ts")
    sink(_mkdf(spark, [("a", 1, 1.0), ("b", 2, 1.0)]), 0)
    sink(_mkdf(spark, [("a", 10, 2.0), ("c", 3, 2.0)]), 1)
    sink(_mkdf(spark, [("b", None, 3.0)]), 2)  # tombstone b
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert got == {"a": 10, "c": 3}


def test_within_batch_order_uses_ts(spark, tmp_path):
    sink = KeyValueTableSink(str(tmp_path / "t"), ["k"], ["v"], ts_col="ts")
    # same batch, later ts wins regardless of row order
    sink(_mkdf(spark, [("a", 5, 9.0), ("a", 4, 1.0)]), 0)
    assert {r.k: r.v for r in sink.read(spark).collect()} == {"a": 5}


def test_redelivery_is_noop(spark, tmp_path):
    sink = KeyValueTableSink(str(tmp_path / "t"), ["k"], ["v"], ts_col="ts")
    sink(_mkdf(spark, [("a", 1, 1.0)]), 0)
    sink(_mkdf(spark, [("a", 2, 2.0)]), 1)
    # redeliver batch 1 with DIFFERENT (corrupt) contents: must not apply
    sink(_mkdf(spark, [("a", 999, 9.0)]), 1)
    assert {r.k: r.v for r in sink.read(spark).collect()} == {"a": 2}


def test_compact_preserves_contents_and_fencing(spark, tmp_path):
    sink = KeyValueTableSink(str(tmp_path / "t"), ["k"], ["v"], ts_col="ts")
    sink(_mkdf(spark, [("a", 1, 1.0), ("b", 2, 1.0)]), 0)
    sink(_mkdf(spark, [("a", 7, 2.0), ("b", None, 2.0)]), 1)
    before = {r.k: r.v for r in sink.read(spark).collect()}
    sink.compact(spark)
    assert len(sink._deltas()) == 1
    assert {r.k: r.v for r in sink.read(spark).collect()} == before == {"a": 7}
    # redelivery of a folded batch id is still fenced out
    sink(_mkdf(spark, [("a", 999, 9.0)]), 1)
    assert {r.k: r.v for r in sink.read(spark).collect()} == {"a": 7}
    # new batches continue to apply
    sink(_mkdf(spark, [("d", 4, 3.0)]), 2)
    assert {r.k: r.v for r in sink.read(spark).collect()} == {"a": 7, "d": 4}


def test_ktable_materialize_streaming_incremental(spark, tmp_path):
    """KTable.materialize over a streaming count changelog: each call is a
    fresh query on the same checkpoint (process restart); the KV table
    reflects exactly the records piped so far."""
    import os as _os

    from responsive_pub_spark.api import KTable

    inp = str(tmp_path / "in")
    _os.makedirs(inp)
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")

    def push(rows):
        spark.createDataFrame(rows, "k STRING, v BIGINT").coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    def materialize():
        sdf = spark.readStream.schema("k STRING, v BIGINT").parquet(inp)
        kt = KTable(sdf.groupBy("k").agg(F.count("*").alias("cnt")), ["k"])
        return kt.materialize(table, checkpoint=ckpt)

    push([("x", 1), ("y", 2)])
    sink = materialize()
    assert {r.k: r.cnt for r in sink.read(spark).collect()} == {"x": 1, "y": 1}
    push([("x", 3), ("z", 4)])
    sink = materialize()  # restart: state + fencing carry over
    assert {r.k: r.cnt for r in sink.read(spark).collect()} == {"x": 2, "y": 1, "z": 1}


def test_ktable_materialize_batch(spark, tmp_path):
    from responsive_pub_spark.api import KTable

    df = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, cnt BIGINT")
    sink = KTable(df, ["k"]).materialize(str(tmp_path / "t"))
    assert {r.k: r.cnt for r in sink.read(spark).collect()} == {"a": 1, "b": 2}
    # re-materializing an updated snapshot upserts under the next batch id
    df2 = spark.createDataFrame([("a", 9)], "k STRING, cnt BIGINT")
    sink = KTable(df2, ["k"]).materialize(str(tmp_path / "t"))
    assert {r.k: r.cnt for r in sink.read(spark).collect()} == {"a": 9, "b": 2}


def test_streaming_counts_materialize_across_restart(spark, tmp_path):
    """KTable materialization end-to-end: update-mode count changelog ->
    KV table; driver advance()s are separate streaming queries against one
    checkpoint, i.e. every advance is a process restart."""
    table = str(tmp_path / "counts")
    sink = KeyValueTableSink(table, ["k"], ["cnt"])

    def build(sdf):
        return sdf.groupBy("k").agg(F.count("*").alias("cnt"))

    drv = TopologyTestDriver(
        spark, "k STRING, ts DOUBLE",
        lambda sdf: build(sdf), str(tmp_path / "drv"), output_mode="update",
    )
    # route each advance's update-mode output through the KV sink
    drv.pipe([{"k": "x", "ts": 1.0}, {"k": "y", "ts": 2.0}])
    rows = drv.advance()
    sink(spark.createDataFrame([(r.k, r.cnt) for r in rows], "k STRING, cnt BIGINT"), 0)
    drv.pipe([{"k": "x", "ts": 3.0}])
    rows = drv.advance()
    sink(spark.createDataFrame([(r.k, r.cnt) for r in rows], "k STRING, cnt BIGINT"), 1)
    got = {r.k: r.cnt for r in sink.read(spark).collect()}
    assert got == {"x": 2, "y": 1}
    drv.close()
    assert os.path.isdir(table)


def test_time_travel_read_as_of_batch(spark, tmp_path):
    """as_of_batch reads the table as committed at batch N (file-level
    delta pruning): upserts after N are invisible, a later tombstone has
    not yet deleted, and as-of points BEFORE compaction's fold are gone
    by documented contract."""
    import pytest as _pytest

    sink = KeyValueTableSink(str(tmp_path / "t"), ["k"], ["v"], ts_col="ts")
    sink(_mkdf(spark, [("a", 1, 1.0), ("b", 2, 1.0)]), 0)
    sink(_mkdf(spark, [("a", 10, 2.0), ("c", 3, 2.0)]), 1)
    sink(_mkdf(spark, [("b", None, 3.0)]), 2)  # tombstone b

    assert {r.k: r.v for r in sink.read(spark, as_of_batch=0).collect()} == {
        "a": 1, "b": 2
    }
    assert {r.k: r.v for r in sink.read(spark, as_of_batch=1).collect()} == {
        "a": 10, "b": 2, "c": 3
    }
    # as-of at/after the tip == current
    assert {r.k: r.v for r in sink.read(spark, as_of_batch=2).collect()} == {
        r.k: r.v for r in sink.read(spark).collect()
    }

    sink.compact(spark)
    # history folded into batch 2: the current read survives, batch-0
    # granularity is gone (changelog truncation trade)
    assert {r.k: r.v for r in sink.read(spark, as_of_batch=2).collect()} == {
        "a": 10, "c": 3
    }
    with _pytest.raises(FileNotFoundError):
        sink.read(spark, as_of_batch=0)
