"""Kafka sink contract tests — the wire path exercised end-to-end offline.

Model: the reference's sink is a Kafka topic (STJoinExample.java:94-98).
``sink='files'`` writes the EXACT producer-record rows (key BINARY, value
BINARY, topic, timestamp) to a parquet broker log; these tests assert
typed -> wire -> sink -> re-read -> typed is lossless, that the streaming
path emits per micro-batch with checkpointed exactly-once across restart,
and that the wire schema is precisely what Spark's Kafka connector expects."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from responsive_pub_spark.api import KStream
from responsive_pub_spark.sources import kafka as ksink
from responsive_pub_spark.sources import serde
from responsive_pub_spark.sources.readers import read_table


def test_batch_roundtrip_lossless(spark, sf_dir, tmp_path):
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value", "ts")
    )
    log = str(tmp_path / "topic-log")
    ksink.to_kafka(
        ev, ["event_id"], ["user_id", "value"], "out-topic",
        sink="files", path=log,
    )
    wire = ksink.read_kafka_log(spark, log)
    # exact Kafka connector wire schema
    assert dict(wire.dtypes) == {
        "key": "binary", "value": "binary", "topic": "string",
        "timestamp": "timestamp",
    }
    assert wire.select("topic").distinct().collect()[0][0] == "out-topic"
    typed = serde.from_kafka_records(
        wire, ["event_id"], ["bigint"], "user_id BIGINT, value DOUBLE"
    )
    a = sorted(
        (r.event_id, r.user_id, r.value, r.ts) for r in typed.collect()
    )
    b = sorted(
        (r.event_id, r.user_id, r.value, r.ts) for r in ev.collect()
    )
    assert a == b and len(a) > 0


def test_streaming_sink_commit_aligned_and_restart(spark, tmp_path):
    """foreachBatch producer: records appear per micro-batch; a restart
    from checkpoint does not re-produce already-committed batches (the
    reference's commit-aligned CommitBuffer flush + offset fencing)."""
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def pipe(rows, stamp):
        df = spark.createDataFrame(rows, "k STRING, v BIGINT, ts TIMESTAMP")
        df.coalesce(1).write.mode("append").parquet(src)
        for name in os.listdir(src):
            p = os.path.join(src, name)
            if name.startswith("part-"):
                cur = os.stat(p).st_mtime
                if cur > stamp:
                    os.utime(p, (stamp, stamp))

    def run():
        sdf = (
            spark.readStream.schema("k STRING, v BIGINT, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        s = KStream(sdf, ["k"], "ts")
        s.to_kafka(["v"], "t1", sink="files", path=log, checkpoint=ckpt)

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    pipe([("a", 1, t0), ("b", 2, t0)], 1_000_000_010)
    run()
    first = ksink.read_kafka_log(spark, log).count()
    assert first == 2
    # restart with no new input: nothing re-produced
    run()
    assert ksink.read_kafka_log(spark, log).count() == 2
    # new input after restart: only the delta lands
    pipe([("c", 3, t0)], 1_000_000_020)
    run()
    rows = ksink.read_kafka_log(spark, log)
    assert rows.count() == 3
    typed = serde.from_kafka_records(rows, ["k"], ["string"], "v BIGINT")
    assert sorted((r.k, r.v) for r in typed.collect()) == [
        ("a", 1), ("b", 2), ("c", 3)
    ]


def test_kafka_mode_requires_connector_args(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").limit(1)
    try:
        ksink.to_kafka(ev, ["event_id"], ["value"], "t", sink="kafka")
        assert False, "expected ValueError without bootstrap_servers"
    except ValueError:
        pass


def test_streaming_source_consumes_broker_log_incrementally(spark, sf_dir, tmp_path):
    """Source-side wire contract: read_kafka_log_stream delivers the exact
    Kafka-connector record model as a STREAM — typed -> to_kafka ->
    streaming consumer -> serde -> typed, with each availableNow drain
    seeing only the records produced since the last one (offset-tracking
    analog via the file-source log)."""
    log = str(tmp_path / "topic-log")
    out = str(tmp_path / "consumed")
    ck = str(tmp_path / "ck")

    def produce(lo, hi):
        ev = (
            read_table(spark, sf_dir, "events")
            .filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .select("event_id", "user_id", "value", "ts")
        )
        ksink.to_kafka(
            ev, ["event_id"], ["user_id", "value"], "t-src",
            sink="files", path=log,
        )
        return ev.count()

    def drain():
        src = ksink.read_kafka_log_stream(spark, log)
        typed = serde.from_kafka_records(
            src, ["event_id"], ["bigint"], "user_id BIGINT, value DOUBLE"
        )
        q = (
            typed.writeStream.format("parquet")
            .option("checkpointLocation", ck)
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    n1 = produce(0, 50)
    got1 = drain()
    assert got1.count() == n1
    assert dict(got1.dtypes)["event_id"] == "bigint"
    n2 = produce(50, 100)
    got2 = drain()  # second drain picks up ONLY the newly produced records
    assert got2.count() == n1 + n2
    # typed round trip is lossless against the original batch read
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 100)
        .select("event_id", "user_id", "value")
    )
    a = sorted((r.event_id, r.user_id, r.value) for r in ev.collect())
    b = sorted(
        (r.event_id, r.user_id, r.value)
        for r in got2.select("event_id", "user_id", "value").collect()
    )
    assert a == b
