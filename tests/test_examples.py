"""Example topologies run end-to-end on the fixtures."""

from __future__ import annotations

from responsive_pub_spark.examples import key_batch, stjoin
from responsive_pub_spark.sources.readers import read_table


def test_key_batch_example_partitions_stream(spark, sf_dir):
    """Batches must partition each key's event stream: every event in
    exactly one batch, batches ordered, no batch empty (KeyBatchExample's
    contract: flush all buffered events per punctuation)."""
    ev = read_table(spark, sf_dir, "events")
    out = key_batch.build(ev, flush_interval_s=7 * 86400.0).collect()
    assert out, "no batches emitted"
    per_user_events = {
        r["user_id"]: r["cnt"]
        for r in ev.groupBy("user_id").count().withColumnRenamed("count", "cnt").collect()
    }
    seen: dict[int, list[int]] = {}
    for r in out:
        assert r.n > 0
        ids = [int(x) for x in r.event_ids.split(",")]
        assert len(ids) == r.n
        seen.setdefault(r.user_id, []).extend(ids)
    for uid, ids in seen.items():
        # completeness: every event flushed exactly once
        assert len(ids) == len(set(ids)) == per_user_events[uid], uid
    # multiple flushes happened (punctuator actually fired mid-stream,
    # not just the end-of-stream flush)
    assert any(len([r for r in out if r.user_id == u]) > 1 for u in seen)


def test_stjoin_example_runs(spark, sf_dir):
    out = stjoin.build(
        spark,
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
    )
    rows = out.collect()
    assert rows and {"c_mktsegment", "window_start", "window_end", "cnt", "revenue"} <= set(
        out.columns
    )
