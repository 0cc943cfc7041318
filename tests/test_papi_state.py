"""Unit tests for the PAPI store surface (SURVEY.md §2.6) — the analog of
the reference's store tests (CommitBufferTest / store integration tests:
put/get/delete/range/prefix/approximateNumEntries + TTL reads)."""

from __future__ import annotations

from responsive_pub_spark.streaming.state import (
    KeyValueStore,
    Processor,
    ProcessorContext,
    STREAM_TIME,
)


def test_put_get_delete_returns_old():
    st = KeyValueStore()
    assert st.get("a") is None
    st.put("a", 1)
    st.put("b", 2)
    assert st.get("a") == 1
    # delete returns the old value (PartitionedOperations.delete:341)
    assert st.delete("a") == 1
    assert st.get("a") is None
    assert st.delete("missing") is None
    assert st.approximate_num_entries() == 1


def test_put_if_absent_fact_semantics():
    st = KeyValueStore()
    assert st.put_if_absent("k", "first") is None
    assert st.put_if_absent("k", "second") == "first"
    assert st.get("k") == "first"  # write-once FACT row


def test_range_prefix_and_reverse_scans():
    st = KeyValueStore()
    for k in ["apple", "apricot", "banana", "cherry", "app"]:
        st.put(k, k.upper())
    assert [k for k, _ in st.range("app", "banana")] == [
        "app", "apple", "apricot", "banana",
    ]
    assert [k for k, _ in st.reverse_range("app", "banana")] == [
        "banana", "apricot", "apple", "app",
    ]
    assert [k for k, _ in st.prefix("ap")] == ["app", "apple", "apricot"]
    assert [k for k, _ in st.all()] == ["app", "apple", "apricot", "banana", "cherry"]
    assert [k for k, _ in st.reverse_all()][0] == "cherry"


def test_ttl_reads_filter_by_stream_time():
    # reads filter timestamp >= streamTime - ttl (MongoKVTable.java:164)
    st = KeyValueStore(ttl_seconds=60)
    st.stream_time = 1000.0
    st.put("old", 1, ts=900.0)
    st.put("fresh", 2, ts=990.0)
    assert st.get("old") is None  # expired: 900 < 1000 - 60
    assert st.get("fresh") == 2
    assert dict(st.all()) == {"fresh": 2}
    # stream time advancing expires more rows — no explicit deletes needed
    st.stream_time = 1100.0
    assert st.get("fresh") is None


def test_store_dump_load_roundtrip():
    st = KeyValueStore(ttl_seconds=5)
    st.stream_time = 42.0
    st.put((1, "a"), {"x": 1}, ts=41.0)
    st2 = KeyValueStore.load(st.dump())
    assert st2.get((1, "a")) == {"x": 1}
    assert st2.stream_time == 42.0
    assert st2.ttl_seconds == 5


class _Punct(Processor):
    def init(self, ctx):
        ctx.schedule(10.0, self._fire, STREAM_TIME, aligned=True)

    def _fire(self, ctx, fire_ts):
        ctx.forward(kind="punct", at=fire_ts, n=ctx.store.get("n") or 0)

    def process(self, ctx, rec):
        ctx.store.put("n", (ctx.store.get("n") or 0) + 1)
        ctx.forward(kind="rec", at=ctx.timestamp, n=ctx.store.get("n"))


def test_punctuator_fires_before_advancing_record():
    """KS punctuation order: timers due at T fire before the record whose
    timestamp advances stream-time past T (KeyBatchExample semantics)."""
    ctx = ProcessorContext(("k",), KeyValueStore())
    p = _Punct()
    p.init(ctx)
    for ts in [1.0, 9.0, 12.0, 35.0]:
        ctx._advance(ts)
        p.process(ctx, {"ts": ts})
    kinds = [(r["kind"], r["at"], r["n"]) for r in ctx.emitted()]
    assert kinds == [
        ("rec", 1.0, 1),
        ("rec", 9.0, 2),
        ("punct", 10.0, 2),  # fired before the 12.0 record
        ("rec", 12.0, 3),
        ("punct", 20.0, 3),  # catch-up: every crossed boundary fires
        ("punct", 30.0, 3),
        ("rec", 35.0, 4),
    ]


def test_forward_bulk_validates_shape():
    """ADVICE r2: ragged column lists row-shift the output silently; a
    key-set mismatch with a prior forward() raised a bare KeyError."""
    import pytest

    from responsive_pub_spark.streaming.state import KeyValueStore, ProcessorContext

    ctx = ProcessorContext(("k",), KeyValueStore())
    with pytest.raises(ValueError, match="ragged"):
        ctx.forward_bulk(a=[1, 2], b=[1])
    ctx2 = ProcessorContext(("k",), KeyValueStore())
    ctx2.forward(a=1, b=2)
    with pytest.raises(ValueError, match="schema"):
        ctx2.forward_bulk(a=[1], c=[2])
    ctx2.forward_bulk(b=[3], a=[4])  # order-insensitive, same key set
    assert ctx2.emitted() == [{"a": 1, "b": 2}, {"a": 4, "b": 3}]


def test_process_partitioned_task_model(spark):
    """KS task model (r4): one processor per partition — the store is
    shared across keys (cross-key reads see other keys' writes) and the
    punctuator clock is per PARTITION, firing even for boundaries no
    single key's record span would cross."""
    from pyspark.sql import functions as F

    from responsive_pub_spark.streaming import state

    class SeenBefore(state.Processor):
        # emits how many OTHER distinct keys this partition had already
        # registered when the record arrived — per-key state would always
        # see 0 others
        def process(self, ctx, rec):
            others = sum(
                1
                for (tag, uid), _v in ctx.store.prefix_tuple(("u",))
                if uid != int(rec["k"])
            )
            ctx.store.put(("u", int(rec["k"])), 1)
            ctx.forward(k=int(rec["k"]), others=others)

    df = spark.createDataFrame(
        [(0, 1.0), (2, 2.0), (4, 3.0), (1, 1.5), (3, 2.5)], "k LONG, ts DOUBLE"
    )
    out = state.process_partitioned(
        df,
        key=["k"],
        num_partitions=2,
        processor_factory=SeenBefore,
        output_schema="k LONG, others BIGINT",
        ts_col="ts",
        order_by=("k",),
        partitioner=F.expr("k % 2"),
    )
    got = {(r.k, r.others) for r in out.collect()}
    # partition 0 sees k=0 (0 others), k=2 (1 other), k=4 (2 others);
    # partition 1 sees k=1 (0), k=3 (1)
    assert got == {(0, 0), (2, 1), (4, 2), (1, 0), (3, 1)}
