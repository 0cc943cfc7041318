"""Async stage semantics (SURVEY.md §2.8): concurrent execution with
strict same-key ordering — the AsyncProcessorSupplier guarantee
(api/async/AsyncProcessorSupplier.java:86-101).

Invocation order is observed via a monotonic clock captured inside each
call (the fn runs in the executor's Python worker, so driver-side globals
can't see it)."""

from __future__ import annotations

import random

from responsive_pub_spark.streaming import state
from responsive_pub_spark.streaming.async_stage import (
    async_map_ordered,
    async_process_stateful,
)


def test_same_key_strictly_ordered_under_concurrency(spark):
    def jittery_rpc(rec: dict) -> dict:  # closure => pickled by value
        import random as r
        import time

        time.sleep(r.uniform(0, 0.003))
        return {
            "user_id": int(rec["user_id"]),
            "seq": int(rec["seq"]),
            "t_ns": time.monotonic_ns(),
        }

    rows = [
        {"user_id": u, "seq": s, "ts": float(s)} for u in range(6) for s in range(30)
    ]
    random.shuffle(rows)
    # one partition => one mapInPandas task => all keys interleave on the
    # pool. repartition_by_key=False is the explicit opt-out path (input
    # already co-located); order_by pins the per-key replay order.
    df = spark.createDataFrame(rows, "user_id LONG, seq LONG, ts DOUBLE").coalesce(1)
    out = async_map_ordered(
        df, ["user_id"], jittery_rpc, "user_id LONG, seq LONG, t_ns LONG",
        max_workers=8, repartition_by_key=False, order_by=["user_id", "seq"],
    ).collect()
    assert len(out) == len(rows)

    # same-key calls executed strictly in seq order (per-key ordering)
    per_key: dict[int, list[tuple[int, int]]] = {}
    for r in out:
        per_key.setdefault(r.user_id, []).append((r.seq, r.t_ns))
    for u, pairs in per_key.items():
        by_seq = [t for _, t in sorted(pairs)]
        assert by_seq == sorted(by_seq), f"key {u} executed out of order"

    # cross-key interleaving actually happened (concurrent, not key-serial)
    by_time = sorted(out, key=lambda r: r.t_ns)
    key_seq = [r.user_id for r in by_time]
    switches = sum(1 for a, b in zip(key_seq, key_seq[1:]) if a != b)
    assert switches > 10, "no cross-key concurrency observed"


def test_same_key_ordered_across_arrow_batches(spark):
    """The default path (repartition ON): same-key order must survive Arrow
    chunking — the task drains ALL batches before executing, so a key split
    across Arrow batches still runs sequentially in order (the ADVICE r1
    cross-batch reordering scenario)."""
    def stamped(rec: dict) -> dict:
        import time

        return {
            "user_id": int(rec["user_id"]),
            "seq": int(rec["seq"]),
            "t_ns": time.monotonic_ns(),
        }

    rows = [
        {"user_id": u, "seq": s, "ts": float(s)} for u in range(4) for s in range(200)
    ]
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "user_id LONG, seq LONG, ts DOUBLE")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        out = async_map_ordered(
            df, ["user_id"], stamped, "user_id LONG, seq LONG, t_ns LONG",
            max_workers=8, order_by=["seq"],
        ).collect()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(out) == len(rows)
    per_key: dict[int, list[tuple[int, int]]] = {}
    for r in out:
        per_key.setdefault(r.user_id, []).append((r.seq, r.t_ns))
    for u, pairs in per_key.items():
        assert len(pairs) == 200
        by_seq = [t for _, t in sorted(pairs)]
        assert by_seq == sorted(by_seq), f"key {u} reordered across batches"


def test_async_stateful_matches_sync_process(spark):
    """AsyncProcessorSupplier wraps STATEFUL processors: the async schedule
    must be semantically invisible — output identical to the synchronous
    state.process replay of the same processor."""
    # defined in-function so cloudpickle ships the class by value (test
    # modules are not importable from executor workers)
    class _CountProc(state.Processor):
        def process(self, ctx, rec):
            n = (ctx.store.get("n") or 0) + 1
            ctx.store.put("n", n)
            ctx.forward(
                user_id=int(rec["user_id"]), seq=int(rec["seq"]), running_cnt=n
            )

    rows = [
        {"user_id": u, "seq": s, "ts": float(s)} for u in range(8) for s in range(50)
    ]
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "user_id LONG, seq LONG, ts DOUBLE")
    schema = "user_id BIGINT, seq BIGINT, running_cnt BIGINT"
    sync = state.process(
        df, key=["user_id"], processor_factory=_CountProc,
        output_schema=schema, ts_col="ts", order_by=("seq",),
    ).collect()
    async_ = async_process_stateful(
        df, key=["user_id"], processor_factory=_CountProc,
        output_schema=schema, ts_col="ts", order_by=("seq",), max_workers=8,
    ).collect()
    key_fn = lambda r: (r.user_id, r.seq)  # noqa: E731
    assert sorted(map(tuple, sync)) == sorted(map(tuple, async_))
    # state correctness: running count == seq+1 per key
    for r in async_:
        assert r.running_cnt == r.seq + 1
