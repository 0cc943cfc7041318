"""Async stage semantics (SURVEY.md §2.8): concurrent execution with
strict same-key ordering — the AsyncProcessorSupplier guarantee
(api/async/AsyncProcessorSupplier.java:86-101).

Invocation order is observed via a monotonic clock captured inside each
call (the fn runs in the executor's Python worker, so driver-side globals
can't see it); all rows run in ONE mapInPandas task (coalesce(1)) so every
call shares that worker's clock.
"""

from __future__ import annotations

import random

from responsive_pub_spark.streaming.async_stage import async_map_ordered


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
    # one partition => one mapInPandas task => all keys interleave on the pool
    df = spark.createDataFrame(rows, "user_id LONG, seq LONG, ts DOUBLE").coalesce(1)
    # pre-sort within key so "input order" is seq order
    df = df.sortWithinPartitions("user_id", "seq")
    out = async_map_ordered(
        df, ["user_id"], jittery_rpc, "user_id LONG, seq LONG, t_ns LONG", max_workers=8
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

    # output preserves input row order exactly (deterministic output)
    got = [(r.user_id, r.seq) for r in out]
    assert got == sorted(got)
