"""Child driver for the SIGKILL chaos e2e (run as a subprocess by
tests/test_chaos_sigkill.py — NOT a pytest module).

Builds the checksum-chain streaming topology (process_streaming ->
KeyValueTableSink) over a file-broker input dir and drains it with
availableNow. When the ``armed`` flag file exists, the processor stalls at
the poison record AFTER some records of the batch already updated state —
touching the ``inflight`` marker so the parent knows the batch is mid-
flight — and the parent SIGKILLs the whole process group (python driver +
JVM + python workers), the closest local analog of the reference's
JVM-kill chaos (e2etest/E2ETestDriver.java,
UncaughtStreamsAntithesisHandler.java)."""

from __future__ import annotations

import os
import sys
import time

# run as a script: sys.path[0] is tests/, so put the repo root first
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    workdir = sys.argv[1]
    poison_id = int(sys.argv[2])
    input_dir = os.path.join(workdir, "input")
    ckpt = os.path.join(workdir, "checkpoint")
    table = os.path.join(workdir, "table")
    marker = os.path.join(workdir, "inflight")
    kill_flag = os.path.join(workdir, "armed")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from responsive_pub_spark.streaming import state
    from responsive_pub_spark.streaming.kv_sink import KeyValueTableSink

    def make_proc():
        class PoisonChecksum(state.Processor):
            def process(self, ctx, rec):
                eid = int(rec["event_id"])
                if eid == poison_id and os.path.exists(kill_flag):
                    # mid-batch, mid-key-group: earlier records of this
                    # batch already updated state and forwarded. Signal
                    # the parent and stall so the SIGKILL lands INSIDE
                    # the batch, before any sink/state commit.
                    open(marker, "a").close()
                    time.sleep(300)
                c = ctx.store.get("c") or 0
                c = (c * 31 + eid) % 1_000_000_007
                ctx.store.put("c", c)
                ctx.forward(user_id=int(ctx.key[0]), event_id=eid, checksum=c)

        return PoisonChecksum

    sdf = spark.readStream.schema(
        "user_id LONG, event_id LONG, ts DOUBLE"
    ).parquet(input_dir)
    out = state.process_streaming(
        sdf,
        ["user_id"],
        make_proc(),
        "user_id BIGINT, event_id BIGINT, checksum BIGINT",
        ts_col="ts",
        order_by=("event_id",),
    )
    sink = KeyValueTableSink(table, ["user_id", "event_id"], ["checksum"])
    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
