"""KeyBatchExample analog (kafka-client-examples/.../KeyBatchExample.java:
64-218): buffer events per key in a store; a stream-time punctuator
(context.schedule(interval, STREAM_TIME, ...) — :137-141) periodically
flushes each key's batch downstream as one record, scanning the stored
buffer (the storedKey range-scan pattern — :126-218).

Use case (reference docstring): downstream consumers that want per-key
batches instead of a record per event — e.g. one LLM call over a user's
recent events instead of one per event."""

from __future__ import annotations

from pyspark.sql import DataFrame

from responsive_pub_spark.streaming import state


class KeyBatchProcessor(state.Processor):
    """Buffers event ids per key; flushes as one batch per punctuation."""

    def __init__(self, flush_interval_s: float = 86400.0):
        self.flush_interval_s = flush_interval_s

    def init(self, ctx):
        ctx.schedule(self.flush_interval_s, self._flush, state.STREAM_TIME)

    def process(self, ctx, rec):
        buf = ctx.store.get("buf") or []
        buf.append(int(rec["event_id"]))
        ctx.store.put("buf", buf)

    def _flush(self, ctx, fire_ts):
        buf = ctx.store.get("buf")
        if buf:
            ctx.forward(
                user_id=int(ctx.key[0]),
                flush_ts=int(fire_ts),
                n=len(buf),
                event_ids=",".join(map(str, buf)),
            )
            ctx.store.delete("buf")

    def close(self, ctx):
        # end-of-stream flush (batch replay only; in streaming the next
        # punctuation handles it) so no tail events are lost
        self._flush(ctx, int(ctx.store.stream_time) + 1)


def build(events: DataFrame, flush_interval_s: float = 86400.0) -> DataFrame:
    return state.process(
        events.select("user_id", "event_id", "ts"),
        key=["user_id"],
        processor_factory=lambda: KeyBatchProcessor(flush_interval_s),
        output_schema="user_id BIGINT, flush_ts BIGINT, n BIGINT, event_ids STRING",
        ts_col="ts",
        order_by=("event_id",),
    )
