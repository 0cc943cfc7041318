"""Streaming KGroupedTable re-aggregation WITH RETRACTION.

The reference subtracts a key's OLD value from its old group before adding
the new one — get-before-put on the table store
(internal/stores/PartitionedOperations.java:364-371); Kafka Streams models
the same as the (subtractor, adder) pair on ``KGroupedTable.aggregate``.

Spark forbids chaining two stateful aggregations in one update-mode query
(latest-per-key, then re-agg), so — exactly like the FK join
(operators/fk_join.FkJoinStreaming, the reference's SUBSCRIPTION/RESPONSE
internal-topic wiring) — the regroup runs as TWO checkpointed queries with
an intermediate RETRACTION topic:

  query A: table changelog -> get-before-put processor (state = each key's
           current (group, value)); a key moving groups emits
           (old_group, -1, -old_value) then (new_group, +1, +new_value);
  query B: retraction topic -> per-group running sums -> re-agg changelog.

Deltas are integers end-to-end (counts + fixed-point values), so
subtract-then-add is exact: a group's aggregate after retraction equals the
batch aggregate over the final snapshot bit-for-bit.  A group whose last
member leaves reaches n == 0 and drops out of the compacted table — the
retraction tombstone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.streaming import state

#: retraction-topic schema (query A -> query B)
RETRACT_SCHEMA = "grp STRING, cnt_delta BIGINT, val_delta BIGINT, ts DOUBLE"
#: re-agg changelog schema (query B output; emit_seq totals emissions per
#: group so compaction has a per-group total order)
REAGG_SCHEMA = "grp STRING, n BIGINT, total BIGINT, emit_seq BIGINT"


class _RetractProcessor(state.Processor):
    """Get-before-put (PartitionedOperations.java:364-371): the store holds
    each table key's current (group, value); every update first retracts
    the old version from its group, then adds the new one."""

    def process(self, ctx, rec):
        old = ctx.store.get("v")
        grp, val = str(rec["grp"]), int(rec["val"])
        ts = float(rec["ts"])
        if old is not None:
            ctx.forward(grp=old[0], cnt_delta=-1, val_delta=-old[1], ts=ts)
        ctx.forward(grp=grp, cnt_delta=1, val_delta=val, ts=ts)
        ctx.store.put("v", (grp, val))


class _GroupSumProcessor(state.Processor):
    """Running (count, sum) per group over the retraction stream; forwards
    the group's state after every delta — the re-agg changelog.  emit_seq
    persists in the store, so the LAST emission per group is well-defined
    across micro-batches and restarts."""

    def process(self, ctx, rec):
        n = int(ctx.store.get("n") or 0) + int(rec["cnt_delta"])
        s = int(ctx.store.get("s") or 0) + int(rec["val_delta"])
        e = int(ctx.store.get("e") or 0) + 1
        ctx.store.put("n", n)
        ctx.store.put("s", s)
        ctx.store.put("e", e)
        ctx.forward(grp=str(ctx.key[0]), n=n, total=s, emit_seq=e)


class RegroupStreaming:
    """Two-stage checkpointed streaming regroup (see module docstring).

    ``input_schema`` must expose ``key_col`` (the table's primary key),
    ``grp`` (the re-grouping column), ``val`` (BIGINT fixed-point value)
    and ``ts`` (DOUBLE event time).  ``advance()`` drains both queries with
    availableNow — every advance is a cold start from the checkpoints, so
    the restart path is exercised on each call.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        input_schema: str,
        *,
        key_col: str,
        order_by: tuple = (),
    ):
        self.spark = spark
        self.input_dir = os.path.join(workdir, "table-changelog")
        self.retract_topic = os.path.join(workdir, "retractions")
        self.out_dir = os.path.join(workdir, "reagg-changelog")
        self.ck0 = os.path.join(workdir, "ck-retract")
        self.ck1 = os.path.join(workdir, "ck-reagg")
        for d in (self.input_dir, self.retract_topic, self.out_dir):
            os.makedirs(d, exist_ok=True)
        self.input_schema = input_schema
        self.key_col = key_col
        self.order_by = tuple(order_by)

    def _run(self, out_df, path, ckpt) -> None:
        q = (
            out_df.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def advance(self) -> None:
        changelog = self.spark.readStream.schema(self.input_schema).parquet(
            self.input_dir
        )
        retract = state.process_streaming(
            changelog,
            key=[self.key_col],
            processor_factory=_RetractProcessor,
            output_schema=RETRACT_SCHEMA,
            ts_col="ts",
            order_by=self.order_by,
        )
        self._run(retract, self.retract_topic, self.ck0)

        deltas = self.spark.readStream.schema(RETRACT_SCHEMA).parquet(
            self.retract_topic
        )
        reagg = state.process_streaming(
            deltas,
            key=["grp"],
            processor_factory=_GroupSumProcessor,
            output_schema=REAGG_SCHEMA,
            ts_col="ts",
            # sums are commutative, but a deterministic replay order keeps
            # intermediate emissions (and emit_seq assignment) bit-stable
            order_by=("cnt_delta", "val_delta"),
        )
        self._run(reagg, self.out_dir, self.ck1)

    def changelog(self) -> DataFrame:
        return self.spark.read.schema(REAGG_SCHEMA).parquet(self.out_dir)

    def snapshot(self) -> DataFrame:
        """Compact the re-agg changelog to the current table: the LAST
        emission per group; groups retracted to n == 0 drop out."""
        snap = (
            self.changelog()
            .groupBy("grp")
            .agg(
                F.max_by("n", F.col("emit_seq")).alias("n"),
                F.max_by("total", F.col("emit_seq")).alias("total"),
            )
            .filter(F.col("n") > 0)
        )
        return snap
