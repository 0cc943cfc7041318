"""Incremental balanced shard export: streaming continuation of
``pipeline_ops.shard_balanced``.

The batch exporter deals the whole corpus into a seeded epoch-shuffle
order and cuts it greedily into ``budget``-token shards. A live ingest
pipeline cannot re-deal documents it has already exported — shard files
are immutable once written — so the streaming form fixes the arrival
order ACROSS waves and keeps the epoch-shuffle order WITHIN each wave:
every micro-batch's documents are ordered by the same permutation hash
``h = (a*(doc_id%P)+b) % P`` as the batch op, prefix-summed with the
audited two-pass range-bucket decomposition (``shard_balanced_counts``,
``base=`` the carried corpus total), and appended to the assignment log.
Only the LAST shard is ever open; everything before it is final the
moment it is emitted.

Batch parity contract (tests/test_shard_stream.py): after ingesting
waves W1..Wk, ``assignments()`` row-equals the batch computation over
the union ordered by (wave, h, doc_id) — the single-window DuckDB twin
with wave-major ordering, so the gate oracle is ``shard_balanced``'s
with one extra leading sort key.

Exactly-once: the KV-sink commit protocol (streaming/kv_sink.py, the
reference's CommitBuffer offset-fencing posture —
internal/stores/CommitBuffer.java:340-423) applied to an append log
with a carried scalar. Each micro-batch writes its assignment rows to
``delta-{batch_id}`` and THEN commits ``total-{batch_id}`` (one row:
the post-batch corpus token total). The total file is the commit
marker: a redelivered batch whose marker exists is skipped; a crash
between delta and marker replays the SAME rows (checkpointed source
offsets) and overwrites the torn delta. ``base`` for batch N is the
latest committed total below N — a single tiny-file read, never a scan
of the log.

Scale posture: per-batch work is the batch exporter's own audited plan
(tokenize -> one bucketed prefix sum; the only single-partition window
is the <= n_buckets+1-row bucket aggregate); the carried state is ONE
scalar, so state neither grows with the corpus nor funnels rows through
a reducer. Reads are a multi-path parquet scan of committed deltas.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.operators.pipeline_ops import (
    SHARD_BUCKETS,
    SHARD_BUDGET_TOKENS,
    shard_balanced_counts,
)
from responsive_pub_spark.functions import text as T

DOCS_SCHEMA = "doc_id BIGINT, text STRING"
ASSIGN_SCHEMA = (
    "doc_id BIGINT, n_tokens BIGINT, shard_id BIGINT, shard_offset BIGINT"
)


def _chaos_kill(label: str) -> None:
    """SIGKILL self at a named commit-protocol stage — DOUBLE opt-in
    (the ann_stream._chaos_kill contract): requires BOTH
    SPARK_GRAFT_CHAOS_ENABLE=1 and SPARK_GRAFT_SHARD_KILL=<label>, so a
    leftover env var alone can never kill a production run. Used by
    tests/test_chaos_sigkill.py to land a crash inside every window of
    the delta+marker protocol."""
    if (
        os.environ.get("SPARK_GRAFT_CHAOS_ENABLE") == "1"
        and os.environ.get("SPARK_GRAFT_SHARD_KILL") == label
    ):
        import signal

        os.kill(os.getpid(), signal.SIGKILL)


class ShardStreaming:
    """Incremental shard exporter over a docs file topic (see module
    docstring). All state lives under ``workdir``; a fresh instance
    resumes from the checkpoint + commit markers (cold restart)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        budget: int = SHARD_BUDGET_TOKENS,
        seed: int = 0,
        n_buckets: int = SHARD_BUCKETS,
    ):
        self.spark = spark
        self.budget = int(budget)
        self.seed = int(seed)
        self.n_buckets = int(n_buckets)
        self.docs_dir = os.path.join(workdir, "docs")
        self.log_dir = os.path.join(workdir, "assign")
        self.ck = os.path.join(workdir, "ck-assign")
        os.makedirs(self.docs_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        # resume the mtime stamp sequence past any waves already in the
        # topic, so a restarted instance's next wave sorts AFTER them —
        # without this, two unseen files could tie on mtime and replay
        # in either order
        self._pipe_n = sum(
            1 for n in os.listdir(self.docs_dir) if n.startswith("part-")
        )

    # -- ingest ------------------------------------------------------------
    def ingest(self, docs: DataFrame) -> None:
        """Append one wave of (doc_id, text) docs to the topic. One wave ==
        one file == one micro-batch (mtimes stamped strictly increasing so
        wave order IS processing order — the Kafka offset-order analog,
        same device as runtime.TopologyTestDriver.pipe)."""
        docs.select("doc_id", "text").coalesce(1).write.mode(
            "append"
        ).parquet(self.docs_dir)
        self._pipe_n += 1
        stamp = 1_000_000_000 + self._pipe_n * 10
        for name in sorted(os.listdir(self.docs_dir)):
            path = os.path.join(self.docs_dir, name)
            if name.startswith("part-") and os.path.getmtime(path) > stamp:
                os.utime(path, (stamp, stamp))

    # -- commit log --------------------------------------------------------
    def _delta(self, batch_id: int) -> str:
        return os.path.join(self.log_dir, f"delta-{batch_id:020d}.parquet")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.log_dir, f"total-{batch_id:020d}.parquet")

    def _committed_ids(self) -> "list[int]":
        return sorted(
            int(os.path.basename(p)[len("total-"):].split(".")[0])
            for p in glob.glob(os.path.join(self.log_dir, "total-*.parquet"))
        )

    def _base_total(self, batch_id: int) -> int:
        prior = [i for i in self._committed_ids() if i < int(batch_id)]
        if not prior:
            return 0
        row = self.spark.read.parquet(self._marker(prior[-1])).collect()
        return int(row[0].post_total)

    def _apply(self, bdf: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # redelivered, already committed — the offset check
        _chaos_kill("pre-delta")
        base = self._base_total(batch_id)
        bpe = (
            f"size(regexp_extract_all(text, "
            f"'{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
        )
        counts = bdf.select(
            "doc_id", F.expr(bpe).cast("bigint").alias("n_tokens")
        )
        assign = shard_balanced_counts(
            counts,
            budget=self.budget,
            seed=self.seed,
            n_buckets=self.n_buckets,
            base=base,
        )
        delta = self._delta(batch_id)
        shutil.rmtree(delta, ignore_errors=True)  # torn replay
        assign.write.mode("overwrite").parquet(delta)
        _chaos_kill("post-delta")
        # post-total from the WRITTEN delta (one tiny re-scan) so the
        # marker commits exactly what readers will see
        written = self.spark.read.schema(ASSIGN_SCHEMA).parquet(delta)
        tot = written.agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t")
        ).collect()[0].t
        self.spark.createDataFrame(
            [(int(batch_id), int(base) + int(tot))],
            "batch_id BIGINT, post_total BIGINT",
        ).coalesce(1).write.mode("overwrite").parquet(self._marker(batch_id))

    def advance(self) -> None:
        """Drain pending waves, one micro-batch per wave, through the
        commit protocol."""
        docs = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(self.docs_dir)
        )
        q = (
            docs.writeStream.foreachBatch(self._apply)
            .outputMode("append")
            .option("checkpointLocation", self.ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- readers -----------------------------------------------------------
    def assignments(self) -> DataFrame:
        """All committed assignment rows (uncommitted/torn deltas are
        invisible — only deltas with a marker are read)."""
        paths = [self._delta(i) for i in self._committed_ids()]
        if not paths:
            return self.spark.createDataFrame([], ASSIGN_SCHEMA)
        return self.spark.read.schema(ASSIGN_SCHEMA).parquet(*paths)

    def total_tokens(self) -> int:
        ids = self._committed_ids()
        return self._base_total(ids[-1] + 1) if ids else 0

    def manifest(self) -> DataFrame:
        """Per-shard manifest over the committed log (shard_id, n_docs,
        shard_tokens) — only the highest shard_id can still grow."""
        return self.assignments().groupBy("shard_id").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
