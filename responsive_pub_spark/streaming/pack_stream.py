"""Incremental sequence packing: streaming continuation of
``pipeline_ops.pack_sequences``.

The batch packer concatenates each language's documents in (lang,
doc_id) order and cuts fixed-budget token sequences. A live pipeline
cannot re-concatenate sequences it has already emitted, so the
streaming form fixes arrival order ACROSS waves and keeps doc_id order
WITHIN each wave per language: every micro-batch runs the SAME
``bucketed_running_sum`` two-pass prefix sum as the batch op (keyed by
lang — never a per-lang single-reducer window), offset by a CARRIED
per-language token-total table, and appends to the assignment log.
Only each language's LAST sequence is ever open.

This is the keyed generalization of ``streaming/shard_stream.py``'s
protocol: the carried state is a per-lang total TABLE (a handful of
rows — language cardinality is a scale constant) instead of one scalar,
committed in the same delta-then-marker order. A redelivered batch
whose marker exists is skipped; a crash between delta and marker
replays the same rows and overwrites the torn delta; languages absent
from a batch carry their totals forward unchanged.

Batch parity (tests/test_pack_stream.py): after waves W1..Wk,
``assignments()`` row-equals ``pack_sequences``'s single-window twin
ordered (lang, wave, doc_id) — the gate oracle is the batch oracle with
one extra wave-major sort key inside each language partition.

Scale posture: per-batch work is the batch packer's own audited plan
(the only single-partition window is the <= n_buckets+1-row bucket
aggregate); the carried table is lang-cardinality-sized and BROADCAST
onto the batch; reads are a multi-path parquet scan of committed
deltas.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.functions import text as T
from responsive_pub_spark.operators.pipeline_ops import (
    PACK_BUDGET_TOKENS,
    bucketed_running_sum,
)
from responsive_pub_spark.streaming.shard_stream import _chaos_kill

DOCS_SCHEMA = "doc_id BIGINT, lang STRING, text STRING"
ASSIGN_SCHEMA = (
    "doc_id BIGINT, lang STRING, n_tokens BIGINT, "
    "seq_id BIGINT, seq_offset BIGINT"
)
TOTALS_SCHEMA = "lang STRING, post_total BIGINT"


class PackStreaming:
    """Incremental sequence packer over a docs file topic (see module
    docstring). All state lives under ``workdir``; a fresh instance
    resumes from the checkpoint + commit markers (cold restart)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        budget: int = PACK_BUDGET_TOKENS,
        n_buckets: int = 64,
    ):
        self.spark = spark
        self.budget = int(budget)
        self.n_buckets = int(n_buckets)
        self.docs_dir = os.path.join(workdir, "docs")
        self.log_dir = os.path.join(workdir, "assign")
        self.ck = os.path.join(workdir, "ck-assign")
        os.makedirs(self.docs_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        # resume the mtime stamp sequence (shard_stream contract)
        self._pipe_n = sum(
            1 for n in os.listdir(self.docs_dir) if n.startswith("part-")
        )

    # -- ingest ------------------------------------------------------------
    def ingest(self, docs: DataFrame) -> None:
        """Append one wave of (doc_id, lang, text) docs; one wave == one
        file == one micro-batch (stamped strictly increasing mtimes)."""
        docs.select("doc_id", "lang", "text").coalesce(1).write.mode(
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

    def _base_totals(self, batch_id: int) -> DataFrame:
        """Per-lang carried totals from the latest committed marker below
        ``batch_id`` (empty on the first batch)."""
        prior = [i for i in self._committed_ids() if i < int(batch_id)]
        if not prior:
            return self.spark.createDataFrame([], TOTALS_SCHEMA)
        return self.spark.read.schema(TOTALS_SCHEMA).parquet(
            self._marker(prior[-1])
        )

    def _apply(self, bdf: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # redelivered, already committed
        _chaos_kill("pre-delta")
        base = self._base_totals(batch_id)
        bpe = (
            f"size(regexp_extract_all(text, "
            f"'{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
        )
        toks = bdf.select(
            "doc_id", "lang", F.expr(bpe).cast("bigint").alias("n_tokens")
        )
        cum = bucketed_running_sum(
            toks,
            ["lang"],
            "doc_id",
            "n_tokens",
            "cum_tokens",
            n_buckets=self.n_buckets,
        )
        joined = cum.join(
            F.broadcast(base.withColumnRenamed("post_total", "base0")),
            "lang",
            "left",
        ).withColumn(
            "g_cum", F.coalesce("base0", F.lit(0)) + F.col("cum_tokens")
        )
        assign = joined.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(f"(g_cum - n_tokens) DIV {self.budget}").alias("seq_id"),
            ((F.col("g_cum") - F.col("n_tokens")) % self.budget)
            .cast("bigint")
            .alias("seq_offset"),
        )
        delta = self._delta(batch_id)
        shutil.rmtree(delta, ignore_errors=True)  # torn replay
        assign.write.mode("overwrite").parquet(delta)
        _chaos_kill("post-delta")
        # new totals = carried totals outer-merged with THIS delta's
        # per-lang sums (langs absent from the batch carry forward);
        # recomputed from the WRITTEN delta so the marker commits exactly
        # what readers will see
        written = self.spark.read.schema(ASSIGN_SCHEMA).parquet(delta)
        batch_sums = written.groupBy("lang").agg(
            F.sum("n_tokens").alias("batch_tokens")
        )
        merged = (
            base.join(batch_sums, "lang", "full_outer")
            .select(
                "lang",
                (
                    F.coalesce("post_total", F.lit(0))
                    + F.coalesce("batch_tokens", F.lit(0))
                )
                .cast("bigint")
                .alias("post_total"),
            )
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            self._marker(batch_id)
        )

    def advance(self) -> None:
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
        paths = [self._delta(i) for i in self._committed_ids()]
        if not paths:
            return self.spark.createDataFrame([], ASSIGN_SCHEMA)
        return self.spark.read.schema(ASSIGN_SCHEMA).parquet(*paths)

    def totals(self) -> DataFrame:
        """Current per-lang carried token totals."""
        ids = self._committed_ids()
        if not ids:
            return self.spark.createDataFrame([], TOTALS_SCHEMA)
        return self.spark.read.schema(TOTALS_SCHEMA).parquet(
            self._marker(ids[-1])
        )
