"""Streaming pretrain export: continuous ingest -> near-dup drop ->
incremental balanced shard export + incremental sequence packing.

The STREAMING twin of ``examples/pretrain_pipeline.py``'s curate->shard
tail, and the export-side sibling of ``examples/retrieval_stream.py``:
documents arrive in waves; near-duplicates are dropped on arrival by the
FACT-store banded-MinHash lane (first copy wins); each round's NEW
survivors are handed to the incremental shard exporter, which continues
the open shard from its carried corpus-total scalar — so training shard
files accumulate continuously, earlier shards immutable from the moment
they fill, without ever re-dealing exported documents.

Exactly-once HANDOFF: a survivor is shipped to the shard topic only if
it is in NEITHER the committed assignment log NOR the shard lane's
pending topic — so a crash between the handoff write and the shard
lane's advance re-ships nothing on replay (the doc is already pending),
and the shard lane's own delta+marker protocol
(streaming/shard_stream.py) makes the assignment itself exactly-once.

Reference anchor: the e2e pipeline posture of
e2etest/E2ETestApplication.java:120-148 (ingest topology feeding a
durable export) composed with FACT-store dedup
(api/stores/ResponsiveStores.java:79-96).

Scale posture: the dedup lane holds member-id-only bucket state with
eviction; the survivor/new anti-joins are doc_id equi-joins (AQE
broadcasts the small sides); the shard lane's per-batch work is the
batch exporter's audited two-pass prefix sum with ONE carried scalar.
No stage scans more than the arriving wave plus id-projections of the
logs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.streaming.dedup_stream import (
    DOCS_SCHEMA,
    NearDupStreaming,
)
from responsive_pub_spark.streaming.pack_ids_stream import PackIdsStreaming
from responsive_pub_spark.streaming.pack_stream import PackStreaming
from responsive_pub_spark.streaming.shard_stream import ShardStreaming


class PretrainStream:
    """Compose NearDupStreaming (continuous mode) + ShardStreaming into
    one ingest-to-shards pipeline over a shared ``workdir``. All state is
    on disk; a fresh instance over the same workdir resumes where the
    last one stopped (cold restart — every stage re-reads its own
    checkpoint/topic/commit log)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        budget: int | None = None,
        retention: float = 3600.0,
        probe_depth: int = 8,
        tokenizer_fit: DataFrame | None = None,
    ):
        self.spark = spark
        self.nd = NearDupStreaming(
            spark,
            os.path.join(workdir, "neardup"),
            probe_depth=probe_depth,
            retention=retention,
            continuous=True,
        )
        kw = {} if budget is None else {"budget": int(budget)}
        self.shards = ShardStreaming(
            spark, os.path.join(workdir, "shards"), **kw
        )
        # the packing leg runs beside the shard leg over the SAME
        # survivor handoff: shards are the export files, sequences are
        # the training batches — both continue their open tail from
        # carried totals (one scalar / one per-lang table)
        self.packs = PackStreaming(
            spark, os.path.join(workdir, "packs"), **kw
        )
        # the ID-EMISSION leg (r11 VERDICT task 6): the frozen-tokenizer
        # twin of the pack leg, shipping the (lang, seq_id, pos,
        # token_id) rows a training loader consumes. Enabled by passing
        # ``tokenizer_fit`` ONCE (the corpus the tokenizer freezes on);
        # restarts over the same workdir find the frozen artifact.
        ids_dir = os.path.join(workdir, "pack_ids")
        have_artifact = os.path.exists(
            os.path.join(ids_dir, "tokenizer", "vocab")
        )
        self.pack_ids: PackIdsStreaming | None = None
        if tokenizer_fit is not None or have_artifact:
            self.pack_ids = PackIdsStreaming(
                spark, ids_dir, fit_docs=tokenizer_fit, **kw
            )
        self.lang_dir = os.path.join(workdir, "doc_lang")
        os.makedirs(self.lang_dir, exist_ok=True)

    # -- ingest ------------------------------------------------------------
    def ingest(self, docs: DataFrame) -> None:
        """Append a wave of (doc_id, lang, text, ts) docs: text goes to
        the dedup topic; lang is STAGED beside it (the retrieval_stream
        pending-column pattern) until the doc survives the verdict and
        the packing leg needs its language key."""
        docs.select("doc_id", "text", F.col("ts").cast("double")).write.mode(
            "append"
        ).parquet(self.nd.docs_dir)
        docs.select("doc_id", "lang").write.mode("append").parquet(
            self.lang_dir
        )

    def advance(self) -> None:
        """Drain both stages: dedup verdicts over everything ingested,
        then hand this round's NEW survivors (in neither the committed
        assignment log nor the pending shard topic) to the exporter."""
        self.nd.advance()
        docs = self.spark.read.schema(DOCS_SCHEMA).parquet(self.nd.docs_dir)
        drops = (
            self.nd.verdicts().filter("is_duplicate").select("doc_id")
        )
        survivors = docs.join(drops, "doc_id", "left_anti").select(
            "doc_id", "text"
        )
        # the pending shard topic carries (doc_id, text); read ids only
        pending_ids = (
            self.spark.read.schema("doc_id BIGINT, text STRING")
            .parquet(self.shards.docs_dir)
            .select("doc_id")
            if os.listdir(self.shards.docs_dir)
            else self.spark.createDataFrame([], "doc_id BIGINT")
        )
        new = survivors.join(pending_ids, "doc_id", "left_anti")
        if new.limit(1).count() > 0:
            self.shards.ingest(new)
        self.shards.advance()
        # packing leg: the same exactly-once handoff against the pack
        # lane's own pending topic, with the staged language re-attached
        pack_pending = (
            self.spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
            .parquet(self.packs.docs_dir)
            .select("doc_id")
            if os.listdir(self.packs.docs_dir)
            else self.spark.createDataFrame([], "doc_id BIGINT")
        )
        langs = self.spark.read.schema("doc_id BIGINT, lang STRING").parquet(
            self.lang_dir
        )
        pack_new = survivors.join(pack_pending, "doc_id", "left_anti").join(
            langs, "doc_id"
        )
        if pack_new.limit(1).count() > 0:
            self.packs.ingest(pack_new)
        self.packs.advance()
        # id-emission leg: same exactly-once handoff discipline
        if self.pack_ids is not None:
            ids_pending = (
                self.spark.read.schema(
                    "doc_id BIGINT, lang STRING, text STRING"
                )
                .parquet(self.pack_ids.docs_dir)
                .select("doc_id")
                if os.listdir(self.pack_ids.docs_dir)
                else self.spark.createDataFrame([], "doc_id BIGINT")
            )
            ids_new = survivors.join(ids_pending, "doc_id", "left_anti").join(
                langs, "doc_id"
            )
            if ids_new.limit(1).count() > 0:
                self.pack_ids.ingest(ids_new)
            self.pack_ids.advance()

    # -- readers -----------------------------------------------------------
    def assignments(self) -> DataFrame:
        """Committed (doc_id, n_tokens, shard_id, shard_offset) rows."""
        return self.shards.assignments()

    def manifest(self) -> DataFrame:
        return self.shards.manifest()

    def pack_assignments(self) -> DataFrame:
        """Committed (doc_id, lang, n_tokens, seq_id, seq_offset) rows."""
        return self.packs.assignments()

    def token_ids(self) -> DataFrame:
        """Committed (lang, seq_id, pos, token_id) rows — the streamed
        ``pack_token_ids`` deliverable (requires the id leg)."""
        if self.pack_ids is None:
            raise ValueError(
                "PretrainStream: the id leg was never enabled — pass "
                "tokenizer_fit= on first construction"
            )
        return self.pack_ids.ids()

    def token_sequences(self, lang: str, closed_only: bool = True):
        """Training-batch reader over the streamed ids: (seq_id, toks)
        fixed-length arrays per language (see
        PackIdsStreaming.sequences)."""
        if self.pack_ids is None:
            raise ValueError(
                "PretrainStream: the id leg was never enabled — pass "
                "tokenizer_fit= on first construction"
            )
        return self.pack_ids.sequences(lang, closed_only=closed_only)

    def surviving_docs(self) -> DataFrame:
        docs = self.spark.read.schema(DOCS_SCHEMA).parquet(self.nd.docs_dir)
        drops = (
            self.nd.verdicts().filter("is_duplicate").select("doc_id")
        )
        return docs.join(drops, "doc_id", "left_anti").select(
            "doc_id", "text"
        )
