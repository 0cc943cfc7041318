"""Incremental retrieval stack: streaming ingest -> continuous near-dup
drop -> IVF index upsert -> hybrid (BM25 + embedding) queries.

The STREAMING twin of ``examples/vector_pipeline.py`` — the deployment
shape a retrieval corpus actually runs: documents (with their embeddings)
arrive continuously; near-duplicates are dropped on arrival by the
FACT-store banded-MinHash lane (first copy wins, later copies never reach
the index); survivors' vectors are upserted into the incremental IVF
index; and two query surfaces serve from the live state:

- :meth:`ann_topk` — IVF top-k over the served inverted lists (the
  vector-native surface; ``IvfIncremental.maybe_retrain`` keeps the
  centroids covering the drifted distribution, crash-atomically);
- :meth:`hybrid` — BM25 lexical candidates re-ranked by embedding cosine
  over the SURVIVING documents, served from the INCREMENTALLY MAINTAINED
  BM25 statistics (``Bm25Streaming.hybrid_topk`` — the r11 VERDICT
  task-2 wiring): query time is joins over the postings/df/stats tables
  the ingest path keeps current, never a per-query corpus-wide df/dl
  re-aggregation. The BM25 lane indexes exactly the dedup SURVIVORS —
  new survivors are handed off per advance() with a doc_id anti-join
  against the lane's own topic, so an at-least-once replay of the
  handoff ships nothing twice (a doc is one row in the topic, and df/dl
  state would double-count a duplicate — read-time dedup cannot fix an
  aggregate, so the handoff dedups at the source).

The reference analog is the async-enrich posture of
e2etest/E2ETestApplication.java:120-148 composed with FACT-store dedup
(api/stores/ResponsiveStores.java:79-96): an ingest topology whose state
feeds interactive queries. Spark-first mapping: each stage is its own
checkpointed availableNow drain; every handoff is a parquet topic.

Delivery contract: the vector handoff (survivors -> IVF) is
AT-LEAST-ONCE — a crash between the survivor write and the IVF
checkpoint commit replays the batch — and the index collapses replays at
read time (``lists(dedup=True)``, the documented IvfIncremental
contract), so queries are replay-identical to a batch rebuild over the
same survivor set (asserted across a cold restart in
tests/test_examples.py).

Scale posture: the dedup lane shuffles (band, band_hash) keyed bucket
state holding member IDS only; the survivor anti-joins are equi-joins on
doc_id/vec_id (AQE broadcasts the drop set while it is small); the IVF
upsert is one broadcast-assign pass over NEW vectors only; both query
surfaces probe — they never shuffle the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.operators import similarity
from responsive_pub_spark.streaming.ann_stream import IvfIncremental
from responsive_pub_spark.streaming.bm25_stream import (
    DOCS_SCHEMA as BM25_DOCS_SCHEMA,
    Bm25Streaming,
)
from responsive_pub_spark.streaming.dedup_stream import (
    DOCS_SCHEMA,
    NearDupStreaming,
)

#: staged (vec_id, embedding) rows awaiting their dedup verdict
PENDING_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>"


class RetrievalStream:
    """Compose NearDupStreaming (continuous mode) + IvfIncremental into
    one ingest-to-query pipeline over a shared ``workdir``. All state is
    on disk; a fresh instance over the same workdir resumes where the
    last one stopped (cold restart — every stage re-reads its own
    checkpoint/topic)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        centroids: DataFrame | None = None,
        retention: float = 3600.0,
        probe_depth: int = 8,
    ):
        self.spark = spark
        self.pending_dir = os.path.join(workdir, "pending_vecs")
        os.makedirs(self.pending_dir, exist_ok=True)
        self.nd = NearDupStreaming(
            spark,
            os.path.join(workdir, "neardup"),
            probe_depth=probe_depth,
            retention=retention,
            continuous=True,
        )
        self.ivf = IvfIncremental(
            spark, os.path.join(workdir, "ivf"), centroids=centroids
        )
        self.bm25 = Bm25Streaming(spark, os.path.join(workdir, "bm25"))

    # -- ingest ----------------------------------------------------------
    def ingest(self, rows: DataFrame) -> None:
        """Append a wave of (doc_id, text, embedding, ts) rows: the text
        goes to the dedup lane's docs topic, the vector is STAGED until
        its doc survives the near-dup verdict."""
        rows.select("doc_id", "text", F.col("ts").cast("double")).write.mode(
            "append"
        ).parquet(self.nd.docs_dir)
        rows.select(
            F.col("doc_id").alias("vec_id"),
            F.col("embedding").cast("array<float>").alias("embedding"),
        ).write.mode("append").parquet(self.pending_dir)

    def advance(self) -> None:
        """Drain every stage: dedup verdicts over everything ingested,
        then upsert the vectors of NEW survivors (never indexed before)
        into the IVF. Idempotent: re-running after a crash re-ships at
        most one wave of survivor vectors, which ``lists(dedup=True)``
        collapses at read time."""
        self.nd.advance()
        drops = (
            self.nd.verdicts()
            .filter("is_duplicate")
            .select(F.col("doc_id").alias("vec_id"))
        )
        staged = self.spark.read.schema(PENDING_SCHEMA).parquet(
            self.pending_dir
        )
        survivors = staged.join(drops, "vec_id", "left_anti")
        new = survivors.join(
            self.ivf.lists().select("vec_id"), "vec_id", "left_anti"
        )
        new.write.mode("append").parquet(self.ivf.vecs_dir)
        self.ivf.advance()
        # BM25 lane: hand off NEW surviving docs (doc_id anti-join
        # against the lane's own topic — exactly-once at doc granularity
        # even across a crashed handoff, since a visible part file only
        # ever holds complete rows)
        have = (
            self.spark.read.schema(BM25_DOCS_SCHEMA)
            .parquet(self.bm25.docs_dir)
            .select("doc_id")
        )
        new_docs = self.surviving_docs().join(have, "doc_id", "left_anti")
        self.bm25.ingest(new_docs)
        self.bm25.advance()

    # -- maintenance ------------------------------------------------------
    def maybe_retrain(self, retrain_pm: int = 1200) -> bool:
        """Delegate to the IVF's crash-atomic drift-triggered retrain."""
        return self.ivf.maybe_retrain(retrain_pm=retrain_pm)

    # -- query surfaces ---------------------------------------------------
    def surviving_docs(self) -> DataFrame:
        """(doc_id, text) of every ingested doc that survived dedup."""
        docs = self.spark.read.schema(DOCS_SCHEMA).parquet(self.nd.docs_dir)
        drops = (
            self.nd.verdicts().filter("is_duplicate").select("doc_id")
        )
        return docs.join(drops, "doc_id", "left_anti").select(
            "doc_id", "text"
        )

    def ann_topk(self, **kw) -> DataFrame:
        """IVF top-k over the served index (replay-dup-safe)."""
        return self.ivf.topk(**kw)

    def hybrid(
        self,
        n_queries: "int | None" = None,
        n_cand: int = similarity.HYBRID_CANDIDATES,
        k: int = similarity.HYBRID_K,
    ) -> DataFrame:
        """Two-stage retrieval over the LIVE state: BM25 candidates from
        the INCREMENTALLY MAINTAINED statistics (the lane indexes exactly
        the dedup survivors), re-ranked by cosine against the indexed
        vectors — query time joins the maintained postings/df/stats
        tables, never re-aggregating corpus df/dl. Row-equal to the
        batch ``hybrid_rerank`` over (surviving_docs, indexed vectors) —
        asserted across a cold restart in tests/test_examples.py."""
        emb = self.ivf.lists(dedup=True).select("vec_id", "embedding")
        return self.bm25.hybrid_topk(
            emb, n_queries=n_queries, n_cand=n_cand, k=k
        )
