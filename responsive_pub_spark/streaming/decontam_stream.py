"""Incrementally-maintained decontamination: streaming shingle
fingerprints for the train/test contamination check.

``pipeline_ops.decontaminate`` re-shingles the whole corpus AND the
whole eval split on every run. In production both sides GROW
continuously — new corpus waves land daily and new held-out benchmarks
are registered over time, and every new benchmark must be checked
retroactively against everything already ingested. This lane keeps both
fingerprint tables current so neither side is ever re-tokenized:

- **corpus postings** (stateless, append): each arriving corpus doc is
  shingled ONCE into (doc_id, n_shingles, h) rows — the per-doc shingle
  count rides every row, so the report needs no second corpus pass;
- - **eval postings** (stateless, append): each arriving eval doc
  shingled once into (eval_id, h) rows;
- :meth:`report` runs the batch op's exact aggregation over the
  maintained tables — corpus postings equi-joined against the BROADCAST
  eval postings, one doc_id-keyed agg. A new benchmark wave makes the
  next ``report()`` retroactive over the full ingested corpus
  automatically — the postings are already there; nothing re-shingles.

Both maintenance queries are checkpointed availableNow drains through
Spark's transactional file sink (exactly-once; the Bm25Streaming
postings posture). There is ZERO aggregation state — the maintained
tables ARE the fingerprints, and the contamination report derives from
them at query time.

Parity contract (tests/test_streaming.py): with the fixture's
``doc_id % eval_mod`` split ingested as the two topics, ``report()``
row-equals the batch ``decontaminate`` over the union — the gate oracle
is the batch oracle VERBATIM.

Scale posture: corpus postings are corpus-scale but append-only and
written once per doc (the honest cost of retroactive benchmark audits —
the alternative re-scans raw text per new benchmark); the eval side
stays broadcast-small (benchmarks are orders of magnitude smaller than
the corpus); the report's only exchange is the per-doc aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.functions import text as T
from responsive_pub_spark.functions.portable import pround
from responsive_pub_spark.streaming.runtime import run_to_sink

DOCS_SCHEMA = "doc_id BIGINT, text STRING"
CORPUS_POSTINGS_SCHEMA = "doc_id BIGINT, n_shingles BIGINT, h BIGINT"
EVAL_POSTINGS_SCHEMA = "eval_id BIGINT, h BIGINT"


class DecontamStreaming:
    """Incrementally-maintained contamination fingerprints over two file
    topics (see module docstring). All state is under ``workdir``; a
    fresh instance resumes from the checkpoints (cold restart)."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.corpus_dir = os.path.join(workdir, "corpus")
        self.evals_dir = os.path.join(workdir, "evals")
        self.corpus_post_dir = os.path.join(workdir, "corpus_postings")
        self.eval_post_dir = os.path.join(workdir, "eval_postings")
        self.ck_corpus = os.path.join(workdir, "ck-corpus")
        self.ck_evals = os.path.join(workdir, "ck-evals")
        for d in (self.corpus_dir, self.evals_dir):
            os.makedirs(d, exist_ok=True)

    def ingest_corpus(self, docs: DataFrame) -> None:
        """Append a wave of (doc_id, text) corpus docs."""
        docs.select("doc_id", "text").write.mode("append").parquet(
            self.corpus_dir
        )

    def ingest_evals(self, evals: DataFrame) -> None:
        """Append a wave of (doc_id, text) eval/benchmark docs."""
        evals.select("doc_id", "text").write.mode("append").parquet(
            self.evals_dir
        )

    def advance(self) -> None:
        """Drain both topics through the shingle-once maintenance
        queries (stateless — the maintained tables are the state)."""
        hs = F.expr(T.shingle_hashes_sql("text"))
        corpus = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .parquet(self.corpus_dir)
            .select("doc_id", hs.alias("hs"))
            .select(
                "doc_id",
                F.size("hs").cast("bigint").alias("n_shingles"),
                F.explode("hs").alias("h"),
            )
        )
        run_to_sink(corpus, self.corpus_post_dir, self.ck_corpus)
        evals = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .parquet(self.evals_dir)
            .select(F.col("doc_id").alias("eval_id"), hs.alias("hs"))
            .select("eval_id", F.explode("hs").alias("h"))
        )
        run_to_sink(evals, self.eval_post_dir, self.ck_evals)

    # -- maintained state readers ----------------------------------------
    def corpus_postings(self) -> DataFrame:
        return self.spark.read.schema(CORPUS_POSTINGS_SCHEMA).parquet(
            self.corpus_post_dir
        )

    def eval_postings(self) -> DataFrame:
        return self.spark.read.schema(EVAL_POSTINGS_SCHEMA).parquet(
            self.eval_post_dir
        )

    def report(self) -> DataFrame:
        """The contamination report from the MAINTAINED fingerprints —
        the batch ``decontaminate`` aggregation verbatim (corpus side
        equi-joined against the broadcast eval postings, one per-doc
        agg), retroactive over everything ingested on either side."""
        return (
            self.corpus_postings()
            .join(F.broadcast(self.eval_postings()), "h")
            .groupBy("doc_id")
            .agg(
                F.max("n_shingles").alias("n_shingles"),
                F.countDistinct("h").cast("bigint").alias("n_shared"),
                F.countDistinct("eval_id").cast("bigint").alias(
                    "n_eval_docs"
                ),
            )
            .withColumn(
                "contam_frac",
                pround(F.col("n_shared") / F.col("n_shingles"), 6),
            )
            .select(
                "doc_id",
                "n_shingles",
                "n_shared",
                "n_eval_docs",
                "contam_frac",
            )
        )
