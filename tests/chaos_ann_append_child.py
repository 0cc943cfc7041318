"""Child driver for the SIGKILL-mid-append torn-codes chaos e2e (run
as a subprocess by tests/test_chaos_r14.py — NOT a pytest module).

r14 maintains PQ codes BESIDE the incremental IVF lists: each
``advance()`` micro-batch appends assigned rows to ``lists/`` and then
their PQ codes to ``codes/`` (streaming/ann_stream.py assign_batch).
Those two appends are not one atomic write — a SIGKILL between them
(``SPARK_GRAFT_CHAOS_ENABLE=1`` + ``SPARK_GRAFT_ANN_KILL=post-lists``)
leaves list rows whose codes are missing. The contract is the lane's
at-least-once replay posture: the batch's checkpoint never committed,
so the next advance REPLAYS it — lists collapse on ``dedup=True`` and
the codes catch up — after which ``topk_pq`` must be row-identical to
a clean twin build over the same waves.

Modes:

- ``setup``: train 16 centroids on the first half of the sf0.001
  embeddings fixture (the full PQ_K code budget), build the lane, and
  advance the first half in cleanly.
- ``append``: ingest the second half and advance — the parent arms the
  ``post-lists`` kill so the process dies between the two appends.
- ``dump``: print lists/codes raw + deduped counts and the
  ``topk_pq`` rows of BOTH the recovered lane and a freshly-built twin
  (same centroid rows, both halves in one wave) for the parent's
  row-equality assert.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _halves(spark):
    from responsive_pub_spark.sources.readers import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    rows.sort(key=lambda t: t[0])
    h = len(rows) // 2
    return rows[:h], rows[h:]


def main() -> None:
    workdir = sys.argv[1]
    mode = sys.argv[2]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from responsive_pub_spark.operators import similarity
    from responsive_pub_spark.streaming.ann_stream import (
        VECS_SCHEMA,
        IvfIncremental,
    )

    def _ingest(lane, rows):
        spark.createDataFrame(rows, VECS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(lane.vecs_dir)

    first, second = _halves(spark)

    if mode == "setup":
        emb = spark.createDataFrame(first, VECS_SCHEMA)
        # 16 trained centroids: codebooks derive from the first PQ_K
        # of them — the full batch-PQ code budget
        cent = similarity.train_centroids(emb, n_centroids=16)
        lane = IvfIncremental(spark, workdir, centroids=cent)
        _ingest(lane, first)
        lane.advance()
        print("SETUP-DONE", flush=True)
    elif mode == "append":
        lane = IvfIncremental(spark, workdir)
        _ingest(lane, second)
        lane.advance()  # SPARK_GRAFT_ANN_KILL=post-lists dies in here
        print("APPEND-DONE", flush=True)
    elif mode == "advance":
        # recovery: NO new ingest — the uncommitted batch replays
        lane = IvfIncremental(spark, workdir)
        lane.advance()
        print("ADVANCE-DONE", flush=True)
    elif mode == "counts":
        lane = IvfIncremental(spark, workdir)
        print(
            f"COUNTS {lane.lists(dedup=False).count()} "
            f"{lane.lists(dedup=True).count()} "
            f"{lane.codes(dedup=False).count()} "
            f"{lane.codes(dedup=True).count()}",
            flush=True,
        )
    else:  # dump
        lane = IvfIncremental(spark, workdir)
        n_lists_raw = lane.lists(dedup=False).count()
        n_lists = lane.lists(dedup=True).count()
        n_codes_raw = lane.codes(dedup=False).count()
        n_codes = lane.codes(dedup=True).count()
        print(
            f"COUNTS {n_lists_raw} {n_lists} {n_codes_raw} {n_codes}",
            flush=True,
        )
        for r in lane.topk_pq(n_probes=4, rerank=40).collect():
            print(
                f"PQ {int(r.query_id)} {int(r.neighbor_id)} "
                f"{int(r.rank)} {r.cosine!r}",
                flush=True,
            )
        # clean twin: identical centroid rows, both halves in one wave
        twin_wd = os.path.join(workdir, "twin")
        twin = IvfIncremental(spark, twin_wd, centroids=lane.centroids())
        _ingest(twin, first + second)
        twin.advance()
        for r in twin.topk_pq(n_probes=4, rerank=40).collect():
            print(
                f"TWIN {int(r.query_id)} {int(r.neighbor_id)} "
                f"{int(r.rank)} {r.cosine!r}",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
